"""Fused stage-3 reranking: gather → 66-dim features → GBT inference,
all in one device program.

The naive pipeline (reference predict.py:185-254) materializes the feature
matrix on the host between feature construction and model.predict.  Through
a TPU tunnel at ~40 MB/s that round-trips ~260 MB per 500K pairs.  Here the
truth-side tensors (encodings, word boundaries, word counts) and the tree
arrays live in HBM; per chunk only two int32 index vectors go up and one
float32 prediction vector comes down (8 B/pair instead of ~550 B/pair).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from doppelspeller_tpu.config import Config, get_config
from doppelspeller_tpu.models.gbt import GBTModel
from doppelspeller_tpu.ops.features import _features_kernel, resolve_window_impl

LOGGER = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("tl", "wl", "depth", "window_impl"))
def _fused_rerank_kernel(
    # query-side device arrays (per predict call)
    q_enc, q_len, q_wo, q_wo_len,
    # truth-side device arrays (resident)
    t_enc, t_len, t_start, t_wlen, t_nwords, t_counts,
    # model arrays (resident)
    m_feat, m_thr, m_ml, m_val, m_leaf,
    # per-chunk pair indices: ONE (2, B) buffer = one host→device transfer
    pairs,
    n_truth,
    base_margin,
    *, tl: int, wl: int, depth: int, window_impl: str = "xla",
):
    pair_q = pairs[0]
    pair_t = pairs[1]
    B = pair_q.shape[0]
    qe = q_enc[pair_q][:, :tl]
    ql = q_len[pair_q]
    qw = q_wo[pair_q][:, :tl]
    qwl = jnp.maximum(q_wo_len[pair_q], 1)
    te = t_enc[pair_t]
    tl_len = jnp.maximum(t_len[pair_t], 1)
    start = t_start[pair_t]
    wlen = t_wlen[pair_t]
    nwords = jnp.maximum(t_nwords[pair_t], 1)
    counts = t_counts[pair_t].astype(jnp.float32)

    # word chars gather: (B, W, wl)
    W = start.shape[1]
    j = jnp.arange(wl, dtype=jnp.int32)
    idx = jnp.clip(start[:, :, None] + j[None, None, :], 0, te.shape[1] - 1)
    chars = jnp.take_along_axis(
        te[:, None, :], idx.reshape(B, W * wl)[:, None, :], axis=2
    ).reshape(B, W, wl)
    chars = chars * (j[None, None, :] < wlen[:, :, None]).astype(chars.dtype)

    feats = _features_kernel(
        qe, ql, te[:, :tl], tl_len, chars, wlen, nwords, qw, qwl, counts, n_truth,
        window_impl=window_impl,
    )

    # GBT inference: level-synchronous across all trees at once
    from doppelspeller_tpu.models.gbt import predict_forest_margin

    margins = predict_forest_margin(
        feats, m_feat, m_thr, m_ml, m_val, m_leaf, depth, base_margin
    )
    return jax.nn.sigmoid(margins)


class RerankEngine:
    """Device-resident stage-3 scorer over a fixed truth set + model."""

    def __init__(
        self,
        truth_enc: np.ndarray, truth_len: np.ndarray,
        truth_words: Tuple[np.ndarray, np.ndarray, np.ndarray],
        counts_matrix: np.ndarray,
        model: GBTModel,
        n_truth: int,
        config: Optional[Config] = None,
    ):
        self.cfg = config or get_config()
        self.n_truth = jnp.float32(n_truth)
        self.t_enc = jnp.asarray(truth_enc)
        self.t_len = jnp.asarray(truth_len.astype(np.int32))
        start, wlen, nwords = truth_words
        self.t_start = jnp.asarray(start)
        self.t_wlen = jnp.asarray(wlen)
        self.t_nwords = jnp.asarray(nwords)
        self.t_counts = jnp.asarray(counts_matrix.astype(np.float32))
        self._wlen_max = wlen.max(axis=1)  # host copy for bucketing
        nt = model.best_ntree_limit or model.num_trees
        self.m = tuple(
            jnp.asarray(a[:nt])
            for a in (model.feat, model.threshold, model.missing_left,
                      model.value, model.is_leaf)
        )
        self.depth = model.depth
        self.base_margin = float(np.log(model.base_score / (1 - model.base_score)))
        self._window_impl = resolve_window_impl(self.cfg)

    def score(
        self,
        q_enc: np.ndarray, q_len: np.ndarray,
        q_wo: np.ndarray, q_wo_len: np.ndarray,
        pair_q: np.ndarray, pair_t: np.ndarray,
        t_len_host: np.ndarray,
    ) -> np.ndarray:
        """Predictions for pairs (pair_q → query row, pair_t → truth row)."""
        cfg = self.cfg
        q_enc_d = jnp.asarray(q_enc)
        q_len_d = jnp.asarray(q_len.astype(np.int32))
        q_wo_d = jnp.asarray(q_wo)
        q_wo_len_d = jnp.asarray(q_wo_len.astype(np.int32))

        n = len(pair_q)
        out = np.zeros(n, dtype=np.float32)
        pair_len = np.maximum(q_len[pair_q], t_len_host[pair_t])
        max_word = np.maximum(self._wlen_max[pair_t], 1)
        buckets = [b for b in cfg.length_buckets if b < q_enc.shape[1]] + [q_enc.shape[1]]
        w_buckets = [8, 16, 32, 64, q_enc.shape[1]]
        tb = np.searchsorted(np.asarray(buckets), pair_len)
        wb = np.searchsorted(np.asarray(w_buckets), max_word)

        pending = []
        for ti, TL in enumerate(buckets):
            for wi, WL in enumerate(w_buckets):
                if WL > TL:
                    continue
                sel = np.flatnonzero((tb == ti) & (wb == wi))
                if len(sel) == 0:
                    continue
                chunk = int(np.clip((1 << 22) // (TL * WL), 64, cfg.pair_block))
                for s in range(0, len(sel), chunk):
                    idx = sel[s : s + chunk]
                    m = len(idx)
                    prs = np.zeros((2, chunk), np.int32)
                    prs[0, :m] = pair_q[idx]
                    prs[1, :m] = pair_t[idx]
                    preds = _fused_rerank_kernel(
                        q_enc_d, q_len_d, q_wo_d, q_wo_len_d,
                        self.t_enc, self.t_len, self.t_start, self.t_wlen,
                        self.t_nwords, self.t_counts,
                        *self.m,
                        jnp.asarray(prs),
                        self.n_truth, self.base_margin,
                        tl=TL, wl=WL, depth=self.depth,
                        window_impl=self._window_impl,
                    )
                    pending.append((idx, m, preds))
        for idx, m, preds in pending:
            out[idx] = np.asarray(preds)[:m]
        return out
