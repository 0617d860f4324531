"""Fused stage-2 fuzzy matching: device-resident gathers + dual ratio kernel.

Reference semantics (predict.py:140-156): pairs passing the length-delta
prefilter get the rounded Levenshtein ratio; if that is ≤ the threshold the
token-sort ratio is used instead.  Both ratios are computed in ONE device
program per chunk (the LCS kernel is cheap; a second host round-trip through
the TPU tunnel is not), and only pair-index vectors cross the host↔device
boundary.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from doppelspeller_tpu.config import Config, get_config
from doppelspeller_tpu.ops.levenshtein import lcs_kernel

LOGGER = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("tl", "threshold"))
def _fuzzy_kernel(
    q_enc, q_len, q_ts, q_ts_len,      # query-side device arrays (per call)
    t_enc, t_len, t_ts, t_ts_len,      # truth-side device arrays (resident)
    pairs,                             # (2, B) int32: one transfer per chunk
    *, tl: int, threshold: int,
):
    pair_q = pairs[0]
    pair_t = pairs[1]
    """Rounded final ratio per pair: plain ratio if > threshold else
    token-sort ratio (banker's rounding, reference common.py:161-167)."""

    def rounded_ratio(a, la, b, lb):
        lcs = lcs_kernel(a, la, b, lb)
        total = jnp.maximum(la + lb, 1).astype(jnp.float32)
        r = 200.0 * lcs.astype(jnp.float32) / total
        return jnp.round(r).astype(jnp.int32)  # round-half-even = python round

    a = q_enc[pair_q][:, :tl]
    la = q_len[pair_q]
    b = t_enc[pair_t][:, :tl]
    lb = t_len[pair_t]
    r1 = rounded_ratio(a, la, b, lb)

    a2 = q_ts[pair_q][:, :tl]
    la2 = q_ts_len[pair_q]
    b2 = t_ts[pair_t][:, :tl]
    lb2 = t_ts_len[pair_t]
    r2 = rounded_ratio(a2, la2, b2, lb2)

    return jnp.where(r1 > threshold, r1, r2)


class FuzzyEngine:
    """Device-resident stage-2 scorer over a fixed truth set."""

    def __init__(
        self,
        truth_enc: np.ndarray, truth_len: np.ndarray,
        ts_truth_enc: np.ndarray, ts_truth_len: np.ndarray,
        config: Optional[Config] = None,
    ):
        self.cfg = config or get_config()
        self.t_enc = jnp.asarray(truth_enc)
        self.t_len = jnp.asarray(truth_len.astype(np.int32))
        self.t_ts = jnp.asarray(ts_truth_enc)
        self.t_ts_len = jnp.asarray(ts_truth_len.astype(np.int32))

    def ratios(
        self,
        q_enc: np.ndarray, q_len: np.ndarray,
        ts_q_enc: np.ndarray, ts_q_len: np.ndarray,
        pair_q: np.ndarray, pair_t: np.ndarray,
        t_len_host: np.ndarray, ts_t_len_host: np.ndarray,
    ) -> np.ndarray:
        """Final rounded ratios for N (query-row, truth-row) pairs."""
        cfg = self.cfg
        thr = cfg.levenshtein_ratio_threshold
        q_enc_d = jnp.asarray(q_enc)
        q_len_d = jnp.asarray(q_len.astype(np.int32))
        q_ts_d = jnp.asarray(ts_q_enc)
        q_ts_len_d = jnp.asarray(ts_q_len.astype(np.int32))

        n = len(pair_q)
        out = np.zeros(n, dtype=np.int32)
        # bucket on the max length across BOTH string variants
        pair_len = np.maximum.reduce([
            q_len[pair_q], t_len_host[pair_t],
            ts_q_len[pair_q], ts_t_len_host[pair_t],
        ])
        buckets = [b for b in cfg.length_buckets if b < q_enc.shape[1]] + [q_enc.shape[1]]
        bi = np.searchsorted(np.asarray(buckets), pair_len)
        pending = []
        for i, tl in enumerate(buckets):
            sel = np.flatnonzero(bi == i)
            if len(sel) == 0:
                continue
            # bound the bit-parallel kernel's (B, Lb, La) match-mask tensor
            chunk = int(np.clip((1 << 25) // (tl * tl), 64, cfg.pair_block))
            for s in range(0, len(sel), chunk):
                idx = sel[s : s + chunk]
                m = len(idx)
                prs = np.zeros((2, chunk), np.int32)
                prs[0, :m] = pair_q[idx]
                prs[1, :m] = pair_t[idx]
                r = _fuzzy_kernel(
                    q_enc_d, q_len_d, q_ts_d, q_ts_len_d,
                    self.t_enc, self.t_len, self.t_ts, self.t_ts_len,
                    jnp.asarray(prs),
                    tl=tl, threshold=thr,
                )
                pending.append((idx, m, r))
        for idx, m, r in pending:
            out[idx] = np.asarray(r)[:m]
        return out
