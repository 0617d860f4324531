"""Bisect the B=12800 rerank corruption: features vs forest."""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from doppelspeller_tpu.config import set_config  # noqa: E402
from doppelspeller_tpu.models.gbt import GBTModel, predict_forest_margin  # noqa: E402
from doppelspeller_tpu.ops.features import remove_spaces_host  # noqa: E402
from doppelspeller_tpu.ops.rerank import _score_gathered_pairs, _word_chars  # noqa: E402
from doppelspeller_tpu.pipeline import Matcher  # noqa: E402

n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
cfg, truth, queries, _ = bench.make_synthetic_world(n_titles, 512)
set_config(cfg)
model = GBTModel.load(f"/tmp/dbg_model_{n_titles}.npz")
m = Matcher(cfg, truth=truth, model=model, use_index_checkpoint=False)

R, K, TL, WL = 128, 100, 64, 16
rem = np.arange(R, dtype=np.int64)
_, cand = m.scorer.topk(queries, k=K, rows=rem)
eng = m._rerank_engine()

q_enc = queries.encoded[rem]
q_len = queries.lengths[rem].astype(np.int32)
q_wo, q_wo_len = remove_spaces_host(q_enc, q_len)
pair_q = np.repeat(np.arange(R), K).astype(np.int32)
pair_t = cand.reshape(-1).astype(np.int32)


@partial(jax.jit, static_argnames=("tl", "wl", "wi"))
def feats_only(q_enc, q_len, q_wo, q_wo_len, t_enc, t_len, t_wchars, t_start,
               t_wlen, t_nwords, t_counts, pairs, n_truth, *, tl, wl, wi):
    from doppelspeller_tpu.ops.features import _features_kernel

    pq, pt = pairs[0], pairs[1]
    chars = _word_chars(t_wchars, t_start, t_wlen, t_enc, pt, wl)
    return _features_kernel(
        q_enc[pq][:, :tl], q_len[pq], t_enc[pt][:, :tl],
        jnp.maximum(t_len[pt], 1), chars, t_wlen[pt],
        jnp.maximum(t_nwords[pt], 1), q_wo[pq][:, :tl],
        jnp.maximum(q_wo_len[pq], 1), t_counts[pt].astype(jnp.float32),
        n_truth, window_impl=wi,
    )


def run(nb):
    prs = np.stack([pair_q[:nb], pair_t[:nb]])
    return np.asarray(feats_only(
        jnp.asarray(q_enc), jnp.asarray(q_len), jnp.asarray(q_wo),
        jnp.asarray(q_wo_len), eng.t_enc, eng.t_len, eng.t_wchars,
        eng.t_start, eng.t_wlen, eng.t_nwords, eng.t_counts,
        jnp.asarray(prs), eng.n_truth, tl=TL, wl=WL, wi=eng._window_impl,
    ))


f_full = run(12800)
f_part = run(4096)
d = np.abs(np.nan_to_num(f_full[:4096], nan=-7.0)
           - np.nan_to_num(f_part, nan=-7.0))
print(f"features 12800 vs 4096: max diff {d.max():.4f} "
      f"rows-differing {(d.max(axis=1) > 1e-3).mean():.2%}")
bad_cols = np.flatnonzero(d.max(axis=0) > 1e-3)
print("differing feature columns:", bad_cols[:20])

# forest alone at both batch sizes on the SAME (good) features
Xd = jnp.asarray(np.nan_to_num(f_part, nan=np.nan))
marg_small = np.asarray(jax.jit(partial(predict_forest_margin, depth=eng.depth,
                                        base_margin=eng.base_margin))(
    Xd, *eng.m))
big = jnp.concatenate([Xd, Xd, Xd, jnp.asarray(f_full[:512])], axis=0)
marg_big = np.asarray(jax.jit(partial(predict_forest_margin, depth=eng.depth,
                                      base_margin=eng.base_margin))(
    big, *eng.m))[:4096]
dm = np.abs(marg_small - marg_big)
print(f"forest margins 4096 vs 12800-batch: max diff {dm.max():.5f}")
