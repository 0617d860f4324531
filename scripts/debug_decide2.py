"""Bisect: is the rerank kernel wrong at B=12800, or is decide's scan wrong?"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from doppelspeller_tpu.config import set_config  # noqa: E402
from doppelspeller_tpu.models.gbt import GBTModel  # noqa: E402
from doppelspeller_tpu.ops.features import remove_spaces_host  # noqa: E402
from doppelspeller_tpu.ops.rerank import _fused_rerank_kernel  # noqa: E402
from doppelspeller_tpu.pipeline import Matcher  # noqa: E402

n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
cfg, truth, queries, _ = bench.make_synthetic_world(n_titles, 512)
set_config(cfg)
model = GBTModel.load(f"/tmp/dbg_model_{n_titles}.npz")
m = Matcher(cfg, truth=truth, model=model, use_index_checkpoint=False)

R, K, TL, WL = 128, 100, 64, 16
rem = np.arange(R, dtype=np.int64)
_, cand = m.scorer.topk(queries, k=K, rows=rem)
engine = m._rerank_engine()

q_enc = queries.encoded[rem]
q_len = queries.lengths[rem].astype(np.int32)
q_wo, q_wo_len = remove_spaces_host(q_enc, q_len)

pair_q = np.repeat(np.arange(R), K)
pair_t = cand.reshape(-1).astype(np.int64)

# reference: engine.score (4096-pair chunks) — known good
preds_ref = engine.score(q_enc, q_len, q_wo, q_wo_len, pair_q, pair_t,
                         truth.lengths)

# probe A: one _fused_rerank_kernel call with ALL 12800 pairs
prs = np.stack([pair_q.astype(np.int32), pair_t.astype(np.int32)])
preds_a = np.asarray(_fused_rerank_kernel(
    jnp.asarray(q_enc), jnp.asarray(q_len),
    jnp.asarray(q_wo), jnp.asarray(q_wo_len),
    engine.t_enc, engine.t_len, engine.t_wchars, engine.t_start,
    engine.t_wlen, engine.t_nwords, engine.t_counts,
    *engine.m, jnp.asarray(prs), engine.n_truth,
    engine._put(np.float32(engine.base_margin)),
    tl=TL, wl=WL, depth=engine.depth, window_impl=engine._window_impl,
))

d = np.abs(preds_a - preds_ref)
print(f"A (12800-pair single call) vs score: max diff {d.max():.4f} "
      f"mean {d.mean():.4f} frac>0.01 {(d > 0.01).mean():.2%}")

# probe B: same kernel but only the first 4096 pairs
prs_b = prs[:, :4096]
preds_b = np.asarray(_fused_rerank_kernel(
    jnp.asarray(q_enc), jnp.asarray(q_len),
    jnp.asarray(q_wo), jnp.asarray(q_wo_len),
    engine.t_enc, engine.t_len, engine.t_wchars, engine.t_start,
    engine.t_wlen, engine.t_nwords, engine.t_counts,
    *engine.m, jnp.asarray(prs_b), engine.n_truth,
    engine._put(np.float32(engine.base_margin)),
    tl=TL, wl=WL, depth=engine.depth, window_impl=engine._window_impl,
))
d = np.abs(preds_b - preds_ref[:4096])
print(f"B (4096-pair single call) vs score: max diff {d.max():.4f} "
      f"mean {d.mean():.4f} frac>0.01 {(d > 0.01).mean():.2%}")
