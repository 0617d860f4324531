"""Attribute retrieval time: host planning vs transfer vs dispatch vs compute.

Usage:  python scripts/profile_retrieval.py [n_titles] [n_queries]

Phases:
  A. plan_query_blocks host cost
  B. per-block transfer+dispatch+fetch (the production path today)
  C. pre-uploaded inputs, kernel-only steady state
  D. kernel with exact top-k vs approx
"""

import os
import random
import string
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

import jax
import jax.numpy as jnp

from doppelspeller_tpu.config import Config
from doppelspeller_tpu.ops.jaccard import JaccardScorer, _topk_packed_pallas, _topk_packed_xla
from doppelspeller_tpu.ops.ngram_index import build_truth_index, plan_query_blocks
from doppelspeller_tpu.utils.io import TitleSet

rng = random.Random(7)
common = ["limited", "holdings", "group", "services", "international", "systems"]
stems = ["".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(4, 10)))
         for _ in range(max(n_titles // 12, 1000))]


def make_title():
    words = [rng.choice(stems) for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.75:
        words.append(rng.choice(common))
    return " ".join(words)


cfg = Config(data_path="/tmp/prof")
t0 = time.time()
truth = TitleSet.from_titles([make_title() for _ in range(n_titles)], config=cfg)
queries = TitleSet.from_titles(
    [make_title() for _ in range(n_queries)], config=cfg
)
print(f"world: {time.time()-t0:.1f}s")

t0 = time.time()
index = build_truth_index(truth, cfg)
print(f"index build: {time.time()-t0:.1f}s  packed={index.packed_nbytes/1e9:.2f} GB")

t0 = time.time()
scorer = JaccardScorer(index, cfg)
print(f"scorer init (device_put packed+sums): {time.time()-t0:.1f}s  impl={scorer.impl}")

# -------- A: planning
t0 = time.time()
plans = plan_query_blocks(queries, index, cfg)
t_plan = time.time() - t0
print(f"A. plan: {t_plan:.2f}s for {len(plans)} blocks "
      f"({n_queries/t_plan:.0f} q/s host planning)")

k = cfg.top_n_predicting
qb = plans[0].w_pos.shape[0]
tb = scorer._pallas_tb


def shp(p):
    """Per-plan static bucket: (union size, per-query trigram slots) —
    blocks land in DIFFERENT buckets (the planner pads each block to the
    smallest fitting bucket), so the kernel shape must come from the plan."""
    return p.union_ids.shape[0], p.w_pos.shape[1]

def sync(outs):
    """block_until_ready does NOT wait for remote execution on the axon
    tunnel — only a data fetch truly syncs (see .claude/skills/verify)."""
    if isinstance(outs, (list, tuple)):
        for o in outs:
            sync(o)
    else:
        np.asarray(outs)


# warmup/compile (one per distinct bucket among the profiled blocks)
NPW = min(len(plans), 40)
for (u, lq) in sorted({shp(p) for p in plans[:NPW]}):
    p0 = next(p for p in plans[:NPW] if shp(p) == (u, lq))
    out = _topk_packed_pallas(scorer.packed_d, scorer.sums_perm_d,
                              jnp.asarray(p0.packed_args()), scorer.nt_d,
                              u=u, qb=qb, lq=lq, k=k, tb=tb,
                              score_dtype=cfg.score_dtype, interpret=False,
                              recall_target=cfg.topk_recall_target)
    sync(out)

NP = min(len(plans), 40)

# -------- B: production path (transfer per block, async dispatch, fetch)
t0 = time.time()
pend = []
for p in plans[:NP]:
    u, lq = shp(p)
    buf = jnp.asarray(p.packed_args())
    pend.append(_topk_packed_pallas(scorer.packed_d, scorer.sums_perm_d, buf,
                                    scorer.nt_d, u=u, qb=qb, lq=lq, k=k, tb=tb,
                                    score_dtype=cfg.score_dtype, interpret=False,
                                    recall_target=cfg.topk_recall_target))
t_disp = time.time() - t0
for outs in pend:
    np.asarray(outs[0]); np.asarray(outs[1])
t_total = time.time() - t0
print(f"B. production: dispatch {t_disp:.2f}s, total {t_total:.2f}s for {NP} blocks "
      f"-> {NP*qb/t_total:.0f} q/s")

# -------- C: pre-uploaded bufs, kernel-only
bufs = [(jax.device_put(jnp.asarray(p.packed_args())), shp(p))
        for p in plans[:NP]]
sync([b for b, _ in bufs])
t0 = time.time()
pend = [
    _topk_packed_pallas(scorer.packed_d, scorer.sums_perm_d, b, scorer.nt_d,
                        u=u, qb=qb, lq=lq, k=k, tb=tb,
                        score_dtype=cfg.score_dtype, interpret=False,
                        recall_target=cfg.topk_recall_target)
    for b, (u, lq) in bufs
]
sync(pend)
t_kernel = time.time() - t0
flops = 2.0 * qb * u * index.padded_titles * NP
print(f"C. kernel-only: {t_kernel:.2f}s for {NP} blocks -> {NP*qb/t_kernel:.0f} q/s, "
      f"{flops/t_kernel/1e12:.1f} TFLOP/s")

# -------- D: exact top-k
for (u, lq) in sorted({s for _, s in bufs}):
    b0 = next(b for b, s in bufs if s == (u, lq))
    out = _topk_packed_pallas(scorer.packed_d, scorer.sums_perm_d, b0,
                              scorer.nt_d, u=u, qb=qb, lq=lq, k=k, tb=tb,
                              score_dtype=cfg.score_dtype, interpret=False,
                              recall_target=1.0)
    sync(out)
t0 = time.time()
pend = [
    _topk_packed_pallas(scorer.packed_d, scorer.sums_perm_d, b, scorer.nt_d,
                        u=u, qb=qb, lq=lq, k=k, tb=tb,
                        score_dtype=cfg.score_dtype, interpret=False,
                        recall_target=1.0)
    for b, (u, lq) in bufs
]
sync(pend)
print(f"D. exact-topk kernel-only: {time.time()-t0:.2f}s for {NP} blocks")

# -------- E: XLA (non-pallas) path for comparison
if scorer.packed_d.ndim == 3:
    # page-layout matrix (pallas direct build): the XLA path wants the flat
    # layout and reconstructing it doubles HBM residency at 1M+ titles
    print("E. xla path: skipped (page-layout index)")
    sys.exit(0)
for (u, lq) in sorted({s for _, s in bufs[:10]}):
    b0 = next(b for b, s in bufs[:10] if s == (u, lq))
    out = _topk_packed_xla(scorer.packed_d, scorer.sums_d, b0, scorer.nt_d,
                           u=u, qb=qb, lq=lq, k=k, title_block=cfg.title_block,
                           score_dtype=cfg.score_dtype)
    sync(out)
t0 = time.time()
pend = [
    _topk_packed_xla(scorer.packed_d, scorer.sums_d, b, scorer.nt_d,
                     u=u, qb=qb, lq=lq, k=k, title_block=cfg.title_block,
                     score_dtype=cfg.score_dtype)
    for b, (u, lq) in bufs[:10]
]
sync(pend)
print(f"E. xla path kernel-only: {time.time()-t0:.2f}s for 10 blocks")
