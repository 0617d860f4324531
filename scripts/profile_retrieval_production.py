"""Attribute the production retrieval stage at bench scale.

Times, with the CURRENT multiblock path (window_select per config):
  A. host planning only
  B. production: dispatch all groups async, sync last (bench behavior)
  C. per-group device time (sync after each group) -> pure kernel cost
  D. host pack-only cost (buffer assembly without dispatch)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import random, string
from doppelspeller_tpu.config import Config
from doppelspeller_tpu.ops.jaccard import JaccardScorer, group_plan_buffers
from doppelspeller_tpu.ops.ngram_index import build_truth_index, plan_query_blocks
from doppelspeller_tpu.utils.io import TitleSet

n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000

rng = random.Random(7)
common = ["limited", "holdings", "group", "services", "international", "systems"]
stems = ["".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(4, 10)))
         for _ in range(max(n_titles // 12, 1000))]

def make_title():
    words = [rng.choice(stems) for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.75:
        words.append(rng.choice(common))
    return " ".join(words)

import json
cfg = Config(data_path="/tmp/prof", **json.loads(os.environ.get("BENCH_CFG", "{}")))
t0 = time.time()
truth = TitleSet.from_titles([make_title() for _ in range(n_titles)], config=cfg)
qt = sorted(make_title() for _ in range(n_queries))
queries = TitleSet.from_titles(qt, config=cfg)
print(f"world: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
index = build_truth_index(truth, cfg)
scorer = JaccardScorer(index, cfg)
print(f"index+scorer: {time.time()-t0:.1f}s impl={scorer.impl} "
      f"ws={cfg.retrieval_window_select}", flush=True)

# warmup (compiles)
t0 = time.time()
pending, plans = scorer.topk_device(queries, k=100)
np.asarray(pending[-1][1])
print(f"warmup pass: {time.time()-t0:.1f}s ({len(plans)} blocks, "
      f"{len(pending)} groups)", flush=True)

# A. planning only
t0 = time.time()
plans = plan_query_blocks(queries, index, cfg)
t_plan = time.time() - t0
print(f"A. plan: {t_plan:.2f}s for {len(plans)} blocks", flush=True)

# D. pack-only
t0 = time.time()
groups, qb, lq = group_plan_buffers(plans, int(cfg.dispatch_blocks))
t_pack = time.time() - t0
print(f"D. pack: {t_pack:.2f}s for {len(groups)} groups", flush=True)

# B. production (async dispatch, one sync at the end)
trace_dir = os.environ.get("PROF_TRACE_DIR")
for rep in range(2):
    if rep == 1 and trace_dir:
        import contextlib
        import jax
        ctx = jax.profiler.trace(trace_dir)
    else:
        import contextlib
        ctx = contextlib.nullcontext()
    t0 = time.time()
    with ctx:
        pending, _ = scorer.topk_device(queries, k=100)
        t_disp = time.time() - t0
        np.asarray(pending[-1][1])
    t_tot = time.time() - t0
    print(f"B. production rep{rep}: dispatch {t_disp:.2f}s, total {t_tot:.2f}s "
          f"-> {n_queries/t_tot:.0f} q/s", flush=True)

# C. per-group sync: isolates device time per group
pending, _ = scorer.topk_device(queries, k=100)
np.asarray(pending[-1][1])   # drain
t0 = time.time()
pending, _ = scorer.topk_device(queries, k=100)
t_disp = time.time() - t0
times = []
for chunk, vals, pos, *rest in pending:
    tg = time.time()
    np.asarray(vals)
    times.append(time.time() - tg)
print(f"C. dispatch {t_disp:.2f}s; per-group sync times (s): "
      f"{[round(t, 3) for t in times]}", flush=True)
print(f"C. sum group wait {sum(times):.2f}s", flush=True)
