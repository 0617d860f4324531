"""Compare retrieval throughput/recall at query_block 256 vs 512 (500k)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

from doppelspeller_tpu.config import set_config  # noqa: E402
from doppelspeller_tpu.ops.jaccard import JaccardScorer  # noqa: E402
from doppelspeller_tpu.ops.ngram_index import TruthIndex, build_truth_index  # noqa: E402

n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 16_384

cfg, truth, queries, _ = bench.make_synthetic_world(n_titles, n_queries)
set_config(cfg)
cache = f"/tmp/bench_world_{n_titles}_100000"
index_path = os.path.join(cache, "index.npz")
index = (TruthIndex.load(index_path) if os.path.exists(index_path)
         else build_truth_index(truth, cfg))

order = np.argsort(np.array(queries.transformed, dtype=object))

results = {}
for qb, ub, g in [
    (256, (2048, 3072, 4096, 6144, 8192), 16),
    (512, (3072, 4096, 6144, 8192, 12288), 8),
]:
    c = cfg.with_(query_block=qb, union_buckets=ub, dispatch_blocks=g)
    scorer = JaccardScorer(index, c)
    # warmup/compile on a slice
    t0 = time.time()
    scorer.topk(queries, k=100, rows=order[: qb * g])
    tc = time.time() - t0
    t0 = time.time()
    s, p = scorer.topk(queries, k=100, rows=order)
    dt = time.time() - t0
    results[qb] = p
    print(f"qb={qb}: {dt:.2f}s for {n_queries} q ({n_queries/dt:.0f} q/s, "
          f"{100000/(n_queries/dt):.1f}s/100k; compile {tc:.0f}s)")

same = (results[256] == results[512]).mean()
overlap = np.mean([
    len(np.intersect1d(results[256][i], results[512][i])) / 100
    for i in range(0, n_queries, 37)
])
print(f"position agreement {same:.1%}, top-100 set overlap {overlap:.1%}")
