"""Microbenchmark: retrieval kernel variants on the real TPU.

Sweeps (QB, tb, uc, dispatch impl) and reports per-100k-query projected time.
"""

import os
import random
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 16_384

import jax

from doppelspeller_tpu.config import Config
from doppelspeller_tpu.ops.jaccard import JaccardScorer
from doppelspeller_tpu.ops.ngram_index import build_truth_index
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


base = Config(data_path="/tmp/prof")
t0 = time.time()
truth = TitleSet.from_titles([make_title() for _ in range(n_titles)], config=base)
q_titles = [make_title() for _ in range(n_queries)]
index = build_truth_index(truth, base)
print(f"setup {time.time()-t0:.1f}s; packed {index.packed_nbytes/1e9:.2f} GB")

results = []
for qb, tb, uc, g in [
    (256, 2048, 512, 16),
    (256, 2048, 256, 16),
    (256, 4096, 512, 16),
    (256, 8192, 512, 16),
    (128, 2048, 512, 16),
    (512, 2048, 512, 8),
    (256, 2048, 512, 48),
]:
    cfg = base.with_(query_block=qb, dispatch_blocks=g, pallas_union_chunk=uc)
    scorer = JaccardScorer(index, cfg)
    scorer._pallas_tb = tb
    from doppelspeller_tpu.ops.jaccard_pallas import permute_sums
    scorer.sums_perm_d = jax.device_put(permute_sums(index.sums, tb))
    queries = TitleSet.from_titles(q_titles, config=cfg)

    # warmup (compile)
    sub = TitleSet.from_titles(q_titles[: qb * g], config=cfg)
    t0 = time.time()
    scorer.topk(sub, k=100)
    t_compile = time.time() - t0

    t0 = time.time()
    s, p = scorer.topk(queries, k=100)
    dt = time.time() - t0
    per100k = dt / n_queries * 100_000
    print(f"qb={qb} tb={tb} uc={uc} g={g}: {dt:.2f}s for {n_queries} q "
          f"({n_queries/dt:.0f} q/s, {per100k:.1f}s per 100k; compile {t_compile:.0f}s)")
    results.append((per100k, qb, tb, uc, g))

results.sort()
print("BEST:", results[0])
