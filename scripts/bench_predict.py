"""Predict-only bench iteration harness: caches the synthetic world, model
and packed index under /tmp so repeated perf runs skip the 4-minute setup.

Usage: python scripts/bench_predict.py [n_titles] [n_queries] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

import bench  # noqa: E402

from doppelspeller_tpu.config import set_config  # noqa: E402
from doppelspeller_tpu.models.gbt import GBTModel  # noqa: E402
from doppelspeller_tpu.ops.ngram_index import TruthIndex, build_truth_index  # noqa: E402
from doppelspeller_tpu.pipeline import Matcher  # noqa: E402
from doppelspeller_tpu.utils.io import TitleSet  # noqa: E402

cache = f"/tmp/bench_world_{n_titles}_{n_queries}"
os.makedirs(cache, exist_ok=True)

t0 = time.time()
cfg, truth, queries, actual = bench.make_synthetic_world(n_titles, n_queries)
set_config(cfg)
print(f"world: {time.time()-t0:.1f}s")

model_path = os.path.join(cache, "model.npz")
if os.path.exists(model_path):
    model = GBTModel.load(model_path)
else:
    model = bench.quick_train_model(cfg, truth, 60)
    model.save(model_path)
    print(f"model trained: {time.time()-t0:.1f}s")

index_path = os.path.join(cache, "index.npz")
if os.path.exists(index_path):
    index = TruthIndex.load(index_path)
else:
    index = build_truth_index(truth, cfg)
    index.save(index_path)

matcher = Matcher(cfg, truth=truth, index=index, model=model,
                  use_index_checkpoint=False)

# warmup (device-path programs)
warm = TitleSet.from_titles(queries.titles[:: max(n_queries // 4096, 1)][:4096],
                            config=cfg)
t0 = time.time()
matcher.predict(warm)
print(f"warmup: {time.time()-t0:.1f}s")

for r in range(reps):
    t0 = time.time()
    res = matcher.predict(queries)
    dt = time.time() - t0
    pred = res.match_title_id
    acc = float((pred == actual).mean())
    print(f"rep{r}: {dt:.1f}s ({n_queries/dt:.0f} q/s) acc={acc:.4f} "
          f"stages={res.stage_counts} secs={ {k: round(v,2) for k,v in res.stage_seconds.items()} }")
