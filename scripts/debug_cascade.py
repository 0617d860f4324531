"""Bisect device-vs-host cascade disagreement on the bench's synthetic world.

Usage: python scripts/debug_cascade.py [n_titles] [n_queries]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 6_000

import bench  # noqa: E402  (synthetic world + trainer helpers)
from doppelspeller_tpu.config import set_config
from doppelspeller_tpu.pipeline import Matcher

cfg, truth, queries, _actual = bench.make_synthetic_world(n_titles, n_queries)
set_config(cfg)

t0 = time.time()
model_path = f"/tmp/dbg_model_{n_titles}.npz"
if os.path.exists(model_path):
    from doppelspeller_tpu.models.gbt import GBTModel

    model = GBTModel.load(model_path)
    print("loaded cached model")
else:
    model = bench.quick_train_model(cfg, truth, 60)
    model.save(model_path)
    print(f"trained {time.time()-t0:.0f}s")

m_host = Matcher(cfg.with_(cascade_impl="host"), truth=truth, model=model,
                 use_index_checkpoint=False)
m_dev = Matcher(cfg.with_(cascade_impl="device"), truth=truth, model=model,
                use_index_checkpoint=False, index=m_host.index)

r_host = m_host.predict(queries)
print("host  stages:", r_host.stage_counts)
r_dev = m_dev.predict(queries)
print("device stages:", r_dev.stage_counts)

diff = np.flatnonzero(r_host.match_title_id != r_dev.match_title_id)
print(f"match_title_id diffs: {len(diff)} / {len(queries)}")
if len(diff):
    for i in diff[:10]:
        print(f"  q{i} '{queries.transformed[i][:40]}' host={r_host.match_title_id[i]}"
              f" p={r_host.prediction[i]:.3f} st={r_host.stage[i]}"
              f" dev={r_dev.match_title_id[i]} p={r_dev.prediction[i]:.3f}"
              f" st={r_dev.stage[i]}")
