"""Probe decide-vs-score divergence at 500k titles (device rerank bug)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from doppelspeller_tpu.config import set_config  # noqa: E402
from doppelspeller_tpu.models.gbt import GBTModel  # noqa: E402
from doppelspeller_tpu.ops.features import remove_spaces_host  # noqa: E402
from doppelspeller_tpu.pipeline import Matcher  # noqa: E402

n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
cfg, truth, queries, _ = bench.make_synthetic_world(n_titles, 512)
set_config(cfg)
model = GBTModel.load(f"/tmp/dbg_model_{n_titles}.npz")
m = Matcher(cfg, truth=truth, model=model, use_index_checkpoint=False)

rem = np.arange(256, dtype=np.int64)
_, cand = m.scorer.topk(queries, k=cfg.top_n_predicting, rows=rem)
engine = m._rerank_engine()

q_enc = queries.encoded[rem]
q_len = queries.lengths[rem].astype(np.int32)
q_wo, q_wo_len = remove_spaces_host(q_enc, q_len)

TL, WL = 64, 16
K = cand.shape[1]

# score path (host argmax)
pair_q = np.repeat(np.arange(256), K)
pair_t = cand.reshape(-1).astype(np.int64)
preds_s = engine.score(q_enc, q_len, q_wo, q_wo_len, pair_q, pair_t,
                       truth.lengths).reshape(256, K)

# decide path
cand_d = jnp.asarray(cand.astype(np.int32))
matched, best_pos, best_pred = engine.decide(
    q_enc, q_len, q_wo, q_wo_len, cand_d, rem, TL, WL
)

mx_s = preds_s.max(axis=1)
print("score path:  max pred per row — p50 %.3f p90 %.3f  >0.9: %d/256"
      % (np.percentile(mx_s, 50), np.percentile(mx_s, 90), (mx_s > 0.9).sum()))
print("decide path: best_pred — p50 %.3f p90 %.3f  matched: %d/256"
      % (np.percentile(best_pred, 50), np.percentile(best_pred, 90), matched.sum()))
agree = np.isclose(mx_s, best_pred, atol=1e-3).mean()
print(f"max-pred agreement: {agree:.1%}")
i = int(np.argmax(np.abs(mx_s - best_pred)))
print(f"worst row {i}: score-max {mx_s[i]:.4f} decide-best {best_pred[i]:.4f}")
print("  score preds[:8] ", np.round(preds_s[i][:8], 3))
