"""r5 folded-retrieval attribution lab: where do ~3 ms/block go on-chip?

profile_folded.py measures the folded step at ~1.2 ms/block inside one
scan-24 program, but the production stage runs ~3 ms/block (retrieval_lab).
This lab isolates the difference on the REAL bench world (reusing the
bench_serving index checkpoint so iteration costs seconds, not the 350 s
device build): probe on/off, dispatch group size, fold_dim, and a
per-group-sync serial decomposition.

Usage: python scripts/lab_folded_r5.py [variant ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import logging

logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                    format="# [%(asctime)s] %(name)s %(message)s")

from bench import make_synthetic_world  # noqa: E402

from doppelspeller_tpu.ops.jaccard import JaccardScorer  # noqa: E402
from doppelspeller_tpu.ops.ngram_index import TruthIndex, build_truth_index  # noqa: E402

REPS = int(os.environ.get("LAB_REPS", 3))

VARIANTS = {
    "prod": dict(),                                   # defaults, probe on
    "noprobe": dict(_probe=False),
    "g64": dict(dispatch_blocks=64),
    "g16": dict(dispatch_blocks=16),
    "g8": dict(dispatch_blocks=8),
    "c256": dict(fold_dim=256),
    "c256np": dict(fold_dim=256, _probe=False),
    "c384np": dict(fold_dim=384, _probe=False),
    "c1024": dict(fold_dim=1024),
    "nowsel": dict(retrieval_window_select=False),
    "serial": dict(_serial=True),                     # sync after each group
    # r5: hash count / rescore depth / select window sweep
    "h1": dict(fold_hashes=1),
    "h2": dict(fold_hashes=2),
    "h2d64": dict(fold_hashes=2, rescore_depth=64),
    "h1d64": dict(fold_hashes=1, rescore_depth=64),
    # NOTE: fold_select_window > tb//128 is impossible at tb=2048 — the
    # fused selector's out-block lane width tb//W must stay >= 128
    "h2c256": dict(fold_hashes=2, fold_dim=256),
    "r95": dict(topk_recall_target=0.95),
    "h2r95": dict(fold_hashes=2, topk_recall_target=0.95),
    "h2c256r95": dict(fold_hashes=2, fold_dim=256, topk_recall_target=0.95),
}


def main():
    names = sys.argv[1:] or ["prod", "noprobe", "g64", "serial"]
    t0 = time.time()
    cfg0, truth, queries, _ = make_synthetic_world(500_000, 100_000)
    print(f"# world {time.time()-t0:.0f}s", file=sys.stderr)

    idx_path = "/tmp/bench_world_500000_100000/index.npz"
    t0 = time.time()
    if os.path.exists(idx_path):
        index = TruthIndex.load(idx_path)
    else:
        index = build_truth_index(truth, cfg0)
        os.makedirs(os.path.dirname(idx_path), exist_ok=True)
        index.save(idx_path)
    print(f"# index {time.time()-t0:.0f}s", file=sys.stderr)

    reverse = {t: i for t, i in zip(truth.transformed, truth.ids)}
    rem = np.array([i for i, t in enumerate(queries.transformed)
                    if t not in reverse], dtype=np.int64)
    titles = np.array(queries.transformed, dtype=object)
    rem = rem[np.argsort(titles[rem], kind="stable")]
    queries.trigram_ids()                              # cache once
    print(f"# {len(rem)} post-exact rows", file=sys.stderr)

    import jax
    import jax.numpy as jnp

    from doppelspeller_tpu.ops.features import split_words_host

    start, wlen, _ = split_words_host(truth.encoded, truth.lengths)
    tl_d = jnp.asarray(truth.lengths.astype(np.int32))
    wl_d = jnp.asarray(wlen.max(axis=1).astype(np.int32))
    jax.block_until_ready((tl_d, wl_d))

    scorers = {}
    for name in names:
        v = dict(VARIANTS[name])
        probe = v.pop("_probe", True)
        serial = v.pop("_serial", False)
        key = tuple(sorted(v.items()))
        if key not in scorers:
            cfg = cfg0.with_(retrieval_mode="folded", **v)
            t0 = time.time()
            scorers[key] = JaccardScorer(index, cfg, truth=truth)
            np.asarray(scorers[key].folded.mc_d[:1, :8])
            print(f"# scorer[{name}] up {time.time()-t0:.1f}s",
                  file=sys.stderr)
        scorer = scorers[key]
        pt = (tl_d, wl_d) if probe else None

        # warmup/compile
        pend, _ = scorer.topk_device(queries, k=100, rows=rem[:8192],
                                     probe_tables=pt)
        np.asarray(pend[-1][1])

        times = []
        for rep in range(REPS):
            t0 = time.time()
            pend, plans = scorer.topk_device(queries, k=100, rows=rem,
                                             probe_tables=pt)
            if serial:
                marks = []
                for p in pend:
                    np.asarray(p[1][:1, :1, :1])
                    marks.append(time.time() - t0)
                print("# serial group marks: "
                      + " ".join(f"{m:.2f}" for m in marks), file=sys.stderr)
            np.asarray(pend[-1][1])
            times.append(time.time() - t0)
        times.sort()
        print(f"RESULT {name}: best {times[0]:.2f}s median "
              f"{times[len(times)//2]:.2f}s all "
              f"{[round(t, 2) for t in times]} "
              f"({len(plans)} blocks, {len(pend)} groups)", flush=True)


if __name__ == "__main__":
    main()
