"""TPU lab: time the retrieval stage (plan + dispatch + score + probe) at
bench scale under alternative blocking configs, reusing one world + index.

Usage: python scripts/retrieval_lab.py [variant ...]
Variants: r2 (round-2 defaults), qb128, qb128g32, ...
"""

import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                    format="# [%(asctime)s] %(name)s %(message)s")

from bench import make_synthetic_world  # noqa: E402

N_TITLES = int(os.environ.get("LAB_TITLES", 500_000))
N_QUERIES = int(os.environ.get("LAB_QUERIES", 100_000))

VARIANTS = {
    "r2": dict(query_block=256, union_buckets=(2048, 3072, 4096, 6144, 8192),
               dispatch_blocks=16),
    "qb128": dict(query_block=128,
                  union_buckets=(1024, 1536, 2048, 3072, 4096),
                  dispatch_blocks=16),
    "qb128g32": dict(query_block=128,
                     union_buckets=(1024, 1536, 2048, 3072, 4096),
                     dispatch_blocks=32),
    "qb128uc512": dict(query_block=128,
                       union_buckets=(1024, 1536, 2048, 3072, 4096),
                       dispatch_blocks=32, pallas_union_chunk=512),
    # folded two-stage variants (fold_query_block sweep; retrieval_mode
    # forced so the lab works below folded_min_titles too)
    "fold": dict(retrieval_mode="folded"),
    "fold256": dict(retrieval_mode="folded", fold_query_block=256),
    "fold512": dict(retrieval_mode="folded", fold_query_block=512),
    "fold512g64": dict(retrieval_mode="folded", fold_query_block=512,
                       dispatch_blocks=64),
    "fold512kp64": dict(retrieval_mode="folded", fold_query_block=512,
                        rescore_depth=64),
    "fold256kp96": dict(retrieval_mode="folded", fold_query_block=256,
                        rescore_depth=96),
    # r5: depth sweep at the production block size (the r4 kp sweeps all
    # changed fold_query_block at the same time)
    "foldkp64": dict(retrieval_mode="folded", rescore_depth=64),
    "foldkp96": dict(retrieval_mode="folded", rescore_depth=96),
}


def _watchdog(limit_s: float):
    """Hard-exit if no progress ping within limit_s — a wedged axon client
    sleeps forever on a lost tunnel reply; the outer retry loop restarts."""
    import threading

    state = {"t": time.time()}

    def ping():
        state["t"] = time.time()

    def loop():
        while True:
            time.sleep(15)
            if time.time() - state["t"] > limit_s:
                print(f"# WATCHDOG: no progress in {limit_s}s — exiting 42",
                      file=sys.stderr, flush=True)
                os._exit(42)

    threading.Thread(target=loop, daemon=True).start()
    return ping


def main():
    import jax

    ping = _watchdog(float(os.environ.get("LAB_WATCHDOG_S", 420)))

    from doppelspeller_tpu.ops.features import split_words_host
    from doppelspeller_tpu.ops.jaccard import JaccardScorer
    from doppelspeller_tpu.ops.ngram_index import build_truth_index

    names = sys.argv[1:] or ["r2", "qb128g32"]
    t0 = time.time()
    cfg0, truth, queries, actual = make_synthetic_world(N_TITLES, N_QUERIES)
    print(f"# world {time.time()-t0:.0f}s", file=sys.stderr)

    t0 = time.time()
    index = build_truth_index(truth, cfg0)
    print(f"# index {time.time()-t0:.0f}s", file=sys.stderr)

    # emulate post-exact remaining rows, sorted as the cascade sorts them
    reverse = {t: i for t, i in zip(truth.transformed, truth.ids)}
    rem = np.array([i for i, t in enumerate(queries.transformed)
                    if t not in reverse], dtype=np.int64)
    titles = np.array(queries.transformed, dtype=object)
    rem = rem[np.argsort(titles[rem], kind="stable")]
    print(f"# {len(rem)} post-exact rows", file=sys.stderr)

    start, wlen, _ = split_words_host(truth.encoded, truth.lengths)
    import jax.numpy as jnp

    tl_d = jnp.asarray(truth.lengths.astype(np.int32))
    wl_d = jnp.asarray(wlen.max(axis=1).astype(np.int32))

    t0 = time.time()
    jax.block_until_ready(tl_d)
    print(f"# probe tables up {time.time()-t0:.1f}s", file=sys.stderr)

    for name in names:
        cfg = cfg0.with_(**VARIANTS[name])
        t0 = time.time()
        folded_variant = VARIANTS[name].get("retrieval_mode") == "folded"
        scorer = JaccardScorer(index, cfg,
                               truth=truth if folded_variant else None)
        if scorer.folded is not None:
            np.asarray(scorer.folded.mc_d[:1, :8])     # sync engine build
        else:
            jax.block_until_ready(scorer.packed_d)
        t_up = time.time() - t0
        ping()

        # warmup (compile): a slice covering the union buckets
        t0 = time.time()
        pend, _ = scorer.topk_device(queries, k=100, rows=rem[:8192],
                                     probe_tables=(tl_d, wl_d))
        for _, v, p, t in pend:
            np.asarray(v)
            ping()
        t_warm = time.time() - t0

        reps = []
        for rep in range(2):
            t0 = time.time()
            pend, plans = scorer.topk_device(queries, k=100, rows=rem,
                                             probe_tables=(tl_d, wl_d))
            ping()
            np.asarray(pend[-1][1])          # sync on last group
            t_done = time.time() - t0
            ping()
            # full fetch (what the cascade pays at barrier 1)
            for _, v, p, t in pend:
                np.asarray(v), np.asarray(p), np.asarray(t)
                ping()
            t_fetch = time.time() - t0 - t_done
            reps.append((t_done, t_fetch))
            print(f"# {name} rep{rep}: retrieval {t_done:.2f}s "
                  f"+fetch {t_fetch:.2f}s  ({len(plans)} blocks, "
                  f"{len(pend)} groups)", file=sys.stderr, flush=True)
        best = min(r[0] for r in reps)
        print(f"RESULT {name}: upload {t_up:.1f}s warm {t_warm:.1f}s "
              f"best_retrieval {best:.2f}s", flush=True)


if __name__ == "__main__":
    main()
