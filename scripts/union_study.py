"""Host-side study: per-block trigram-union sizes under different query
orderings and block sizes, on the synthetic bench world.

Retrieval matmul work is Sum_blocks QB * U_b * ntp; the per-query trigram
count is fixed, so the whole game is minimizing the padded union per block.
No device needed: this only builds trigram id sets.

Usage: python scripts/union_study.py [n_titles] [n_queries]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from bench import make_synthetic_world  # noqa: E402
from doppelspeller_tpu.utils import text as T  # noqa: E402


def union_sizes(ids_all, order, qb, cap):
    """Per-block union sizes for queries taken in `order`, blocks of qb."""
    sizes = []
    for s in range(0, len(order), qb):
        sel = order[s : s + qb]
        u = np.unique(ids_all[sel])
        u = u[u != T.BIG_TRIGRAM]
        # planner splits blocks whose union overflows the cap
        if len(u) > cap:
            mid = max(len(sel) // 2, 1)
            for half in (sel[:mid], sel[mid:]):
                uu = np.unique(ids_all[half])
                uu = uu[uu != T.BIG_TRIGRAM]
                sizes.append((len(uu), len(half)))
        else:
            sizes.append((len(u), len(sel)))
    return sizes


def bucketize(sizes, buckets):
    out = []
    for u, m in sizes:
        b = next(x for x in buckets if u <= x)
        out.append((b, m))
    return out


def report(name, sizes, buckets, qb):
    bs = bucketize(sizes, buckets)
    # matmul work proxy: blocks are padded to qb rows and bucket columns
    work = sum(qb * b for b, _ in bs)
    from collections import Counter

    hist = Counter(b for b, _ in bs)
    print(f"{name:42s} blocks={len(bs):4d} work={work/1e6:8.2f}M "
          f"mean_u={np.mean([u for u, _ in sizes]):6.0f} "
          f"hist={dict(sorted(hist.items()))}")
    return work


def main():
    n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    t0 = time.time()
    cfg, truth, queries, actual = make_synthetic_world(n_titles, n_queries)
    print(f"world in {time.time()-t0:.0f}s")

    # emulate the cascade: drop exact matches first
    reverse = {t: i for t, i in zip(truth.transformed, truth.ids)}
    rem = np.array(
        [i for i, t in enumerate(queries.transformed) if t not in reverse],
        dtype=np.int64,
    )
    print(f"{len(rem)} post-exact queries")

    t0 = time.time()
    ids_all = T.trigram_ids_matrix(queries.encoded[rem], queries.lengths[rem])
    print(f"trigram matrix in {time.time()-t0:.1f}s  shape={ids_all.shape}")
    valid = ids_all != T.BIG_TRIGRAM
    counts = valid.sum(axis=1)
    print(f"trigrams/query: mean {counts.mean():.1f} p50 {np.median(counts):.0f} "
          f"p95 {np.percentile(counts, 95):.0f} max {counts.max()}")

    titles = np.array(queries.transformed, dtype=object)[rem]

    n = len(rem)
    orders = {}
    orders["arrival (none)"] = np.arange(n)
    t0 = time.time()
    orders["lexsort title (current)"] = np.argsort(titles, kind="stable")
    print(f"title sort in {time.time()-t0:.1f}s")

    # token-sorted title (suffix words group with stems)
    t0 = time.time()
    tok = np.array([" ".join(sorted(t.split())) for t in titles], dtype=object)
    orders["token-sorted title"] = np.argsort(tok, kind="stable")
    print(f"token sort in {time.time()-t0:.1f}s")

    # reversed title: groups shared suffix words
    rev = np.array([t[::-1] for t in titles], dtype=object)
    orders["reversed title"] = np.argsort(rev, kind="stable")

    # sorted-trigram-signature: lexicographic over each query's sorted ids
    t0 = time.time()
    sig = np.sort(ids_all, axis=1)  # BIG goes last
    orders["sorted trigram signature"] = np.lexsort(sig.T[::-1])
    print(f"signature sort in {time.time()-t0:.1f}s")

    # rarest-trigram key: queries sharing their rarest trigram cluster
    df = np.zeros(T.BIG_TRIGRAM + 1, np.int64)
    # approximate df from the queries themselves (truth df similar scale)
    ids_flat = ids_all[valid]
    np.add.at(df, ids_flat, 1)
    dfq = np.where(valid, df[np.clip(ids_all, 0, T.BIG_TRIGRAM)], 1 << 60)
    rare1 = ids_all[np.arange(n), np.argmin(dfq, axis=1)]
    orders["rarest trigram then title"] = np.lexsort((titles, rare1))

    for qb, buckets in (
        (256, (2048, 3072, 4096, 6144, 8192)),
        (128, (1024, 1536, 2048, 3072, 4096, 8192)),
        (64, (512, 768, 1024, 1536, 2048, 8192)),
    ):
        print(f"\n=== QB={qb} ===")
        for name, order in orders.items():
            sizes = union_sizes(ids_all, order, qb, buckets[-1])
            report(name, sizes, buckets, qb)


if __name__ == "__main__":
    main()
