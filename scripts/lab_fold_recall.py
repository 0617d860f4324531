"""Coarse-stage retention lab: how many TRUE matches survive to the rescore?

RECALL_AB.json (r5) measured folded true-match retention 0.9806 at
C=512/depth=128 vs 0.9901 for the exact path — the coarse upper bound is
loose enough that >depth titles can beat the true title's bound for ~1 % of
misspelled queries.  This lab measures the retention of the COARSE stage
directly (rank of the true title under the coarse bound) for candidate
fixes, without touching the production kernel:

  * single fold, C in {512, 1024}
  * min of TWO independent folds (count-min sketch bound: both are
    monotone upper bounds, so their elementwise min is a tighter upper
    bound and rescue ordering stays exact after the rescore)
  * depth sweep 64/128/256

Usage:  python scripts/lab_fold_recall.py [n_titles] [n_queries]
"""

import os
import random
import string
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1_024

from doppelspeller_tpu.config import TRIGRAM_VOCAB_SIZE, Config
from doppelspeller_tpu.ops.fold import build_fold_map
from doppelspeller_tpu.utils.io import TitleSet
from doppelspeller_tpu.utils.misspell import generate_misspelled_name

V = TRIGRAM_VOCAB_SIZE

rng = random.Random(7)
common = ["limited", "holdings", "group", "services", "international", "systems"]
stems = ["".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(4, 10)))
         for _ in range(max(n_titles // 12, 1000))]


def make_title():
    words = [rng.choice(stems) for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.75:
        words.append(rng.choice(common))
    return " ".join(words)


cfg = Config(data_path="/tmp/fold_lab")
t0 = time.time()
titles = [make_title() for _ in range(n_titles)]
truth = TitleSet.from_titles(titles, config=cfg)
q_rows = np.asarray([rng.randrange(n_titles) for _ in range(n_queries)])
queries = TitleSet.from_titles(
    [generate_misspelled_name(truth.transformed[j], rng) for j in q_rows],
    config=cfg,
)
print(f"# world {time.time()-t0:.0f}s", file=sys.stderr)

tid = truth.trigram_ids()                     # (N, L) int32, BIG pad
qid = queries.trigram_ids()
tid = np.minimum(tid, V).astype(np.int32)     # pad -> V
qid = np.minimum(qid, V).astype(np.int32)

# df / idf / sums straight from the id lists (ids are per-title unique)
df = np.bincount(tid[tid < V], minlength=V).astype(np.int64)
idf = np.zeros(V + 1, np.float32)
obs = df > 0
idf[:V][obs] = np.log(n_titles / df[obs])
fb = np.where(obs, idf[:V], np.float32(idf[:V][obs].max(initial=1.0)))
fb = np.concatenate([fb, np.zeros(1, np.float32)])
sums = idf[tid].sum(axis=1).astype(np.float32)          # (N,)
maxint = fb[qid].sum(axis=1).astype(np.float32)         # (Q,)

# exact score of the TRUE title per query (numpy set math; L is small)
exact_true = np.zeros(n_queries, np.float32)
for i in range(n_queries):
    shared = np.intersect1d(qid[i][qid[i] < V], tid[q_rows[i]][tid[q_rows[i]] < V])
    c = idf[shared].sum()
    exact_true[i] = c / (sums[q_rows[i]] + maxint[i] - c)

import jax
import jax.numpy as jnp

dev = jax.devices()[0]


def fold_variant(seed: int, C: int):
    """(fold_map, occ_dense, wq) for one fold; occ bf16 (C, N)."""
    if seed == 0:
        fm = build_fold_map(df, C)
    else:
        r = np.random.default_rng(seed)
        # df-balanced greedy over a jittered df order (different partition,
        # same balance property)
        order = np.argsort(-(df * r.uniform(0.5, 2.0, V)), kind="stable")
        import heapq
        fm = np.empty(V + 1, np.int32)
        fm[V] = C
        heap = [(0, c) for c in range(C)]
        nobs = int(obs.sum())
        oset = np.flatnonzero(obs)
        pos = order[np.isin(order, oset)]
        for g in pos:
            load, c = heapq.heappop(heap)
            fm[g] = c
            heapq.heappush(heap, (load + int(df[g]), c))
        rest = order[~np.isin(order, oset)]
        fm[rest] = np.arange(len(rest)) % C
    fmj = jnp.asarray(fm)

    @jax.jit
    def occ_block(ids):
        f = fmj[ids]                                  # (B, L)
        b = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
        o = jnp.zeros((ids.shape[0], C + 1), jnp.float32)
        o = o.at[b, f].max(jnp.ones_like(f, jnp.float32))
        return o[:, :C].astype(jnp.bfloat16)

    blocks = []
    B = 65536
    for s in range(0, n_titles, B):
        blocks.append(occ_block(jnp.asarray(tid[s : s + B])))
    occ = jnp.concatenate(blocks, axis=0).T            # (C, N)

    @jax.jit
    def wq_block(ids):
        w = idf_j[ids]
        f = fmj[ids]
        q = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
        o = jnp.zeros((ids.shape[0], C + 1), jnp.float32)
        o = o.at[q, f].add(w)
        return o[:, :C]

    idf_j = jnp.asarray(idf)
    wq = wq_block(jnp.asarray(qid))                    # (Q, C)
    return occ, wq


sums_j = jnp.asarray(sums)
maxint_j = jnp.asarray(maxint)
rows_j = jnp.asarray(q_rows)

QCH = 256


@jax.jit
def _ranks_chunk_single(occ, wq, mi, rows):
    c = (wq.astype(jnp.bfloat16) @ occ).astype(jnp.float32)
    s = c / jnp.maximum(sums_j[None, :] + mi[:, None] - c, 1e-9)
    true_s = jnp.take_along_axis(s, rows[:, None], axis=1)
    return (s > true_s).sum(axis=1)


@jax.jit
def _ranks_chunk_min(occ1, wq1, occ2, wq2, mi, rows):
    c1 = (wq1.astype(jnp.bfloat16) @ occ1).astype(jnp.float32)
    c2 = (wq2.astype(jnp.bfloat16) @ occ2).astype(jnp.float32)
    c = jnp.minimum(c1, c2)
    s = c / jnp.maximum(sums_j[None, :] + mi[:, None] - c, 1e-9)
    true_s = jnp.take_along_axis(s, rows[:, None], axis=1)
    return (s > true_s).sum(axis=1)


def report_min(name, o1, w1, o2, w2):
    parts = []
    for s in range(0, n_queries, QCH):
        sl = slice(s, min(s + QCH, n_queries))
        parts.append(np.asarray(_ranks_chunk_min(
            o1, w1[sl], o2, w2[sl], maxint_j[sl], rows_j[sl])))
    r = np.concatenate(parts)
    line = " ".join(f"@{d}:{(r < d).mean():.5f}" for d in (64, 128, 256))
    print(f"{name:18s} retention {line}")


def report_single(name, o, w):
    parts = []
    for s in range(0, n_queries, QCH):
        sl = slice(s, min(s + QCH, n_queries))
        parts.append(np.asarray(_ranks_chunk_single(
            o, w[sl], maxint_j[sl], rows_j[sl])))
    r = np.concatenate(parts)
    line = " ".join(f"@{d}:{(r < d).mean():.5f}" for d in (64, 128, 256))
    print(f"{name:18s} retention {line}")


t0 = time.time()
occ1, wq1 = fold_variant(0, 512)
print(f"# folds built {time.time()-t0:.0f}s", file=sys.stderr)
report_single("single C=512", occ1, wq1)
occ2, wq2 = fold_variant(1, 512)
report_min("min2 C=512", occ1, wq1, occ2, wq2)
del occ2, wq2
if os.environ.get("LAB_SMALL", "0") == "1":
    # 2×256 = the MAC/footprint budget of a single 512 fold
    occ1s, wq1s = fold_variant(0, 256)
    report_single("single C=256", occ1s, wq1s)
    occ2s, wq2s = fold_variant(3, 256)
    report_min("min2 C=256", occ1s, wq1s, occ2s, wq2s)
    del occ1s, wq1s, occ2s, wq2s
if os.environ.get("LAB_BIG", "1") == "1":
    occ1k, wq1k = fold_variant(0, 1024)
    report_single("single C=1024", occ1k, wq1k)
    occ2k, wq2k = fold_variant(2, 1024)
    report_min("min2 C=1024", occ1k, wq1k, occ2k, wq2k)
