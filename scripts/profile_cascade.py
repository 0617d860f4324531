"""Attribute full-cascade device time at bench scale, steady state.

Measures (after warmup, repeated): the production multiblock retrieval,
its pieces (pallas score vs top-k select), and the stage-2/3 decide kernels
at the hot bucket shapes.  All sync points are host fetches (the axon
tunnel's block_until_ready does not wait for remote execution).

Usage: PROF_PARTS=ADE python scripts/profile_cascade.py [n_titles] [n_queries]
"""

import os
import random
import string
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_titles = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 8_192
PARTS = set(os.environ.get("PROF_PARTS", "ABCDE"))

import jax
import jax.numpy as jnp

from doppelspeller_tpu.config import Config
from doppelspeller_tpu.ops.jaccard import JaccardScorer, _topk_multiblock, densify_weights
from doppelspeller_tpu.ops.ngram_index import build_truth_index, plan_query_blocks
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


def sync(x):
    for leaf in jax.tree.leaves(x):
        np.asarray(leaf)


cfg = Config(data_path="/tmp/prof")
t0 = time.time()
truth = TitleSet.from_titles([make_title() for _ in range(n_titles)], config=cfg)
queries = TitleSet.from_titles([make_title() for _ in range(n_queries)], config=cfg)
index = build_truth_index(truth, cfg)
scorer = JaccardScorer(index, cfg)
print(f"setup {time.time()-t0:.1f}s impl={scorer.impl} tb={scorer._pallas_tb}")

plans = plan_query_blocks(queries, index, cfg)
u = plans[0].union_ids.shape[0]
qb, lq = plans[0].w_pos.shape
k = cfg.top_n_predicting
G = cfg.dispatch_blocks
groups, _, _ = scorer._group_buffers(plans, G)
print(f"{len(plans)} blocks, {len(groups)} groups of {G}; union={u} qb={qb} lq={lq}")
# actual (unpadded) union sizes per block
import doppelspeller_tpu.utils.text as T
usizes = []
for p in plans:
    ids = T.trigram_ids_matrix(queries.encoded[p.query_rows],
                               queries.lengths[p.query_rows])
    uu = np.unique(ids)
    usizes.append(len(uu[uu != T.BIG_TRIGRAM]))
print(f"actual unions: min {min(usizes)} max {max(usizes)} "
      f"mean {np.mean(usizes):.0f}")

def kw(u_g):
    return dict(u=u_g, qb=qb, lq=lq, k=k, tb=scorer._pallas_tb,
                uc=cfg.pallas_union_chunk, score_dtype=cfg.score_dtype,
                recall_target=cfg.topk_recall_target, impl="pallas",
                title_block=cfg.title_block)
buf0 = jnp.asarray(groups[0][1])


def part_a():
    sync(_topk_multiblock(scorer.packed_d, scorer.sums_perm_d, scorer.idf_d,
                          scorer.fb_d, buf0, scorer.nt_d, **kw(groups[0][2])))
    for rep in range(2):
        t0 = time.time()
        pend = [
            _topk_multiblock(scorer.packed_d, scorer.sums_perm_d, scorer.idf_d,
                             scorer.fb_d, jnp.asarray(buf), scorer.nt_d, **kw(u_g))
            for _, buf, u_g in groups
        ]
        sync(pend)
        dt = time.time() - t0
        print(f"A{rep}. multiblock retrieval: {dt:.2f}s for {len(plans)} blocks "
              f"({n_queries/dt:.0f} q/s -> {100000/(n_queries/dt):.1f}s per 100k)")


def part_b():
    from doppelspeller_tpu.ops.jaccard_pallas import _score_kernel_v2
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @partial(jax.jit, static_argnames=("u", "qb", "lq", "uc", "tb"))
    def score_only_group(packed, sums_perm, idf_tbl, fb_tbl, buf, nt,
                         *, u, qb, lq, uc, tb):
        dtype = jnp.dtype(cfg.score_dtype)
        g = buf.shape[0] // (u + qb * lq)
        flat = buf.reshape(g, u + qb * lq)
        unions = flat[:, :u]
        w_pos = flat[:, u:].reshape(g, qb, lq)

        def step(_, x):
            union_ids, wp = x
            zero = jnp.zeros(1, jnp.float32)
            uidf = jnp.concatenate([idf_tbl[union_ids], zero])
            ufb = jnp.concatenate([fb_tbl[union_ids], zero])
            wp_c = jnp.minimum(wp, u)
            w_val = uidf[wp_c]
            maxint = ufb[wp_c].sum(axis=1)
            w = densify_weights(wp_c, w_val, u, dtype)
            rows = packed[union_ids]
            ntp_ = rows.shape[1] * 8
            jacc = pl.pallas_call(
                partial(_score_kernel_v2, score_dtype=dtype, uc=uc),
                grid=(ntp_ // tb,),
                in_specs=[
                    pl.BlockSpec((qb, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((u, tb // 8), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((qb, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((qb, tb), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((qb, ntp_), jnp.float32),
            )(w.astype(dtype), rows, sums_perm.reshape(1, ntp_),
              maxint.reshape(qb, 1), nt.reshape(1, 1))
            return None, jacc.sum()

        _, s = jax.lax.scan(step, None, (unions, w_pos))
        return s.sum()

    def args(u_g):
        return dict(u=u_g, qb=qb, lq=lq, uc=cfg.pallas_union_chunk,
                    tb=scorer._pallas_tb)

    sync(score_only_group(scorer.packed_d, scorer.sums_perm_d, scorer.idf_d,
                          scorer.fb_d, buf0, scorer.nt_d, **args(groups[0][2])))
    t0 = time.time()
    pend = [
        score_only_group(scorer.packed_d, scorer.sums_perm_d, scorer.idf_d,
                         scorer.fb_d, jnp.asarray(buf), scorer.nt_d, **args(u_g))
        for _, buf, u_g in groups
    ]
    sync(pend)
    dt = time.time() - t0
    flops = 2.0 * qb * np.mean([g[2] for g in groups]) * index.padded_titles * len(plans)
    print(f"B. score-only: {dt:.2f}s ({flops/dt/1e12:.1f} TF/s, {n_queries/dt:.0f} q/s)")


def part_c():
    from doppelspeller_tpu.ops.jaccard_pallas import select_topk_permuted

    ntp = index.padded_titles
    jacc_fake = jax.random.uniform(jax.random.PRNGKey(0), (qb, ntp), jnp.float32)
    sync(jacc_fake)

    @partial(jax.jit, static_argnames=("rt", "reps"))
    def topk_reps(jacc, *, rt, reps):
        def step(c, _):
            v, p = select_topk_permuted(jacc + c, k, scorer._pallas_tb, rt)
            return c + 1.0, (v.sum(), p.sum())
        _, (v, p) = jax.lax.scan(step, 0.0, None, length=reps)
        return v.sum() + p.sum().astype(jnp.float32)

    for rt, label in [(cfg.topk_recall_target, "approx"), (1.0, "exact")]:
        sync(topk_reps(jacc_fake, rt=rt, reps=2))
        t0 = time.time()
        sync(topk_reps(jacc_fake, rt=rt, reps=16))
        dt = (time.time() - t0) / 16
        print(f"C. top-k {label}: {dt*1000:.1f} ms/block "
              f"-> {dt*(100000/qb):.1f}s per 100k q")


def _make_model():
    from doppelspeller_tpu.models.gbt import GBTModel

    rs = np.random.RandomState(0)
    n_trees, depth = 60, 5
    n_heap = 2 ** (depth + 1) - 1
    return GBTModel(
        feat=rs.randint(0, 66, (n_trees, n_heap)).astype(np.int32),
        threshold=(rs.rand(n_trees, n_heap).astype(np.float32) * 100),
        split_bin=np.zeros((n_trees, n_heap), np.int32),
        missing_left=rs.randint(0, 2, (n_trees, n_heap)).astype(np.bool_),
        value=(rs.randn(n_trees, n_heap).astype(np.float32) * 0.1),
        is_leaf=np.zeros((n_trees, n_heap), np.bool_),
        edges=np.zeros((66, 256), np.float32),
        base_score=0.5, best_ntree_limit=n_trees, depth=depth,
    )


def part_de():
    from doppelspeller_tpu.ops.rerank import RerankEngine
    from doppelspeller_tpu.ops.features import split_words_host, remove_spaces_host
    from doppelspeller_tpu.models.trainer import WordCounts

    R, K = 4096, 100
    model = _make_model()
    wc = WordCounts(truth)
    counts = wc.matrix(truth.transformed)
    t_words = split_words_host(truth.encoded, truth.lengths)
    eng = RerankEngine(truth.encoded, truth.lengths, t_words, counts, model,
                       len(truth), cfg)

    rows = np.arange(R, dtype=np.int64)
    cand = np.asarray(np.random.RandomState(0).randint(0, n_titles, (R, K)), np.int32)
    cand_d = jnp.asarray(cand)
    q_enc = queries.encoded[:R]
    q_len = queries.lengths[:R].astype(np.int32)
    q_wo, q_wo_len = remove_spaces_host(q_enc, q_len)

    if "D" in PARTS:
        for TL, WL in [(64, 16)]:
            t0 = time.time()
            eng.decide(q_enc, q_len, q_wo, q_wo_len, cand_d, rows, TL, WL)
            t_compile = time.time() - t0
            t0 = time.time()
            eng.decide(q_enc, q_len, q_wo, q_wo_len, cand_d, rows, TL, WL)
            dt = time.time() - t0
            print(f"D. rerank decide tl={TL} wl={WL}: {dt:.2f}s for {R*K} pairs "
                  f"({R*K/dt/1000:.0f}k pairs/s; compile {t_compile:.0f}s)")

    if "E" in PARTS:
        pair_q = np.repeat(np.arange(R), K).astype(np.int64)
        pair_t = cand.reshape(-1).astype(np.int64)
        t0 = time.time()
        eng.score(q_enc, q_len, q_wo, q_wo_len, pair_q, pair_t, truth.lengths)
        t_compile = time.time() - t0
        t0 = time.time()
        eng.score(q_enc, q_len, q_wo, q_wo_len, pair_q, pair_t, truth.lengths)
        dt = time.time() - t0
        print(f"E. rerank score-path: {dt:.2f}s for {R*K} pairs "
              f"({R*K/dt/1000:.0f}k pairs/s; compile {t_compile:.0f}s)")


if "A" in PARTS:
    part_a()
if "B" in PARTS:
    part_b()
if "C" in PARTS:
    part_c()
if "D" in PARTS or "E" in PARTS:
    part_de()
