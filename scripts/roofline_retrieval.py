"""Roofline accounting for the retrieval stage (VERDICT r3 ask #1).

Isolates, at production shapes (500k titles, QB=128, real union buckets):
  1. row gather alone        -> bytes moved, GB/s vs HBM peak
  2. score kernel alone      -> MACs issued, TFLOP/s vs bf16 peak,
                                unpack VPU ops
  3. windowed top-k select   -> s/block
  4. full fused step         -> s/block (gather+score+select)

Device time is measured by running K iterations inside ONE jitted lax.scan
whose carry folds each output into a scalar that is fetched at the end —
`block_until_ready` does NOT wait for remote execution through the axon
tunnel (ARCHITECTURE.md), only data fetches do.

Usage: python scripts/roofline_retrieval.py [n_titles] [n_queries]
"""

import json
import logging
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                    format="# [%(asctime)s] %(name)s %(message)s")

N_TITLES = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
REPS = int(os.environ.get("ROOF_REPS", 24))

# v5e (1 chip): bf16 MXU peak and HBM bandwidth (public datasheet numbers)
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_synthetic_world
    from doppelspeller_tpu.ops.jaccard import JaccardScorer
    from doppelspeller_tpu.ops.jaccard_pallas import (
        gather_rows_pallas, jaccard_topk_pallas_v2, select_topk_windowed,
    )
    from doppelspeller_tpu.ops.ngram_index import build_truth_index, plan_query_blocks

    t0 = time.time()
    cfg, truth, queries, _ = make_synthetic_world(N_TITLES, N_QUERIES)
    index = build_truth_index(truth, cfg)
    scorer = JaccardScorer(index, cfg)    # relayouts to page layout on TPU
    print(f"# world+index+scorer {time.time()-t0:.0f}s impl={scorer.impl}",
          file=sys.stderr)

    # representative plans: title-sorted queries, same as the cascade
    rows = np.argsort(np.array(queries.transformed, dtype=object), kind="stable")
    plans = plan_query_blocks(queries, index, cfg, rows=rows)
    by_u = {}
    for p in plans:
        by_u.setdefault(p.union_ids.shape[0], []).append(p)
    hist = {u: len(ps) for u, ps in sorted(by_u.items())}
    print(f"# union bucket histogram: {hist}", file=sys.stderr)
    # dominant bucket
    u_star = max(hist, key=lambda u: hist[u] * u)
    plan = by_u[u_star][len(by_u[u_star]) // 2]
    qb, lq = plan.w_pos.shape
    k = cfg.top_n_predicting
    ntp = index.padded_titles
    tb = scorer._pallas_tb
    W = max(tb // 128, 1)

    union_ids = jnp.asarray(plan.union_ids)
    weights = jnp.asarray(plan.weights)      # dense (QB, U) f32
    maxint = jnp.asarray(plan.max_intersection)
    nt = jnp.int32(index.num_titles)
    packed3 = scorer.packed_d                # (V, 32, NB/32) pages
    sums_perm = scorer.sums_perm_d

    def timed_scan(fn, ops, n=REPS, label=""):
        """Run fn(i, *ops) n times in one jitted scan, folding outputs to a
        scalar.  Device operands are explicit jit ARGUMENTS — closing over a
        multi-GB array captures it as a lowering-time constant and the
        compile never finishes."""
        @jax.jit
        def run(*ops):
            def step(c, i):
                out = fn(i, *ops)
                s = sum(jnp.sum(o[:1, :1].astype(jnp.float32))
                        if o.ndim >= 2 else jnp.sum(o[:1].astype(jnp.float32))
                        for o in jax.tree_util.tree_leaves(out))
                return c + s, None
            c, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n))
            return c
        r = run(*ops)
        float(r)  # compile + warm
        t0 = time.time()
        r = run(*ops)
        float(r)  # fetch forces completion
        dt = (time.time() - t0) / n
        print(f"# {label}: {dt*1e3:.2f} ms/block", file=sys.stderr)
        return dt

    U = int(u_star)
    NB = ntp // 8

    # 1. gather only
    def g_fn(i, packed3, union_ids):
        return gather_rows_pallas(packed3, union_ids)
    t_gather = timed_scan(g_fn, (packed3, union_ids),
                          label=f"gather U={U} ({U*NB/1e6:.0f} MB)")

    # 2. score-only: pre-gathered rows resident, window-select kernel
    rows_d = gather_rows_pallas(packed3, union_ids)
    rows_d = jax.block_until_ready(rows_d)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from doppelspeller_tpu.ops.jaccard_pallas import _score_kernel_v3

    uc = min(int(getattr(cfg, "pallas_union_chunk", 512)), U)
    while U % uc:
        uc -= 1
    S = tb // W
    w_bf16 = weights.astype(jnp.bfloat16)

    def score_fn(i, rows_d, w_bf16, sums_perm, maxint, nt):
        return pl.pallas_call(
            partial(_score_kernel_v3, score_dtype=jnp.bfloat16, uc=uc, W=W),
            grid=(ntp // tb,),
            in_specs=[
                pl.BlockSpec((qb, U), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((U, tb // 8), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((qb, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((qb, S), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((qb, S), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((qb, ntp // W), jnp.float32),
                jax.ShapeDtypeStruct((qb, ntp // W), jnp.int32),
            ],
        )(w_bf16, rows_d, sums_perm.reshape(1, ntp), maxint.reshape(qb, 1),
          nt.reshape(1, 1))
    t_score = timed_scan(score_fn, (rows_d, w_bf16, sums_perm, maxint, nt),
                         label=f"score(v3 ws) U={U}")

    # 3. select only
    wmax, warg = score_fn(0, rows_d, w_bf16, sums_perm, maxint, nt)
    wmax = jax.block_until_ready(wmax)
    warg = jax.block_until_ready(warg)
    rt = float(getattr(cfg, "topk_recall_target", 1.0))

    def sel_fn(i, wmax, warg):
        return select_topk_windowed(wmax, warg, k, tb, W, rt)
    t_sel = timed_scan(sel_fn, (wmax, warg), label="windowed select")

    # 4. full fused step (gather + score + select), as production runs it
    def full_fn(i, packed3, sums_perm, w_bf16, maxint, union_ids, nt):
        return jaccard_topk_pallas_v2(
            packed3, sums_perm, w_bf16, maxint, union_ids, nt,
            k=k, tb=tb, uc=uc, score_dtype="bfloat16",
            recall_target=rt, window_select=True,
        )
    t_full = timed_scan(
        full_fn, (packed3, sums_perm, w_bf16, maxint, union_ids, nt),
        label="full fused step",
    )

    # 5. folded coarse step (ops/fold.py): resident C-bucket matrix, no
    # gather — the round-4 two-stage redesign's stage 1
    from doppelspeller_tpu.ops.fold import build_fold_map, build_folded_matrix

    C = int(getattr(cfg, "fold_dim", 512))
    fold = build_fold_map(index.df, C)
    mc = build_folded_matrix(truth.encoded, truth.lengths, fold, C, ntp)
    mc = jax.block_until_ready(mc)
    wf = jnp.asarray(
        np.random.default_rng(0).random((qb, C), dtype=np.float32)
    ).astype(jnp.bfloat16)

    def folded_fn(i, mc, sums_perm, wf, maxint, nt):
        return jaccard_topk_pallas_v2(
            mc, sums_perm, wf, maxint, None, nt,
            k=k, tb=tb, uc=min(512, C), score_dtype="bfloat16",
            recall_target=rt, window_select=True,
        )
    t_folded = timed_scan(folded_fn, (mc, sums_perm, wf, maxint, nt),
                          label=f"folded coarse C={C}")

    # ---- roofline table -------------------------------------------------
    bytes_gathered = U * NB
    macs = qb * U * ntp
    # unpack: per title tile the kernel does 8 mask+convert passes over the
    # (U, tb/8) byte block -> ~2 VPU ops per byte per bit-plane
    unpack_ops = 16 * U * NB
    sel_bytes = 2 * (qb * ntp // W) * 8   # wmax f32 + warg i32, write+read

    gbs = bytes_gathered / t_gather / 1e9
    tflops = 2 * macs / t_score / 1e12
    rows_ = []
    rows_.append(("gather", f"{bytes_gathered/1e6:.0f} MB", f"{t_gather*1e3:.1f} ms",
                  f"{gbs:.0f} GB/s", f"{100*gbs/PEAK_HBM_GBS:.0f}% of HBM peak"))
    rows_.append(("score", f"{2*macs/1e9:.1f} GFLOP + {unpack_ops/1e9:.1f} G VPU-ops",
                  f"{t_score*1e3:.1f} ms", f"{tflops:.1f} TFLOP/s",
                  f"{100*tflops/PEAK_BF16_TFLOPS:.0f}% of bf16 peak"))
    rows_.append(("select", f"{sel_bytes/1e6:.0f} MB", f"{t_sel*1e3:.1f} ms",
                  f"{sel_bytes/t_sel/1e9:.0f} GB/s", ""))
    rows_.append(("full", "", f"{t_full*1e3:.1f} ms",
                  f"sum-of-parts {1e3*(t_gather+t_score+t_sel):.1f} ms", ""))
    mc_macs = qb * C * ntp
    rows_.append(("folded", f"{2*mc_macs/1e9:.1f} GFLOP, 0 B gathered",
                  f"{t_folded*1e3:.1f} ms",
                  f"{2*mc_macs/t_folded/1e12:.1f} TFLOP/s", "coarse C=%d" % C))
    print("\n# Roofline @ QB=%d U=%d ntp=%d (dominant bucket):" % (qb, U, ntp),
          file=sys.stderr)
    for r in rows_:
        print("#   %-7s %-34s %-9s %-22s %s" % r, file=sys.stderr)

    n_blocks = len(plans)
    est = n_blocks * t_full
    print(f"# {n_blocks} blocks for {len(rows)} rows -> est. retrieval "
          f"{est:.2f}s at this bucket's cost", file=sys.stderr)
    print(json.dumps({
        "qb": qb, "u": U, "ntp": ntp, "blocks": n_blocks,
        "t_gather_ms": round(t_gather * 1e3, 2),
        "t_score_ms": round(t_score * 1e3, 2),
        "t_select_ms": round(t_sel * 1e3, 2),
        "t_full_ms": round(t_full * 1e3, 2),
        "t_folded_coarse_ms": round(t_folded * 1e3, 2),
        "fold_dim": C,
        "gather_gbs": round(gbs, 1),
        "score_tflops": round(tflops, 2),
        "bucket_hist": hist,
    }))


if __name__ == "__main__":
    main()
