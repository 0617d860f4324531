"""Pallas TPU kernel for the jaccard scoring matmul.

The XLA path (ops/jaccard.py) unpacks the gathered bit rows to a bf16 matrix
in HBM before the MXU matmul — 24× the bit-data in write+read traffic.  Here
each grid step unpacks one (U-chunk × title-tile) block *in VMEM* and feeds
the MXU directly, so HBM sees only the packed bytes once plus the score
output.

Bit→lane mapping: `pltpu.repeat` tiles whole copies, so a byte-block
(UC, TB/8) repeated 8× puts byte b of copy s at column c = s·(TB/8) + b.
Extracting bit s of that byte makes column c carry title
t = 8·(c mod TB/8) + c÷(TB/8) — a fixed per-tile permutation π.  The kernel
computes global title positions through π for the validity mask, the caller
permutes `sums` once at init and un-permutes the top-k indices.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_rows_kernel(ids_ref, src_ref, out_ref, sems, *, cuc: int):
    """Copy ``cuc`` dynamically-indexed rows of ``src_ref`` (HBM-resident)
    into this grid step's VMEM output block with overlapping async DMAs.

    XLA's row gather on TPU moves ~7 GB/s (measured: 38 ms for 4096 x 64 KB
    rows — the whole retrieval bottleneck at 500k titles); explicit row DMAs
    stream at memory speed.  Rows are viewed as (8, NB/8) blocks because
    Mosaic requires HBM slices to be sublane-aligned (a (1, NB) i8 slice is
    rejected: 'must be aligned to tiling (8)')."""
    j = pl.program_id(0)
    for i in range(cuc):
        pltpu.make_async_copy(
            src_ref.at[ids_ref[j * cuc + i]],
            out_ref.at[i],
            sems.at[i],
        ).start()
    for i in range(cuc):
        pltpu.make_async_copy(
            src_ref.at[ids_ref[j * cuc + i]],
            out_ref.at[i],
            sems.at[i],
        ).wait()


def gatherable_view(packed: jnp.ndarray) -> jnp.ndarray:
    """(V, NB) u8 → (V, 32, NB/32): each row becomes its own contiguous,
    exactly tile-aligned page (i8 native tile is (32, 128)).  In the flat 2D
    layout a logical row is interleaved with 31 OTHER rows inside every
    (32, 128) tile, which is why both the XLA gather and naive row DMAs
    crawl at ~5-7 GB/s."""
    V, NB = packed.shape
    return packed.reshape(V, 32, NB // 32)


@partial(jax.jit, static_argnames=("cuc", "interpret"))
def gather_rows_pallas(packed3: jnp.ndarray, ids: jnp.ndarray, *,
                       cuc: int = 16, interpret: bool = False
                       ) -> jnp.ndarray:
    """(V, 32, NB/32) uint8 (see gatherable_view), (U,) int32 →
    (U, NB) gathered rows at DMA speed.

    Falls back to the XLA gather when the row width cannot form a
    lane-aligned page (tiny test worlds) or in interpret mode."""
    U = ids.shape[0]
    V, _, W = packed3.shape
    NB = 32 * W
    if interpret or W % 128 or U % cuc:
        return packed3[ids].reshape(U, NB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(U // cuc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (cuc, 32, W), lambda j, ids: (j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((cuc,))],
    )
    out3 = pl.pallas_call(
        partial(_gather_rows_kernel, cuc=cuc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((U, 32, W), packed3.dtype),
    )(ids, packed3)
    return out3.reshape(U, NB)


@partial(jax.jit, donate_argnums=(0,))
def relayout_to_pages(flat: jnp.ndarray) -> jnp.ndarray:
    """(V, NB) u8 device array → (V, 32, NB/32) page layout, chunked.

    A monolithic ``reshape`` lowers to a u8 retiling with a multi-GB hidden
    workspace (measured on v5e: with 9.75 GB free, relayouting a 6.4 GB
    matrix at 1M titles OOMs).  Scanning 32 stripe copies into a
    preallocated output bounds the transient to one (V, NB/32) slice
    (~200 MB at 1M titles); peak residency is input + output + one slice."""
    V, NB = flat.shape
    W = NB // 32

    def step(out, s):
        piece = jax.lax.dynamic_slice(flat, (0, s * W), (V, W))
        out = jax.lax.dynamic_update_slice(out, piece[:, None, :], (0, s, 0))
        return out, None

    out0 = jnp.zeros((V, 32, W), jnp.uint8)
    out, _ = jax.lax.scan(step, out0, jnp.arange(32))
    return out


def permute_sums(sums: np.ndarray, tb: int) -> np.ndarray:
    """Host-side: reorder per-title IDF sums into the kernel's π layout."""
    ntp = sums.shape[0]
    assert ntp % tb == 0
    nb = tb // 8
    c = np.arange(tb)
    pi = 8 * (c % nb) + c // nb
    return sums.reshape(-1, tb)[:, pi].reshape(-1)


def unpermute_positions(idx: np.ndarray | jnp.ndarray, tb: int):
    """Map score-column indices back to title positions (inverse of π)."""
    nb = tb // 8
    blk = idx // tb
    c = idx % tb
    return blk * tb + 8 * (c % nb) + c // nb


def _score_kernel(
    w_ref,        # (QB, UC) score-dtype weights — this u-chunk's columns
    rows_ref,     # (UC, TB//8) u8 — this (u-chunk × title-tile) packed block
    sums_ref,     # (1, TB) f32 — π-permuted idf sums for this tile
    maxint_ref,   # (QB, 1) f32
    nt_ref,       # (1, 1) i32 in SMEM
    out_ref,      # (QB, TB) f32 jaccard scores (π-permuted); revisited
                  #   across the u-chunk grid axis → accumulates in VMEM
    *, score_dtype,
):
    TB = out_ref.shape[1]
    nb = TB // 8
    tile = pl.program_id(0)
    j = pl.program_id(1)
    n_uc = pl.num_programs(1)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, TB), 1)
    shift = (col // nb).astype(jnp.int32)                 # bit index per column

    rep = pltpu.repeat(rows_ref[:], 8, axis=1).astype(jnp.int32)   # (UC, TB)
    bits = ((rep >> shift) & 1).astype(score_dtype)
    part = jax.lax.dot_general(
        w_ref[:], bits,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = part

    @pl.when(j > 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + part

    @pl.when(j == n_uc - 1)
    def _():
        acc = out_ref[:, :]
        nt = nt_ref[0, 0]
        denom = sums_ref[:] + maxint_ref[:] - acc
        jacc = acc / jnp.maximum(denom, 1e-9)
        tpos = tile * TB + 8 * (col % nb) + col // nb
        out_ref[:, :] = jnp.where(tpos < nt, jacc, -1.0)


def _unpack_mm_chunk(w_ref, rows_ref, uc, score_dtype, j, acc, base: int = 0):
    """One union chunk of the scoring matmul, byte-slice formulation.

    In the π layout, bit s of byte column b is title column s·nb + b — a
    CONTIGUOUS slice — so the unpack is 8 constant-shift mask-compares on
    the (uc, TB/8) byte block feeding 8 narrow MXU matmuls.  ~20% faster
    than repeat+per-lane-variable-shift and far lighter on VMEM (no
    (uc, TB) i32 materialization), measured on v5e at U=2048.

    ``base`` offsets both slices — the two-hash folded accumulation runs
    this over each half of a stacked [Mc1; Mc2] row matrix."""
    rows_c = rows_ref[pl.ds(base + j * uc, uc), :].astype(jnp.int32)
    wc = w_ref[:, pl.ds(base + j * uc, uc)]                     # (QB, uc)
    # with f32 weights force true-f32 MXU passes: the DEFAULT precision
    # multiplies in bf16 even for f32 inputs, a ~1e-3 relative score error
    # the "exact" oracle config must not carry
    precision = (jax.lax.Precision.HIGHEST
                 if jnp.dtype(score_dtype) == jnp.float32 else None)
    parts = []
    for s in range(8):
        bits = ((rows_c & (1 << s)) != 0).astype(score_dtype)
        parts.append(jax.lax.dot_general(
            wc, bits,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ))
    return acc + jnp.concatenate(parts, axis=1)


def _score_kernel_v2(
    w_ref,        # (QB, U) score-dtype weights — FULL union, VMEM-resident
    rows_ref,     # (U, TB//8) u8 — this title-tile's packed rows
    sums_ref,     # (1, TB) f32 — π-permuted idf sums for this tile
    maxint_ref,   # (QB, 1) f32
    nt_ref,       # (1, 1) i32 in SMEM
    out_ref,      # (QB, TB) jaccard scores (π-permuted; out dtype = bf16
                  #   when scoring in bf16 — halves the HBM traffic the
                  #   top-k selector then has to read back)
    *, score_dtype, uc, folds=1,
):
    """One grid step per title tile; the union axis is an inner fori_loop
    (the v1 kernel used a second grid axis — 8192 grid steps per block whose
    fixed overheads dominated the ~1.4us matmuls; here it is 64-256 steps)."""
    QB = out_ref.shape[0]
    TB = out_ref.shape[1]
    nb = TB // 8
    tile = pl.program_id(0)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, TB), 1)

    acc = _accumulate_numerator(w_ref, rows_ref, uc, score_dtype, QB, TB, folds)
    nt = nt_ref[0, 0]
    denom = sums_ref[:] + maxint_ref[:] - acc
    jacc = acc / jnp.maximum(denom, 1e-9)
    tpos = tile * TB + 8 * (col % nb) + col // nb
    out_ref[:, :] = jnp.where(tpos < nt, jacc, -1.0).astype(out_ref.dtype)


def _accumulate_numerator(w_ref, rows_ref, uc, score_dtype, QB, TB, folds):
    """Numerator accumulation over the union axis; with ``folds`` > 1 the
    row matrix is ``folds`` stacked independent folded matrices and the
    result is the elementwise MIN of the per-fold numerators — each is a
    monotone upper bound of the exact IDF intersection, so their min is a
    tighter upper bound (count-min sketch; retention 0.978 → 0.991 at
    C=512/depth=128, scripts/lab_fold_recall.py)."""
    U = w_ref.shape[1]
    H = U // folds
    acc = jax.lax.fori_loop(
        0, H // uc, partial(_unpack_mm_chunk, w_ref, rows_ref, uc, score_dtype),
        jnp.zeros((QB, TB), jnp.float32),
    )
    for f in range(1, folds):
        a2 = jax.lax.fori_loop(
            0, H // uc,
            partial(_unpack_mm_chunk, w_ref, rows_ref, uc, score_dtype,
                    base=f * H),
            jnp.zeros((QB, TB), jnp.float32),
        )
        acc = jnp.minimum(acc, a2)
    return acc


def _score_kernel_v3(
    w_ref,        # (QB, U) score-dtype weights — FULL union, VMEM-resident
    rows_ref,     # (U, TB//8) u8 — this title-tile's packed rows
    sums_ref,     # (1, TB) f32 — π-permuted idf sums for this tile
    maxint_ref,   # (QB, 1) f32
    nt_ref,       # (1, 1) i32 in SMEM
    wmax_ref,     # (QB, TB//W) f32 — per-window max score
    warg_ref,     # (QB, TB//W) i32 — argmax offset o ∈ [0, W) within window
    *, score_dtype, uc, W, folds=1,
):
    """v2 scoring fused with windowed top-k PRE-selection.

    The (QB, TB) score tile never leaves VMEM: window w holds the strided
    columns {o·S + w : o < W} (S = TB//W lanes), so the reduction is W
    elementwise max/compare passes over contiguous (QB, S) slices — no
    reshapes, no gathers, VPU-only.  HBM select traffic drops from
    2·TB bytes/query/tile (bf16 write + read) to 8·TB/W — 4× at W=16 —
    and the downstream top-k scans a 16× narrower matrix."""
    QB = wmax_ref.shape[0]
    TB = rows_ref.shape[1] * 8
    S = TB // W
    nb = TB // 8
    tile = pl.program_id(0)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, TB), 1)

    acc = _accumulate_numerator(w_ref, rows_ref, uc, score_dtype, QB, TB, folds)
    nt = nt_ref[0, 0]
    denom = sums_ref[:] + maxint_ref[:] - acc
    jacc = acc / jnp.maximum(denom, 1e-9)
    tpos = tile * TB + 8 * (col % nb) + col // nb
    jacc = jnp.where(tpos < nt, jacc, -1.0)

    m = jacc[:, :S]
    for o in range(1, W):
        m = jnp.maximum(m, jacc[:, o * S : (o + 1) * S])
    off = jnp.zeros((QB, S), jnp.int32)
    for o in range(W - 1, 0, -1):                         # smallest o on ties
        off = jnp.where(jacc[:, o * S : (o + 1) * S] >= m, o, off)
    off = jnp.where(jacc[:, :S] >= m, 0, off)
    wmax_ref[:, :] = m
    warg_ref[:, :] = off


def select_topk_windowed(wmax, warg, k: int, tb: int, W: int,
                         recall_target: float):
    """Top-k over the windowed-max matrix, mapping back to title positions.

    ``wmax[q, g]`` is the max score of window g = tile·S + s over offsets
    o < W (column o·S + s of the π-permuted tile); ``warg`` holds the
    winning o.  Only the per-window runner-ups are lost vs the full matrix
    (E[top-k pairs sharing a window] ≈ k²/2 / n_windows — ~0.15 of 100 at
    500k titles; the bench oracle anchor gates the end-to-end effect)."""
    QB, nw = wmax.shape
    S = tb // W
    if recall_target < 1.0 and nw > 4 * k:
        mv, gidx = jax.lax.approx_max_k(wmax, k, recall_target=recall_target)
        gidx = gidx.astype(jnp.int32)
    else:
        merge = 32768 if nw % 32768 == 0 else (S if nw % S == 0 else nw)
        nblk = nw // merge
        v = wmax.reshape(QB, nblk, merge)
        vals, idx = jax.lax.top_k(v, min(k, merge))
        gidx = idx + (jnp.arange(nblk, dtype=jnp.int32) * merge)[None, :, None]
        flat_v = vals.reshape(QB, -1)
        flat_p = gidx.reshape(QB, -1)
        mv, sel = jax.lax.top_k(flat_v, k)
        gidx = jnp.take_along_axis(flat_p, sel, axis=1)
    off = jnp.take_along_axis(warg, gidx, axis=1)         # (QB, k)
    tile = gidx // S
    s = gidx % S
    gcol = tile * tb + off * S + s
    return mv, unpermute_positions(gcol, tb).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "tb", "uc", "score_dtype", "interpret",
                                   "recall_target", "window_select",
                                   "select_window", "folds"))
def jaccard_topk_pallas_v2(
    packed: jnp.ndarray,      # uint8[V, ntp//8]
    sums_perm: jnp.ndarray,   # float32[ntp] — π-permuted
    weights: jnp.ndarray,     # score-dtype[QB, U] dense weights
    maxint: jnp.ndarray,      # float32[QB]
    union_ids: jnp.ndarray,   # int32[U]
    nt: jnp.ndarray,          # int32 scalar
    *,
    k: int,
    tb: int = 2048,
    uc: int = 512,
    score_dtype: str = "bfloat16",
    interpret: bool = False,
    recall_target: float = 1.0,
    window_select: bool = False,
    select_window: int = 0,   # 0 → tb//128 (=16 at tb=2048)
    folds: int = 1,           # >1: rows = stacked folded matrices, score =
                              #   min of per-fold upper bounds (ops/fold.py)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused retrieval step (v2 tiling).  Returns (f32[QB, k], i32[QB, k])."""
    dtype = jnp.dtype(score_dtype)
    QB = weights.shape[0]
    if union_ids is None:
        # folded/coarse mode (ops/fold.py): ``packed`` IS the (U, ntp//8)
        # row matrix (permanently resident) — no gather at all
        rows = packed
        U = rows.shape[0]
    else:
        U = union_ids.shape[0]
        if packed.ndim == 3:
            rows = gather_rows_pallas(packed, union_ids, interpret=interpret)
        else:
            rows = packed[union_ids]                      # (U, ntp//8)
    # largest divisor of U (per fold half) that fits the requested chunk:
    # fewer fori steps amortize the per-chunk weight slice (uc=U measured
    # ~20% faster than uc=U/2 at U=2048) while bounding the VMEM live set
    assert U % folds == 0, (U, folds)
    uc = min(uc, U // folds)
    while (U // folds) % uc:
        uc -= 1
    ntp = rows.shape[1] * 8
    if ntp % tb:
        raise ValueError(f"padded title count {ntp} not divisible by tile {tb}")
    n_tiles = ntp // tb

    if window_select:
        # fused selection: the score tile never leaves VMEM; per title tile
        # only (wmax f32, warg i32) of width tb/W cross to HBM
        W = select_window or max(tb // 128, 1)
        S = tb // W
        wmax, warg = pl.pallas_call(
            partial(_score_kernel_v3, score_dtype=dtype, uc=uc, W=W,
                    folds=folds),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((QB, U), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((U, tb // 8), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((QB, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((QB, S), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((QB, S), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((QB, ntp // W), jnp.float32),
                jax.ShapeDtypeStruct((QB, ntp // W), jnp.int32),
            ],
            interpret=interpret,
        )(
            weights.astype(dtype),
            rows,
            sums_perm.reshape(1, ntp),
            maxint.reshape(QB, 1),
            nt.reshape(1, 1),
        )
        vals, pos = select_topk_windowed(wmax, warg, k, tb, W, recall_target)
        return vals.astype(jnp.float32), pos

    # bf16 scoring also writes bf16 scores: the (QB, ntp) matrix is the
    # top-k selector's input and the block's dominant HBM traffic; scores
    # are in [0, 1] and the cascade never consumes their low bits (the
    # bench oracle anchor gates end-to-end accuracy vs exact f32)
    out_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    jacc = pl.pallas_call(
        partial(_score_kernel_v2, score_dtype=dtype, uc=uc, folds=folds),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((QB, U), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U, tb // 8), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((QB, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (QB, tb), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((QB, ntp), out_dtype),
        interpret=interpret,
    )(
        weights.astype(dtype),
        rows,
        sums_perm.reshape(1, ntp),
        maxint.reshape(QB, 1),
        nt.reshape(1, 1),
    )
    vals, pos = select_topk_permuted(jacc, k, tb, recall_target)
    return vals.astype(jnp.float32), pos


def select_topk_permuted(jacc: jnp.ndarray, k: int, tb: int, recall_target: float):
    """Top-k over a π-permuted score matrix, un-permuting positions."""
    QB, ntp = jacc.shape
    if recall_target < 1.0:
        mv, gidx = jax.lax.approx_max_k(jacc, k, recall_target=recall_target)
        mp = unpermute_positions(gidx.astype(jnp.int32), tb)
        return mv, mp.astype(jnp.int32)
    merge_tb = 32768 if ntp % 32768 == 0 else tb
    nblk = ntp // merge_tb
    v = jacc.reshape(QB, nblk, merge_tb)
    vals, idx = jax.lax.top_k(v, k)
    gidx = idx + (jnp.arange(nblk, dtype=jnp.int32) * merge_tb)[None, :, None]
    tpos = unpermute_positions(gidx, tb)
    flat_v = vals.reshape(QB, nblk * k)
    flat_p = tpos.reshape(QB, nblk * k)
    mv, sel = jax.lax.top_k(flat_v, k)
    mp = jnp.take_along_axis(flat_p, sel, axis=1)
    return mv, mp.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "tb", "uc", "score_dtype", "interpret",
                                   "recall_target"))
def jaccard_topk_pallas(
    packed: jnp.ndarray,      # uint8[V, ntp//8]
    sums_perm: jnp.ndarray,   # float32[ntp] — π-permuted
    union_ids: jnp.ndarray,   # int32[U]
    w_pos: jnp.ndarray,       # int32[QB, LQ]
    w_val: jnp.ndarray,       # float32[QB, LQ]
    maxint: jnp.ndarray,      # float32[QB]
    nt: jnp.ndarray,          # int32 scalar
    *,
    k: int,
    tb: int = 2048,
    uc: int = 256,
    score_dtype: str = "bfloat16",
    interpret: bool = False,
    recall_target: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused retrieval step.  Returns (scores f32[QB, k], positions i32[QB, k])."""
    from doppelspeller_tpu.ops.jaccard import densify_weights

    dtype = jnp.dtype(score_dtype)
    U = union_ids.shape[0]
    QB = w_pos.shape[0]
    uc = min(uc, U)
    if U % uc:
        uc = U  # static fallback: one chunk (U is always qb·32, a power of 2)
    if packed.ndim == 3:  # (V, 32, NB/32) page layout (gatherable_view)
        rows = gather_rows_pallas(packed, union_ids, interpret=interpret)
    else:
        rows = packed[union_ids]                          # (U, ntp//8)
    ntp = rows.shape[1] * 8
    if ntp % tb:
        raise ValueError(f"padded title count {ntp} not divisible by tile {tb}")
    n_tiles = ntp // tb
    w = densify_weights(w_pos, w_val, U, dtype)

    n_uc = U // uc
    jacc = pl.pallas_call(
        partial(_score_kernel, score_dtype=dtype),
        grid=(n_tiles, n_uc),
        in_specs=[
            pl.BlockSpec((QB, uc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((uc, tb // 8), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((QB, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (QB, tb), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((QB, ntp), jnp.float32),
        interpret=interpret,
    )(
        w,
        rows,
        sums_perm.reshape(1, ntp),
        maxint.reshape(QB, 1),
        nt.reshape(1, 1),
    )

    if recall_target < 1.0:
        # TPU-optimized approximate top-k (~7x faster than exact at 500K)
        mv, gidx = jax.lax.approx_max_k(jacc, k, recall_target=recall_target)
        mp = unpermute_positions(gidx.astype(jnp.int32), tb)
        return mv, mp.astype(jnp.int32)

    # exact: blockwise top-k + merge (π un-permuted)
    merge_tb = 32768 if ntp % 32768 == 0 else tb
    nblk = ntp // merge_tb
    v = jacc.reshape(QB, nblk, merge_tb)
    vals, idx = jax.lax.top_k(v, k)                       # (QB, nblk, k)
    gidx = idx + (jnp.arange(nblk, dtype=jnp.int32) * merge_tb)[None, :, None]
    tpos = unpermute_positions(gidx, tb)
    flat_v = vals.reshape(QB, nblk * k)
    flat_p = tpos.reshape(QB, nblk * k)
    mv, sel = jax.lax.top_k(flat_v, k)
    mp = jnp.take_along_axis(flat_p, sel, axis=1)
    return mv, mp.astype(jnp.int32)
