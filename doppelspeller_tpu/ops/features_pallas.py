"""Pallas TPU kernel for the sliding-window word-match DP (bit-parallel).

The hot loop of the 66-dim feature computation (reference
feature_engineering.py:125-155): for every (pair, truth-word, window
position), the LCS of the word against the window of the spaceless query
starting at that position.

Algorithm: Crochemore–Iliopoulos–Pinzón bit-parallel LCS.  The DP column for
a word (≤ 32 chars) is packed into the bits of one uint32 lane:

    V ← all-ones;  per text char c:  U = V & Match[c];  V = (V + U) | (V − U)
    LCS = |word| − popcount(V)

Two structural optimizations over the naive formulation:

* **In-kernel match masks.**  M[a, lane] (bitmask of word positions equal to
  q_wo[a]) is built in VMEM from uint8 lane layouts with WL compare/or
  passes.  Building it in XLA (the v1 design) materialized a (B, TL, W)
  uint32 tensor through WL strided passes — ~33 ms per 12.8k-pair chunk,
  25× the cost of the DP itself.
* **Banded updates.**  Window position p only consumes text chars
  a ∈ [p, p+wlen), so a sublane group of 8 positions needs 8+WL−1 text
  steps, not all P: the group loop runs under fori_loop on (8, L) registers.

Layout: sublanes = window position p ∈ [0, P=TL); lanes = w·b_tile + b
(w-major per pair tile, W padded to 16 so lane counts are 128-multiples).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W_PAD = 16   # lane-friendly word-slot count (15 real slots + 1 dummy)
WL_MAX = 32  # bit-parallel word-length capacity (uint32 lanes)


def _band(WL: int) -> int:
    """Band height: 8 positions need text rows [p0, p0+8+WL−1), rounded up
    to a sublane multiple for aligned dynamic slices."""
    return ((8 + WL - 1 + 7) // 8) * 8


def _rows_pad(P: int, WL: int) -> int:
    """uint8 q_lanes rows: P + band overhang, padded to the u8 sublane tile."""
    return ((P + _band(WL) + 31) // 32) * 32


def _kernel(q_lanes_ref, wc_ref, wmask_ref, wlen_ref, qwol_ref,
            ratio_ref, pos_ref, m_ref, *, P, WL):
    """One pair tile.  L = W_PAD·b_tile lanes.
    q_lanes (rows_pad, L) u8 — q_wo char of the lane's pair at text pos a
    wc      (32, L) u8      — word char i of the lane's word (0 past wlen)
    wmask   (1, L) u32      — (1 << word_len) − 1
    wlen    (1, L) i32, qwol (1, L) i32
    out: ratio (1, L) f32 (−1 ⇒ no valid window), pos (1, L) i32
    m_ref: VMEM scratch (rows_pad, L) u32 — per-text-pos match masks
    """
    L = q_lanes_ref.shape[1]
    ROWS = q_lanes_ref.shape[0]
    BAND = _band(WL)
    wmask = wmask_ref[:]
    wlen = wlen_ref[:]
    qwol = qwol_ref[:]

    # ---- match masks in VMEM: M[a] = Σ_i (wc[i] == q_lanes[a]) << i ----
    # (all operands broadcast to the full (ROWS, L) shape first — mixing
    # replicated (1, L)/(ROWS, 1) i1 vectors into & trips a Mosaic relayout)
    # int32 throughout — u8 compares at this width trip Mosaic relayouts
    q = q_lanes_ref[:].astype(jnp.int32)                  # (ROWS, L)
    a_full = jax.lax.broadcasted_iota(jnp.int32, (ROWS, L), 0)
    qwol_b = jnp.broadcast_to(qwol, (ROWS, L))
    # pad chars (0) never match: q > 0 implies wc[i] > 0 on a hit
    full = jnp.uint32(0xFFFFFFFF)
    va = (jnp.where(a_full < qwol_b, full, jnp.uint32(0))
          & jnp.where(q > 0, full, jnp.uint32(0)))
    M = jnp.zeros((ROWS, L), jnp.uint32)
    for i in range(WL):
        wcib = jnp.broadcast_to(
            wc_ref[i : i + 1, :].astype(jnp.int32), (ROWS, L)
        )
        eq = jnp.where(q == wcib, jnp.uint32(1 << i), jnp.uint32(0))
        M = M | (eq & va)
    m_ref[:, :] = M

    # ---- banded DP over position groups ----
    p8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)   # row within group

    def group(pg, carry):
        best_r, best_p = carry
        p0 = pg * 8
        band = m_ref[pl.ds(p0, BAND), :]                  # (BAND, L) u32
        V = jnp.broadcast_to(wmask, (8, L))
        for a_rel in range(8 + WL - 1):
            m_row = band[a_rel : a_rel + 1, :]            # (1, L)
            act = (p8 <= a_rel) & ((a_rel - p8) < wlen)   # (8, L)
            Mm = jnp.where(act, m_row, jnp.uint32(0))
            U = V & Mm
            V = ((V + U) | (V - U)) & wmask

        ones = jax.lax.population_count(V).astype(jnp.int32)   # (8, L)
        lcs = (wlen - ones).astype(jnp.float32)
        p_abs = p0 + p8
        win_len = jnp.minimum(wlen, qwol - p_abs)
        total = (wlen + win_len).astype(jnp.float32)
        ratio = jnp.floor(200.0 * lcs / jnp.maximum(total, 1.0))
        valid = (p_abs < qwol) & (wlen > 0)
        ratio = jnp.where(valid, ratio, -1.0)

        r_g = jnp.max(ratio, axis=0, keepdims=True)            # (1, L)
        # first-occurrence argmax by hand (Mosaic argmax breaks ties high)
        p_g = jnp.min(
            jnp.where(ratio == jnp.broadcast_to(r_g, (8, L)),
                      jnp.broadcast_to(p_abs, (8, L)), jnp.int32(1 << 20)),
            axis=0, keepdims=True,
        )
        # strict > keeps the FIRST position achieving the max (groups run
        # in ascending p, matching jnp.argmax semantics on the full axis)
        upd = r_g > best_r
        return (jnp.where(upd, r_g, best_r), jnp.where(upd, p_g, best_p))

    best_r = jnp.full((1, L), -jnp.inf, jnp.float32)
    best_p = jnp.zeros((1, L), jnp.int32)
    best_r, best_p = jax.lax.fori_loop(0, P // 8, group, (best_r, best_p))
    ratio_ref[0, :] = best_r[0]
    pos_ref[0, :] = best_p[0]


def window_best_pallas(
    word_chars: jnp.ndarray,   # uint8[B, W, WL], WL ≤ 32
    word_len: jnp.ndarray,     # int32[B, W]
    q_wo: jnp.ndarray,         # uint8[B, TL]
    q_wo_len: jnp.ndarray,     # int32[B]
    *,
    interpret: bool = False,
):
    """Returns (best_ratio float32[B, W] (−1 ⇒ no valid window/word),
    best_p int32[B, W]) — drop-in for the XLA scan path in _features_kernel."""
    B, W, WL = word_chars.shape
    TL = q_wo.shape[1]
    P = TL
    if WL > WL_MAX:
        raise ValueError(f"bit-parallel kernel supports word length ≤ {WL_MAX}")
    assert W <= W_PAD and P % 8 == 0
    ROWS = _rows_pad(P, WL)

    # pair tile: the mask build keeps ~10 (ROWS, L) i32-wide values live in
    # VMEM (q/va/eq/M + double-buffered input blocks) — budget ≈ 12 MB
    b_tile = (12 << 20) // (ROWS * 4 * 10) // W_PAD
    b_tile = max((b_tile // 8) * 8, 8)
    b_tile = min(b_tile, 512)
    Bp = ((B + b_tile - 1) // b_tile) * b_tile
    n_tiles = Bp // b_tile
    L = W_PAD * b_tile

    pad_b = Bp - B
    if pad_b:
        word_chars = jnp.concatenate(
            [word_chars, jnp.zeros((pad_b, W, WL), word_chars.dtype)], axis=0
        )
        word_len = jnp.concatenate(
            [word_len, jnp.zeros((pad_b, W), word_len.dtype)], axis=0
        )
        q_wo = jnp.concatenate([q_wo, jnp.zeros((pad_b, TL), q_wo.dtype)], axis=0)
        q_wo_len = jnp.concatenate(
            [q_wo_len, jnp.ones(pad_b, q_wo_len.dtype)], axis=0
        )
    if W < W_PAD:
        word_chars = jnp.concatenate(
            [word_chars, jnp.zeros((Bp, W_PAD - W, WL), word_chars.dtype)], axis=1
        )
        word_len = jnp.concatenate(
            [word_len, jnp.zeros((Bp, W_PAD - W), word_len.dtype)], axis=1
        )

    # ---- uint8 lane layouts (cheap transposes; masks built in-kernel) ----
    # q_lanes[a, lane=(tile, w, b)] = q_wo[b, a] — broadcast over w
    q_pad = jnp.concatenate(
        [q_wo, jnp.zeros((Bp, ROWS - TL), q_wo.dtype)], axis=1
    )                                                     # (Bp, ROWS)
    q_lanes = jnp.broadcast_to(
        q_pad.reshape(n_tiles, b_tile, ROWS)[:, None, :, :],
        (n_tiles, W_PAD, b_tile, ROWS),
    ).transpose(3, 0, 1, 2).reshape(ROWS, n_tiles * L)

    # wc[i, lane] = word_chars[b, w, i], zero-padded to 32 rows
    wc = jnp.concatenate(
        [word_chars, jnp.zeros((Bp, W_PAD, 32 - WL), word_chars.dtype)], axis=2
    )
    wc_lanes = (
        wc.reshape(n_tiles, b_tile, W_PAD, 32)
        .transpose(3, 0, 2, 1)
        .reshape(32, n_tiles * L)
    )

    def to_lanes(x):
        # x: (Bp, W_PAD) → (1, n_tiles·L)
        return (
            x.reshape(n_tiles, b_tile, W_PAD)
            .transpose(0, 2, 1)
            .reshape(1, n_tiles * L)
        )

    wlen32 = jnp.minimum(word_len.astype(jnp.int32), WL_MAX)
    shift = jnp.minimum(wlen32, 31).astype(jnp.uint32)
    wmask = jnp.where(
        wlen32 >= 32,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << shift) - jnp.uint32(1),
    )
    wmask_flat = to_lanes(wmask).astype(jnp.uint32)
    wlen_flat = to_lanes(wlen32).astype(jnp.int32)
    qwol_flat = jnp.broadcast_to(
        q_wo_len.astype(jnp.int32).reshape(n_tiles, 1, b_tile),
        (n_tiles, W_PAD, b_tile),
    ).reshape(1, n_tiles * L)

    ratio, pos = pl.pallas_call(
        partial(_kernel, P=P, WL=WL),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ROWS, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_tiles * L), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * L), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((ROWS, L), jnp.uint32)],
        interpret=interpret,
    )(q_lanes, wc_lanes, wmask_flat, wlen_flat, qwol_flat)

    def unflatten(x, dtype):
        return (
            x.reshape(n_tiles, W_PAD, b_tile)
            .transpose(0, 2, 1)
            .reshape(Bp, W_PAD)[:B, :W]
            .astype(dtype)
        )

    return unflatten(ratio, jnp.float32), unflatten(pos, jnp.int32)
