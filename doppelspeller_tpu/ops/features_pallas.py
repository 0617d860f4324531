"""Pallas TPU kernel for the sliding-window word-match DP (bit-parallel).

The hot loop of the 66-dim feature computation (reference
feature_engineering.py:125-155): for every (pair, truth-word, window
position), the LCS of the word against the window of the spaceless query
starting at that position.

Algorithm: Crochemore–Iliopoulos–Pinzón bit-parallel LCS.  The DP column for
a word (≤ 32 chars) is packed into the bits of one uint32 lane:

    V ← all-ones;  per text char c:  U = V & Match[c];  V = (V + U) | (V − U)
    LCS = |word| − popcount(V)

All window positions share one pass over the spaceless query: window p
consumes exactly the chars a ∈ [p, p+|word|) of the global char stream, so a
per-step activity mask (p ≤ a < p+|word|) turns the single stream into every
window's private update sequence.  One VPU lane therefore carries a whole
(pair, word, position) DP — ~40× fewer element-ops than the dense cummax
formulation, with VMEM state of just (P, lanes) uint32.

Match masks are precomputed in XLA: M_full[a, (b, w)] = bitmask of word-char
positions equal to q_wo[b, a] (zeroed past q_wo_len).

Layout: sublanes = window position p ∈ [0, P=TL); lanes = w·b_tile + b
(w-major per pair tile, W padded to 16 so lane counts are 128-multiples).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W_PAD = 16   # lane-friendly word-slot count (15 real slots + 1 dummy)
WL_MAX = 32  # bit-parallel word-length capacity (uint32 lanes)


def _kernel(mfull_ref, wmask_ref, wlen_ref, qwol_ref, ratio_ref, pos_ref, *, P):
    """One pair tile.  L = W_PAD·b_tile lanes.
    mfull (P, L) u32 — per text position a: match mask of q_wo[b, a] vs word
    wmask (1, L) u32 — (1 << word_len) − 1
    wlen  (1, L) i32, qwol (1, L) i32
    out: ratio (1, L) f32 (−1 ⇒ no valid window), pos (1, L) i32
    """
    L = mfull_ref.shape[1]
    wmask = wmask_ref[:]
    wlen = wlen_ref[:]
    qwol = qwol_ref[:]
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)

    V = jnp.broadcast_to(wmask, (P, L))
    for a0 in range(0, P, 8):
        m_grp = mfull_ref[a0 : a0 + 8, :]                # aligned (8, L) load
        for da in range(8):
            a = a0 + da
            m_row = m_grp[da : da + 1, :]                # (1, L)
            act = (p_iota <= a) & ((a - p_iota) < wlen)  # (P, L)
            M = jnp.where(act, m_row, jnp.uint32(0))
            U = V & M
            V = ((V + U) | (V - U)) & wmask

    ones = jax.lax.population_count(V).astype(jnp.int32)  # (P, L)
    lcs = (wlen - ones).astype(jnp.float32)
    win_len = jnp.minimum(wlen, qwol - p_iota)
    total = (wlen + win_len).astype(jnp.float32)
    ratio = jnp.floor(200.0 * lcs / jnp.maximum(total, 1.0))
    valid = (p_iota < qwol) & (wlen > 0)
    ratio = jnp.where(valid, ratio, -1.0)

    ratio_ref[0, :] = jnp.max(ratio, axis=0)
    pos_ref[0, :] = jnp.argmax(ratio, axis=0).astype(jnp.int32)


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

    # pair tile: V/M temporaries are (P, W_PAD·bt) u32 — keep ≈ ≤ 1 MB each
    b_tile = (1 << 20) // (P * 4 * W_PAD)
    b_tile = max((b_tile // 8) * 8, 8)
    b_tile = min(b_tile, 256)
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

    # ---- XLA-side match-mask precompute ----
    # M[b, a, w] = Σ_i (word_chars[b, w, i] == q_wo[b, a]) << i, 0 past q_wo_len
    qw = q_wo[:, :, None]                                # (Bp, TL, 1)
    M = jnp.zeros((Bp, TL, W_PAD), jnp.uint32)
    for i in range(WL):
        eq = (word_chars[:, None, :, i] == qw).astype(jnp.uint32)
        M = M | (eq << np.uint32(i))
    pos_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (Bp, TL, 1), 1) < q_wo_len[:, None, None]
    )
    M = jnp.where(pos_ok, M, jnp.uint32(0))

    # per-tile w-major lanes: lane = tile·L + w·b_tile + b
    def to_lanes(x):
        # x: (Bp, W_PAD) → (1, n_tiles·L)
        return (
            x.reshape(n_tiles, b_tile, W_PAD)
            .transpose(0, 2, 1)
            .reshape(1, n_tiles * L)
        )

    mfull = (
        M.reshape(n_tiles, b_tile, TL, W_PAD)
        .transpose(2, 0, 3, 1)                           # (TL, tiles, W, bt)
        .reshape(TL, n_tiles * L)
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
        partial(_kernel, P=P),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TL, L), lambda i: (0, i), memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(mfull, wmask_flat, wlen_flat, qwol_flat)

    def unflatten(x, dtype):
        return (
            x.reshape(n_tiles, W_PAD, b_tile)
            .transpose(0, 2, 1)
            .reshape(Bp, W_PAD)[:B, :W]
            .astype(dtype)
        )

    return unflatten(ratio, jnp.float32), unflatten(pos, jnp.int32)
