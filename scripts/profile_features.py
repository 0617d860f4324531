"""Attribute rerank-feature time: window DP vs reconstruction vs LCS vs forest.

Usage: python scripts/profile_features.py [B] [TL] [WL]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 12800
TL = int(sys.argv[2]) if len(sys.argv) > 2 else 64
WL = int(sys.argv[3]) if len(sys.argv) > 3 else 16

import jax
import jax.numpy as jnp

from doppelspeller_tpu.ops.features import (
    _features_kernel, split_words_host, remove_spaces_host, gather_word_chars,
)
from doppelspeller_tpu.ops.levenshtein import lcs_kernel
from doppelspeller_tpu.config import SPACE_CODE

W = 15
rs = np.random.RandomState(0)


def rand_title(n_words, wmin=4, wmax=10):
    parts = []
    for _ in range(n_words):
        L = rs.randint(wmin, wmax + 1)
        parts.append(rs.randint(2, 38, L))
    enc = []
    for i, p in enumerate(parts):
        if i:
            enc.append(np.array([SPACE_CODE]))
        enc.append(p)
    enc = np.concatenate(enc)[:TL]
    out = np.zeros(TL, np.uint8)
    out[: len(enc)] = enc
    return out, len(enc)


qs, ts = [], []
for _ in range(B):
    qs.append(rand_title(rs.randint(1, 4)))
    ts.append(rand_title(rs.randint(1, 4)))
q_enc = np.stack([x[0] for x in qs]); q_len = np.array([x[1] for x in qs], np.int32)
t_enc = np.stack([x[0] for x in ts]); t_len = np.array([x[1] for x in ts], np.int32)
start, wlen, n_words = split_words_host(t_enc, t_len)
wchars = gather_word_chars(t_enc, start, wlen, WL)
q_wo, q_wo_len = remove_spaces_host(q_enc, q_len)
counts = rs.randint(1, 1000, (B, W)).astype(np.float32)

d = lambda x: jnp.asarray(x)
args = dict(
    q_enc=d(q_enc), q_len=d(q_len), t_enc=d(t_enc), t_len=d(np.maximum(t_len, 1)),
    word_chars=d(wchars), word_len=d(wlen), n_words_t=d(np.maximum(n_words, 1)),
    q_wo=d(q_wo), q_wo_len=d(np.maximum(q_wo_len, 1)), word_counts=d(counts),
    n_truth=jnp.float32(500000.0),
)


def sync(x):
    for leaf in jax.tree.leaves(x):
        np.asarray(leaf)


def bench(name, fn, *a, reps=8, **kw):
    jfn = jax.jit(fn) if not hasattr(fn, "lower") else fn
    t0 = time.time(); sync(jfn(*a, **kw)); tc = time.time() - t0
    t0 = time.time()
    pend = [jfn(*a, **kw) for _ in range(reps)]
    sync(pend)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1000:.1f} ms ({B/dt/1000:.0f}k pairs/s; compile {tc:.0f}s)")
    return dt


# 1. full kernel (pallas window)
bench("full features (pallas win)", partial(_features_kernel, window_impl="pallas"),
      *args.values())

# 2. window DP only
from doppelspeller_tpu.ops.features_pallas import window_best_pallas
bench("window DP pallas", partial(window_best_pallas, interpret=False),
      args["word_chars"], args["word_len"], args["q_wo"], args["q_wo_len"])

# 3. lcs kernel only (two calls in the features kernel)
bench("lcs kernel", lcs_kernel, args["q_enc"], args["q_len"],
      args["t_enc"], args["t_len"])


# 4. reconstruction only (isolated from the kernel body)
def recon_only(word_chars, word_len, q_wo, q_wo_len, best_ratio, best_p, t_enc, t_len):
    B_, W_, WL_ = word_chars.shape
    TL_ = q_wo.shape[1]
    valid_word = word_len > 0
    matched = best_ratio > 0.0
    best_win_len = jnp.clip(jnp.minimum(word_len, q_wo_len[:, None] - best_p), 0)
    rec_len = jnp.where(matched, best_win_len, 1) * valid_word
    seg = rec_len + valid_word.astype(jnp.int32)
    offsets = jnp.cumsum(seg, axis=1) - seg
    jw = jax.lax.broadcasted_iota(jnp.int32, (B_, W_, WL_ + 1), 2)
    src_idx = jnp.minimum(best_p[:, :, None] + jw, TL_ - 1)
    src = jnp.take_along_axis(
        q_wo, src_idx.reshape(B_, W_ * (WL_ + 1)), axis=1
    ).reshape(B_, W_, WL_ + 1)
    chars = jnp.where(matched[:, :, None], src, jnp.uint8(SPACE_CODE))
    chars = jnp.where(jw == rec_len[:, :, None], jnp.uint8(SPACE_CODE), chars)
    write = (jw <= rec_len[:, :, None]) & valid_word[:, :, None]
    dest = jnp.where(write, offsets[:, :, None] + jw, TL_)
    p_cols = jnp.arange(TL_, dtype=jnp.int32)
    hit = dest[:, :, :, None] == p_cols
    recon = ((chars[:, :, :, None].astype(jnp.int32) * hit).sum(axis=(1, 2))).astype(jnp.uint8)
    recon_len = jnp.maximum(seg.sum(axis=1) - 1, 0)
    lcs = lcs_kernel(recon, recon_len, t_enc, t_len)
    return lcs


br = jnp.zeros((B, W), jnp.float32) + 50.0
bp = jnp.zeros((B, W), jnp.int32)
bench("reconstruction+lcs", recon_only, args["word_chars"], args["word_len"],
      args["q_wo"], args["q_wo_len"], br, bp, args["t_enc"], args["t_len"])


# 5. forest inference only
from doppelspeller_tpu.models.gbt import predict_forest_margin
n_trees, depth = 60, 5
n_heap = 2 ** (depth + 1) - 1
m_feat = jnp.asarray(rs.randint(0, 66, (n_trees, n_heap)).astype(np.int32))
m_thr = jnp.asarray(rs.rand(n_trees, n_heap).astype(np.float32) * 100)
m_ml = jnp.asarray(rs.randint(0, 2, (n_trees, n_heap)).astype(np.bool_))
m_val = jnp.asarray(rs.randn(n_trees, n_heap).astype(np.float32) * 0.1)
m_leaf = jnp.asarray(np.zeros((n_trees, n_heap), np.bool_))
X = jnp.asarray(rs.rand(B, 66).astype(np.float32) * 100)
bench("forest margin", partial(predict_forest_margin, depth=depth, base_margin=0.0),
      X, m_feat, m_thr, m_ml, m_val, m_leaf)
