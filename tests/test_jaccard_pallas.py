"""Pallas retrieval kernel parity vs the XLA path (interpret mode on CPU)."""

import random
import string

import numpy as np

import jax.numpy as jnp

from doppelspeller_tpu.config import Config
from doppelspeller_tpu.ops.jaccard import JaccardScorer, jaccard_topk_kernel
from doppelspeller_tpu.ops.jaccard_pallas import (
    jaccard_topk_pallas,
    permute_sums,
    unpermute_positions,
)
from doppelspeller_tpu.ops.ngram_index import build_truth_index, plan_query_blocks
from doppelspeller_tpu.utils.io import TitleSet


def _titles(n, rng):
    alphabet = string.ascii_lowercase + "  01"
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(5, 30))).strip() or "abc"
        for _ in range(n)
    ]


def test_permutation_roundtrip():
    tb = 128
    sums = np.arange(512, dtype=np.float32)
    perm = permute_sums(sums, tb)
    idx = np.arange(512)
    np.testing.assert_array_equal(perm[idx], sums[unpermute_positions(idx, tb)])


def test_pallas_topk_matches_xla():
    rng = random.Random(3)
    cfg = Config(data_path="/tmp/x", title_block=128, query_block=8,
                 score_dtype="float32")
    truth = TitleSet.from_titles(_titles(500, rng), config=cfg)
    queries = TitleSet.from_titles(_titles(17, rng) + [truth.transformed[9]], config=cfg)
    index = build_truth_index(truth, cfg)
    plans = plan_query_blocks(queries, index, cfg)
    k = 12
    tb = 128
    sums_perm = jnp.asarray(permute_sums(index.sums, tb))
    for plan in plans:
        v1, p1 = jaccard_topk_kernel(
            jnp.asarray(index.packed), jnp.asarray(index.sums),
            jnp.asarray(plan.union_ids), jnp.asarray(plan.w_pos),
            jnp.asarray(plan.w_val), jnp.asarray(plan.max_intersection),
            jnp.int32(index.num_titles),
            k=k, title_block=cfg.title_block, score_dtype="float32",
        )
        v2, p2 = jaccard_topk_pallas(
            jnp.asarray(index.packed), sums_perm,
            jnp.asarray(plan.union_ids), jnp.asarray(plan.w_pos),
            jnp.asarray(plan.w_val), jnp.asarray(plan.max_intersection),
            jnp.int32(index.num_titles),
            k=k, tb=tb, score_dtype="float32", interpret=True,
        )
        # the same entry point must accept the (V, 32, NB/32) page layout
        # (a pallas-relayouted or page-direct-built index) bit-identically
        packed3 = jnp.asarray(index.packed.reshape(index.packed.shape[0], 32, -1))
        v3, p3 = jaccard_topk_pallas(
            packed3, sums_perm,
            jnp.asarray(plan.union_ids), jnp.asarray(plan.w_pos),
            jnp.asarray(plan.w_val), jnp.asarray(plan.max_intersection),
            jnp.int32(index.num_titles),
            k=k, tb=tb, score_dtype="float32", interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(v3))
        np.testing.assert_array_equal(np.asarray(p2), np.asarray(p3))
        n = plan.n_valid
        np.testing.assert_allclose(np.asarray(v1)[:n], np.asarray(v2)[:n],
                                   rtol=1e-5, atol=1e-6)
        # positions equal wherever scores are untied
        v1n = np.asarray(v1)[:n]
        ties = np.zeros_like(v1n, dtype=bool)
        ties[:, 1:] |= v1n[:, 1:] == v1n[:, :-1]
        ties[:, :-1] |= ties[:, 1:]
        same = np.asarray(p1)[:n] == np.asarray(p2)[:n]
        assert (same | ties).all()


def test_pallas_v2_matches_xla():
    rng = random.Random(11)
    cfg = Config(data_path="/tmp/x", title_block=128, query_block=8,
                 score_dtype="float32")
    truth = TitleSet.from_titles(_titles(640, rng), config=cfg)
    queries = TitleSet.from_titles(_titles(15, rng) + [truth.transformed[3]], config=cfg)
    index = build_truth_index(truth, cfg)
    plans = plan_query_blocks(queries, index, cfg)
    k = 12
    tb = 128
    from doppelspeller_tpu.ops.jaccard import densify_weights
    from doppelspeller_tpu.ops.jaccard_pallas import jaccard_topk_pallas_v2

    sums_perm = jnp.asarray(permute_sums(index.sums, tb))
    for plan in plans:
        v1, p1 = jaccard_topk_kernel(
            jnp.asarray(index.packed), jnp.asarray(index.sums),
            jnp.asarray(plan.union_ids), jnp.asarray(plan.w_pos),
            jnp.asarray(plan.w_val), jnp.asarray(plan.max_intersection),
            jnp.int32(index.num_titles),
            k=k, title_block=cfg.title_block, score_dtype="float32",
        )
        w = densify_weights(
            jnp.asarray(plan.w_pos), jnp.asarray(plan.w_val),
            plan.union_ids.shape[0], jnp.float32,
        )
        v2, p2 = jaccard_topk_pallas_v2(
            jnp.asarray(index.packed), sums_perm,
            w, jnp.asarray(plan.max_intersection),
            jnp.asarray(plan.union_ids), jnp.int32(index.num_titles),
            k=k, tb=tb, uc=64, score_dtype="float32", interpret=True,
        )
        n = plan.n_valid
        np.testing.assert_allclose(np.asarray(v1)[:n], np.asarray(v2)[:n],
                                   rtol=1e-5, atol=1e-6)


def test_multiblock_matches_per_block():
    """The grouped scan dispatch (on-device weight reconstruction) must equal
    the per-block kernel with host-computed weights."""
    rng = random.Random(13)
    cfg = Config(data_path="/tmp/x", title_block=128, query_block=8,
                 score_dtype="float32", retrieval_impl="xla", dispatch_blocks=3)
    truth = TitleSet.from_titles(_titles(500, rng), config=cfg)
    # enough queries for several blocks incl. a padded tail group
    queries = TitleSet.from_titles(_titles(61, rng) + [truth.transformed[7]], config=cfg)
    index = build_truth_index(truth, cfg)

    scorer = JaccardScorer(index, cfg)
    s_new, p_new = scorer.topk(queries, k=10)

    # per-block reference path
    plans = plan_query_blocks(queries, index, cfg)
    s_ref = np.zeros_like(s_new)
    p_ref = np.zeros_like(p_new)
    for plan in plans:
        v, p = jaccard_topk_kernel(
            jnp.asarray(index.packed), jnp.asarray(index.sums),
            jnp.asarray(plan.union_ids), jnp.asarray(plan.w_pos),
            jnp.asarray(plan.w_val), jnp.asarray(plan.max_intersection),
            jnp.int32(index.num_titles),
            k=10, title_block=cfg.title_block, score_dtype="float32",
        )
        s_ref[plan.query_rows] = np.asarray(v)[: plan.n_valid]
        p_ref[plan.query_rows] = np.asarray(p)[: plan.n_valid]
    np.testing.assert_allclose(s_new, s_ref, rtol=1e-5, atol=1e-6)


def test_scorer_uses_pallas_impl():
    rng = random.Random(5)
    cfg = Config(data_path="/tmp/x", title_block=128, query_block=8,
                 score_dtype="float32", retrieval_impl="pallas_interpret")
    truth = TitleSet.from_titles(_titles(300, rng), config=cfg)
    queries = TitleSet.from_titles(_titles(9, rng), config=cfg)
    index = build_truth_index(truth, cfg)
    scorer_p = JaccardScorer(index, cfg)
    scorer_x = JaccardScorer(index, cfg.with_(retrieval_impl="xla"))
    s1, _ = scorer_p.topk(queries, k=10)
    s2, _ = scorer_x.topk(queries, k=10)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)


def test_gatherable_view_roundtrip_and_fallback():
    """The 3D tile-page layout (one contiguous (32, NB/32) page per trigram
    row — the DMA gather kernel's resident format) must reproduce exactly
    the 2D row gather through every fallback branch of gather_rows_pallas
    (interpret mode, unaligned W, U not a multiple of the DMA chunk)."""
    import jax.numpy as jnp

    from doppelspeller_tpu.ops.jaccard_pallas import (
        gather_rows_pallas,
        gatherable_view,
    )

    rng = np.random.RandomState(3)
    V, NB = 257, 1024                      # W = NB/32 = 32 (not lane-aligned)
    packed = rng.randint(0, 256, (V, NB), dtype=np.uint8)
    p3 = gatherable_view(packed)
    assert p3.shape == (V, 32, NB // 32)
    # the view is a pure reshape: page i flattens back to row i
    assert np.array_equal(p3[5].reshape(-1), packed[5])

    for U in (16, 48, 33):                 # aligned, aligned, chunk-ragged
        ids = rng.randint(0, V, U).astype(np.int32)
        out = np.asarray(
            gather_rows_pallas(jnp.asarray(p3), jnp.asarray(ids),
                               interpret=True)
        )
        assert out.shape == (U, NB)
        assert np.array_equal(out, packed[ids])


def test_window_select_matches_full():
    """The fused windowed pre-selection (retrieval_window_select) must agree
    with the full-matrix path: identical top-k SCORES, and identical
    positions wherever the top-1 is strictly separated (per-window
    runner-ups are the only legitimate loss, impossible for a strict max)."""
    rng = random.Random(11)
    # title_block 2048 → ntp 2048 → pallas tile tb=2048 → W=16 real windows
    cfg = Config(data_path="/tmp/x", title_block=2048, query_block=8,
                 score_dtype="float32", retrieval_impl="pallas_interpret",
                 topk_recall_target=1.0)
    truth = TitleSet.from_titles(_titles(500, rng), config=cfg)
    queries = TitleSet.from_titles(
        _titles(15, rng) + [truth.transformed[7]], config=cfg)
    index = build_truth_index(truth, cfg)
    full = JaccardScorer(index, cfg)
    win = JaccardScorer(index, cfg.with_(retrieval_window_select=True))
    s1, p1 = full.topk(queries, k=5)
    s2, p2 = win.topk(queries, k=5)
    # top-1 must be identical (a strict per-query max survives windowing)
    np.testing.assert_allclose(s1[:, 0], s2[:, 0], rtol=1e-6, atol=1e-7)
    clear = s1[:, 0] > s1[:, 1] + 1e-6
    assert clear.any()
    np.testing.assert_array_equal(p1[clear, 0], p2[clear, 0])
    # deeper ranks may drop same-window runner-ups, never gain new scores
    assert (s2 <= s1 + 1e-6).all()
