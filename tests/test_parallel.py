"""Multi-device tests on the virtual 8-CPU mesh: sharded results must equal
single-device results exactly."""

import random
import string

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from doppelspeller_tpu.config import Config
from doppelspeller_tpu.models.gbt import (
    bin_features,
    build_tree_kernel,
    compute_bin_edges,
    margin_grad_hess,
    predict_tree_binned,
)
from doppelspeller_tpu.ops.jaccard import JaccardScorer
from doppelspeller_tpu.ops.ngram_index import build_truth_index
from doppelspeller_tpu.parallel.sharded import (
    ShardedJaccardScorer,
    dp_boost_round,
    make_mesh,
)
from doppelspeller_tpu.utils.io import TitleSet


def _titles(n, rng):
    alphabet = string.ascii_lowercase + "  01"
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(5, 30))).strip() or "abc"
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def world():
    rng = random.Random(9)
    cfg = Config(data_path="/tmp/x", title_block=128, query_block=8, score_dtype="float32")
    truth = TitleSet.from_titles(_titles(600, rng), config=cfg)
    queries = TitleSet.from_titles(_titles(33, rng) + [truth.transformed[4]], config=cfg)
    index = build_truth_index(truth, cfg)
    return cfg, truth, queries, index


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_topk_matches_single_device(world):
    cfg, truth, queries, index = world
    mesh = make_mesh(4)
    single = JaccardScorer(index, cfg)
    sharded = ShardedJaccardScorer(index, mesh, cfg)
    s1, p1 = single.topk(queries, k=15)
    s2, p2 = sharded.topk(queries, k=15)
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-7)
    # positions may differ only under exact score ties
    ties = s1 != s2
    np.testing.assert_array_equal(p1[~ties], p2[~ties])


def test_sharded_topk_8_devices(world):
    cfg, truth, queries, index = world
    mesh = make_mesh(8)
    sharded = ShardedJaccardScorer(index, mesh, cfg)
    single = JaccardScorer(index, cfg)
    s1, _ = single.topk(queries, k=7)
    s2, _ = sharded.topk(queries, k=7)
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-7)


def test_dp_boost_round_matches_single(world):
    rng = np.random.RandomState(0)
    N, F = 1024, 12
    X = rng.randn(N, F).astype(np.float32)
    y = (X[:, 0] - X[:, 3] > 0).astype(np.float32)
    edges = compute_bin_edges(X)
    bins = bin_features(X, edges)

    # single-device round
    m0 = jnp.zeros(N, jnp.float32)
    g, h = margin_grad_hess(m0, jnp.asarray(y), 5.0)
    tree_s = build_tree_kernel(
        jnp.asarray(bins), g, h, depth=4, n_features=F,
        lambda_=1.0, min_child_weight=1.0,
    )
    m_s = m0 + predict_tree_binned(jnp.asarray(bins), *tree_s, depth=4) * 1.0

    # data-parallel round over 8 shards
    mesh = make_mesh(8, axis="data")
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    bins_d = jax.device_put(jnp.asarray(bins), sh)
    y_d = jax.device_put(jnp.asarray(y), sh)
    m_d = jax.device_put(m0, sh)
    m_new, tree_p = dp_boost_round(
        mesh, bins_d, y_d, m_d, depth=4, eta=1.0, beta=5.0,
    )
    for a, b in zip(tree_s, tree_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_new), rtol=1e-5)
