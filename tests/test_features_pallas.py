"""Pallas windows-DP kernel parity vs the XLA scan path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from doppelspeller_tpu.config import Config
from doppelspeller_tpu.ops.features import (
    _window_best_xla,
    gather_word_chars,
    remove_spaces_host,
    split_words_host,
)
from doppelspeller_tpu.ops.features_pallas import window_best_pallas
from doppelspeller_tpu.utils import text as T


def _prep(pairs, TL, WL):
    cfg = Config(data_path="/tmp/x")
    q = [p[0] for p in pairs]
    t = [p[1] for p in pairs]
    q_enc = T.encode_titles(q, cfg.max_characters)
    t_enc = T.encode_titles(t, cfg.max_characters)
    q_len = np.array([len(s) for s in q], np.int32)
    t_len = np.array([len(s) for s in t], np.int32)
    start, wlen, _ = split_words_host(t_enc, t_len)
    q_wo, q_wo_len = remove_spaces_host(q_enc, q_len)
    wchars = gather_word_chars(t_enc, start, wlen, WL)
    return (
        jnp.asarray(wchars),
        jnp.asarray(wlen),
        jnp.asarray(q_wo[:, :TL]),
        jnp.asarray(np.maximum(q_wo_len, 1)),
    )


PAIRS = [
    ("coolblue bv", "coolblue bv"),
    ("coolbluebv", "coolblue bv"),
    ("internationalhouse newcastle", "international house newcastle"),
    ("heyside crick et club", "heyside cricket club"),
    ("zzz qqq", "coolblue bv"),
    ("abc", "abc holdings 42"),
    ("a b c d e f g", "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"),
]


@pytest.mark.parametrize("TL,WL", [(32, 8), (32, 16), (64, 16)])
def test_pallas_matches_xla(TL, WL):
    pairs = [
        (T.transform_title(a)[:TL], T.transform_title(b)[:TL]) for a, b in PAIRS
    ]
    wchars, wlen, q_wo, q_wo_len = _prep(pairs, TL, WL)
    if int(wlen.max()) > WL:
        wlen = jnp.minimum(wlen, WL)  # keep the bucket honest
    r_x, p_x = _window_best_xla(wchars, wlen, q_wo, q_wo_len)
    r_p, p_p = window_best_pallas(wchars, wlen, q_wo, q_wo_len, interpret=True)
    np.testing.assert_array_equal(np.asarray(r_x), np.asarray(r_p))
    np.testing.assert_array_equal(np.asarray(p_x), np.asarray(p_p))


def test_pallas_matches_xla_random():
    rng = np.random.RandomState(5)
    B, TL, WL = 23, 32, 8
    q_wo = rng.randint(2, 38, (B, TL)).astype(np.uint8)
    q_wo_len = rng.randint(3, TL + 1, B).astype(np.int32)
    wlen = rng.randint(0, WL + 1, (B, 15)).astype(np.int32)
    wlen[:, 5:] = 0
    wchars = (rng.randint(2, 38, (B, 15, WL)) *
              (np.arange(WL) < wlen[:, :, None])).astype(np.uint8)
    r_x, p_x = _window_best_xla(
        jnp.asarray(wchars), jnp.asarray(wlen), jnp.asarray(q_wo), jnp.asarray(q_wo_len)
    )
    r_p, p_p = window_best_pallas(
        jnp.asarray(wchars), jnp.asarray(wlen), jnp.asarray(q_wo), jnp.asarray(q_wo_len),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(r_x), np.asarray(r_p))
    np.testing.assert_array_equal(np.asarray(p_x), np.asarray(p_p))
