"""ops/topk.row_topk must be bit-identical to jax.lax.top_k, including
tie-breaking (values desc, lowest index first) — beam-search token
identity with the reference's stable host sorts depends on it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu.ops.topk import (_chunked_topk,
                                                    _row_topk_pallas)


@pytest.mark.parametrize("k", [1, 3, 5, 15])
def test_row_topk_matches_lax(k):
    rng = np.random.RandomState(k)
    x = jnp.asarray(rng.randn(24, 301).astype(np.float32))
    v, i = _row_topk_pallas(x, k=k, interpret=True)
    rv, ri = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_row_topk_ties_take_lowest_index():
    # duplicated maxima: both orders of magnitude and exact dupes
    x = np.full((8, 256), -5.0, np.float32)
    x[:, 7] = 2.0
    x[:, 100] = 2.0   # tie with col 7
    x[:, 3] = 1.0
    x[:, 250] = 1.0   # tie with col 3
    v, i = _row_topk_pallas(jnp.asarray(x), k=4, interpret=True)
    rv, ri = jax.lax.top_k(jnp.asarray(x), 4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(i)[0], [7, 100, 3, 250])


@pytest.mark.parametrize("k", [2, 3, 5])
def test_row_topk_handles_neg_inf_rows(k):
    # >=2 -inf entries inside the top-k: a -inf masking rewrite would be
    # a no-op and return duplicate indices (advisor finding, round 2) —
    # the picks must walk ascending untaken columns like lax.top_k
    x = np.full((8, 256), -np.inf, np.float32)
    x[:, 5] = 0.0
    v, i = _row_topk_pallas(jnp.asarray(x), k=k, interpret=True)
    assert np.asarray(i)[0, 0] == 5
    rv, ri = jax.lax.top_k(jnp.asarray(x), k)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    # mixed finite / -inf tail
    y = np.full((4, 256), -np.inf, np.float32)
    y[:, 9] = 1.0
    y[:, 100] = 0.5
    v2, i2 = _row_topk_pallas(jnp.asarray(y), k=k, interpret=True)
    rv2, ri2 = jax.lax.top_k(jnp.asarray(y), k)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ri2))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(rv2))


@pytest.mark.parametrize("k", [9, 15])
@pytest.mark.parametrize("v", [2048, 3001])  # 128-multiple and ragged
def test_chunked_topk_matches_lax(k, v):
    rng = np.random.RandomState(v + k)
    x = jnp.asarray(rng.randn(16, v).astype(np.float32))
    cv, ci = _chunked_topk(x, k, interpret=True)
    rv, ri = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(ri))


def test_chunked_topk_hoarding_chunk():
    # one chunk holds MOST of the global top-k: the chunk-max reduction
    # must still keep every needed chunk (correctness proof in the
    # docstring) and re-rank by true flat index
    x = np.full((8, 2048), -10.0, np.float32)
    x[:, 256:266] = np.linspace(100, 91, 10, dtype=np.float32)  # chunk 2
    x[:, 5] = 95.0       # chunk 0 interleaves
    x[:, 2000] = 94.5    # chunk 15
    cv, ci = _chunked_topk(jnp.asarray(x), 12, interpret=True)
    rv, ri = jax.lax.top_k(jnp.asarray(x), 12)
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(ri))


def test_chunked_topk_cross_chunk_ties():
    # equal values straddling chunk boundaries resolve to the lowest flat
    # index, exactly like lax.top_k
    x = np.full((8, 2048), -1.0, np.float32)
    for col in (127, 128, 129, 700, 1900):
        x[:, col] = 7.0
    x[:, 40] = 9.0
    cv, ci = _chunked_topk(jnp.asarray(x), 10, interpret=True)
    rv, ri = jax.lax.top_k(jnp.asarray(x), 10)
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(rv))
