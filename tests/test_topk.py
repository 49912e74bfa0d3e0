"""ops/topk.row_topk must be bit-identical to jax.lax.top_k, including
tie-breaking (values desc, lowest index first) — beam-search token
identity with the reference's stable host sorts depends on it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu.ops.topk import _row_topk_pallas


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


def test_row_topk_handles_neg_inf_rows():
    x = np.full((8, 256), -np.inf, np.float32)
    x[:, 5] = 0.0
    v, i = _row_topk_pallas(jnp.asarray(x), k=2, interpret=True)
    assert np.asarray(i)[0, 0] == 5
    # second pick is a -inf entry at the lowest remaining index
    rv, ri = jax.lax.top_k(jnp.asarray(x), 2)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
