"""ops/topk.row_topk must be bit-identical to jax.lax.top_k, including
tie-breaking (values desc, lowest index first) — beam-search token
identity with the reference's stable host sorts depends on it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu.ops.topk import (_chunked_topk,
                                                    _lane_topk_pallas,
                                                    _lane_topk_raw,
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


@pytest.mark.parametrize("k", [9, 15, 16])
@pytest.mark.parametrize("v", [2048, 3001])  # 128-multiple and ragged
def test_lane_topk_matches_lax(k, v):
    rng = np.random.RandomState(v * k)
    x = jnp.asarray(rng.randn(24, v).astype(np.float32))
    lv, li = _lane_topk_pallas(x, k=k, interpret=True)
    rv, ri = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(li), np.asarray(ri))


@pytest.mark.parametrize("k,m", [(5, 3), (6, 3), (5, 2)])
@pytest.mark.parametrize("v", [1536, 2001])  # 128-multiple and ragged
def test_lane_topk_small_k_reduced_m(k, m, v):
    """row_topk routes k=5..6 to the lane kernel at m=3 (round-3 A/B,
    tools/perf/ab_topk5.py); exactness must hold for any m incl. the
    fallback firing more often at m < k-2."""
    rng = np.random.RandomState(v * k + m)
    x = jnp.asarray(rng.randn(24, v).astype(np.float32))
    lv, li = _lane_topk_pallas(x, k=k, m=m, interpret=True)
    rv, ri = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(li), np.asarray(ri))
    # ties + -inf tails through the reduced-m path
    y = np.full((8, v), -np.inf, np.float32)
    y[:, 9] = 1.0
    y[:, 137] = 1.0
    lv2, li2 = _lane_topk_pallas(jnp.asarray(y), k=k, m=m, interpret=True)
    rv2, ri2 = jax.lax.top_k(jnp.asarray(y), k)
    np.testing.assert_array_equal(np.asarray(lv2), np.asarray(rv2))
    np.testing.assert_array_equal(np.asarray(li2), np.asarray(ri2))


def test_lane_topk_hoarding_lane_triggers_fallback():
    # >m of the global top-k share one strided lane class (ids ≡ 5 mod
    # 128): the per-lane top-m candidate set is insufficient, the
    # witness (best unseen element) beats the k-th winner, and the
    # lax.cond fallback must produce the exact answer anyway
    x = np.full((8, 2048), -10.0, np.float32)
    for t, s in enumerate(range(0, 16)):       # 16 elements, all lane 5
        x[:, s * 128 + 5] = 100.0 - t
    x[:, 700] = 95.5                           # interleaved other lane
    _, _, trig = _lane_topk_raw(jnp.asarray(x), k=15, interpret=True)
    assert bool(jnp.all(trig[:, 0] > 0))       # genuine containment miss
    lv, li = _lane_topk_pallas(jnp.asarray(x), k=15, interpret=True)
    rv, ri = jax.lax.top_k(jnp.asarray(x), 15)
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(li), np.asarray(ri))


def test_lane_topk_witness_no_false_trigger_on_degenerate_rows():
    # the fallback costs k full-width passes, so the witness must stay
    # cold on the rows beam search actually produces: peaked rows with
    # consecutive top ids (distinct lanes), dead-beam constant rows
    # (-1e10), and all--inf rows (where a value-rewrite extraction would
    # hand the witness an already-seen position and false-trigger)
    x = np.full((16, 1664), -10.0, np.float32)
    x[:4, 200:215] = np.linspace(5, 3, 15, dtype=np.float32)  # peaked
    x[4:8, :] = -1e10                                         # dead beam
    x[8:12, :] = -np.inf                                      # hard-masked
    rng = np.random.RandomState(3)
    x[12:, :] = rng.randn(4, 1664)                            # generic
    _, _, trig = _lane_topk_raw(jnp.asarray(x), k=15, interpret=True)
    np.testing.assert_array_equal(np.asarray(trig), 0)


def test_lane_topk_exact_boundary_does_not_trigger():
    # exactly m of the top-k in one lane is still contained — the
    # witness (the lane's (m+1)-th element) loses to the k-th winner
    # and must NOT fire; result exact without any fallback
    x = np.full((8, 2048), -10.0, np.float32)
    for t in range(4):                         # m=4 elements, all lane 9
        x[:, t * 128 + 9] = 50.0 - t
    x[:, 300:311] = 40.0                       # 11 more, other lanes
    xj = jnp.asarray(x)
    vals, idx, trig = _lane_topk_raw(xj, k=15, interpret=True)
    np.testing.assert_array_equal(np.asarray(trig), 0)
    rv, ri = jax.lax.top_k(xj, 15)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))


def test_lane_topk_ties_and_degenerate_rows():
    # cross-lane exact ties resolve to the lowest flat index; constant
    # dead-beam rows (all -1e10) and all--inf rows walk ascending
    # columns exactly like lax.top_k
    x = np.full((8, 1664), -1.0, np.float32)
    for col in (127, 128, 129, 700, 1500):
        x[:4, col] = 7.0
    x[:4, 40] = 9.0
    x[4:6, :] = -1e10
    x[6:, :] = -np.inf
    x[7, 9] = 1.0
    for k in (9, 15):
        lv, li = _lane_topk_pallas(jnp.asarray(x), k=k, interpret=True)
        rv, ri = jax.lax.top_k(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(lv), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(li), np.asarray(ri))


def test_lane_topk_random_adversarial_sweep():
    # many rows x small value alphabet => dense exact ties everywhere,
    # plus random -inf contamination; bit-identity must hold row-for-row
    rng = np.random.RandomState(0)
    x = rng.choice(np.asarray([-3.0, -1.0, 0.0, 2.0], np.float32),
                   size=(32, 896)).astype(np.float32)
    x[rng.rand(32, 896) < 0.05] = -np.inf
    lv, li = _lane_topk_pallas(jnp.asarray(x), k=15, interpret=True)
    rv, ri = jax.lax.top_k(jnp.asarray(x), 15)
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(li), np.asarray(ri))


def test_lane_topk_ragged_tail_block_does_not_false_trigger():
    # rows % block_r != 0: the garbage tail block must not flip the
    # fallback trigger (masked by in_bounds); result identical to lax
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(45, 896).astype(np.float32))
    _, _, trig = _lane_topk_raw(x, k=9, block_r=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(trig), 0)
    lv, li = _lane_topk_pallas(x, k=9, block_r=16, interpret=True)
    rv, ri = jax.lax.top_k(x, 9)
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(li), np.asarray(ri))


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
