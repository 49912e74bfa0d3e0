"""Fused Pallas LSTM cell vs pure-XLA reference (finite-difference-style
numeric parity, modeled on the reference's test_activations.py pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu.ops import rnn


@pytest.mark.parametrize("maxout", [False, True])
def test_pallas_cell_matches_reference(rng, maxout):
    d, h, b = 256, 128, 8
    params = rnn.init_lstm_params(rng, d, h, maxout=maxout)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (b, d))
    h0 = jax.random.normal(k2, (b, h))
    c0 = jax.random.normal(k3, (b, h))

    h_ref, c_ref = rnn.lstm_step_ref(params, x, h0, c0, maxout=maxout)
    h_pl, c_pl = rnn.lstm_step(params, x, h0, c0, maxout=maxout, use_pallas=True)
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_pl), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_pl), atol=1e-5)


def test_unaligned_falls_back(rng):
    params = rnn.init_lstm_params(rng, 100, 60)
    x = jax.random.normal(rng, (3, 100))
    h0 = jnp.zeros((3, 60))
    h1, c1 = rnn.lstm_step(params, x, h0, h0, use_pallas=True)
    assert h1.shape == (3, 60) and c1.shape == (3, 60)


def test_stacked_lstm_shapes(rng):
    params = rnn.init_stacked_lstm(rng, 3, 32, 64)
    x = jax.random.normal(rng, (4, 32))
    hs = jnp.zeros((3, 4, 64))
    top, nh, nc = rnn.stacked_lstm_step(params, x, hs, hs)
    assert top.shape == (4, 64)
    assert nh.shape == (3, 4, 64) and nc.shape == (3, 4, 64)


def test_gradients_flow(rng):
    params = rnn.init_lstm_params(rng, 128, 128, maxout=True)
    x = jax.random.normal(rng, (8, 128))
    h0 = jnp.zeros((8, 128))

    def loss(p):
        h1, c1 = rnn.lstm_step_ref(p, x, h0, h0, maxout=True)
        return jnp.sum(h1 ** 2)

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads["w"]).sum()) > 0
