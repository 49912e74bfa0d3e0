"""Timestep-blocked LSTM chain (ops/lstm_block.py): forward parity with a
per-step lstm_step_ref chain and gradient parity with the lax.scan path.

Runs the Pallas kernels in interpret mode on the CPU mesh (same code path
as TPU modulo Mosaic lowering)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu.ops.lstm_block import blocked_lstm_chain
from unpaired_image_captioning_tpu.ops.rnn import lstm_step_ref

B, T, D, H = 8, 6, 24, 16


def _mk(maxout, dtype=jnp.bfloat16, seed=0):
    g = 5 if maxout else 4
    r = np.random.RandomState(seed)
    w = jnp.asarray(r.randn(D + H, g * H) * 0.2, dtype)
    b = jnp.asarray(r.randn(g * H) * 0.1, dtype)
    x = jnp.asarray(r.randn(B, T, D), dtype)
    h0 = jnp.asarray(r.randn(B, H) * 0.5, dtype)
    c0 = jnp.asarray(r.randn(B, H) * 0.5, dtype)
    return w, b, x, h0, c0


def _scan_ref(w, b, x, h0, c0, maxout):
    """The production-path formulation: full fused cell per step via
    lax.scan, with per-step h/c casts to the carry dtype."""
    def body(carry, xt):
        h, c = carry
        hn, cn = lstm_step_ref({"w": w, "b": b}, xt, h, c, maxout=maxout)
        hn, cn = hn.astype(h.dtype), cn.astype(c.dtype)
        return (hn, cn), (hn, cn)

    (_, _), (hs, cs) = jax.lax.scan(body, (h0, c0),
                                    jnp.swapaxes(x, 0, 1))
    return hs, cs                                  # time-major [T, B, H]


def _blocked(w, b, x, h0, c0, maxout):
    """The blocked formulation: i2h hoisted to one big matmul, h2h chain
    through the kernel."""
    xc = (jnp.einsum("btd,dg->tbg", x, w[:D]).astype(jnp.float32)
          + b.astype(jnp.float32))
    return blocked_lstm_chain(xc, h0, c0, w[D:], maxout=maxout,
                              interpret=True)


@pytest.mark.parametrize("maxout", [True, False])
def test_forward_matches_scan(maxout):
    w, b, x, h0, c0 = _mk(maxout)
    hs_r, cs_r = _scan_ref(w, b, x, h0, c0, maxout)
    hs_k, cs_k = _blocked(w, b, x, h0, c0, maxout)
    np.testing.assert_allclose(np.asarray(hs_k, np.float32),
                               np.asarray(hs_r, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(cs_k, np.float32),
                               np.asarray(cs_r, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("maxout", [True, False])
def test_gradients_match_scan(maxout):
    # f32 everywhere isolates formulation error from bf16 rounding
    w, b, x, h0, c0 = _mk(maxout, dtype=jnp.float32, seed=1)
    r = np.random.RandomState(2)
    ch = jnp.asarray(r.randn(T, B, H), jnp.float32)
    cc = jnp.asarray(r.randn(T, B, H) * 0.3, jnp.float32)

    def loss_scan(w, b, x, h0, c0):
        hs, cs = _scan_ref(w, b, x, h0, c0, maxout)
        return jnp.sum(hs * ch) + jnp.sum(cs * cc)

    def loss_blk(w, b, x, h0, c0):
        hs, cs = _blocked(w, b, x, h0, c0, maxout)
        return jnp.sum(hs * ch) + jnp.sum(cs * cc)

    g_r = jax.grad(loss_scan, argnums=(0, 1, 2, 3, 4))(w, b, x, h0, c0)
    g_k = jax.grad(loss_blk, argnums=(0, 1, 2, 3, 4))(w, b, x, h0, c0)
    for a, e, name in zip(g_k, g_r, ["w", "b", "x", "h0", "c0"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_value_and_grad_finite_bf16():
    w, b, x, h0, c0 = _mk(True)

    def loss(w):
        xc = (jnp.einsum("btd,dg->tbg", x, w[:D]).astype(jnp.float32)
              + b.astype(jnp.float32))
        hs, _ = blocked_lstm_chain(xc, h0, c0, w[D:], maxout=True,
                                   interpret=True)
        return jnp.mean(hs.astype(jnp.float32) ** 2)

    v, g = jax.value_and_grad(loss)(w)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g, np.float32)))
