"""ops/ln_train fused training LayerNorm: forward/gradient parity with the
XLA formula in models/transformer.layer_norm (reference
TransformerModel.py:96-105 semantics — unbiased variance, eps outside the
sqrt), including tail-block batch masking and the bf16 cast points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu.ops.ln_train import (fused_layer_norm,
                                                        ln_kernel_ok)


def _xla_ln(x, scale, offset, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    n = x32.shape[-1]
    var = jnp.sum(jnp.square(x32 - mean), axis=-1, keepdims=True) / (n - 1)
    out = (x32 - mean) / (jnp.sqrt(var) + eps)
    return (out * scale + offset).astype(x.dtype)


# (B, T): (6, 160) fills two exact batch blocks (bb=6 at T=160);
# (7, 160) leaves a tail block with 5 padded batch rows
@pytest.mark.parametrize("bt", [(6, 160), (7, 160), (2, 17)])
def test_forward_matches_xla(bt):
    b, t = bt
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, 128).astype(np.float32)) * 3.0 + 1.0
    scale = jnp.asarray(rng.randn(128).astype(np.float32))
    offset = jnp.asarray(rng.randn(128).astype(np.float32))
    out = fused_layer_norm(x, scale, offset, 1e-6, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_xla_ln(x, scale, offset)),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("bt", [(6, 160), (7, 160)])
def test_gradients_match_xla(bt):
    b, t = bt
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, t, 128).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(128).astype(np.float32))
    offset = jnp.asarray(0.1 * rng.randn(128).astype(np.float32))
    g = jnp.asarray(rng.randn(b, t, 128).astype(np.float32))

    def loss_k(x, s, b_):
        return jnp.sum(fused_layer_norm(x, s, b_, 1e-6, True) * g)

    def loss_x(x, s, b_):
        return jnp.sum(_xla_ln(x, s, b_) * g)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, scale, offset)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, scale, offset)
    for a, bb, name in zip(gk, gx, ("dx", "dscale", "doffset")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_bf16_cast_points_match_xla():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 64, 128)).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.randn(128)).astype(jnp.bfloat16)
    offset = jnp.asarray(rng.randn(128)).astype(jnp.bfloat16)
    out = fused_layer_norm(x, scale, offset, 1e-6, True)
    ref = _xla_ln(x, scale, offset)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_routing_guard():
    assert ln_kernel_ok((50, 196, 512), 512)
    assert ln_kernel_ok((50, 17, 512), 512)
    assert not ln_kernel_ok((50, 196, 500), 500)   # lane-unclean width
    assert not ln_kernel_ok((2, 4, 512), 512)      # too few rows
    assert not ln_kernel_ok((9800, 512), 512)      # 2D: native-3D only


def test_transformer_forward_uses_same_math():
    """models/transformer.layer_norm(training=True) must equal the XLA path
    on CPU (kernel routing is TPU-only, so this pins the fallback) and the
    interpret-mode kernel output."""
    from unpaired_image_captioning_tpu.models.transformer import layer_norm

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 32, 128).astype(np.float32))
    p = {"scale": jnp.asarray(rng.randn(128).astype(np.float32)),
         "offset": jnp.asarray(rng.randn(128).astype(np.float32))}
    a = layer_norm(p, x, training=True)
    b = _xla_ln(x, p["scale"], p["offset"])
    k = fused_layer_norm(x, p["scale"], p["offset"], 1e-6, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(k), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
