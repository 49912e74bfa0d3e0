"""ops/mha_train fused training attention: forward/backward parity with the
XLA path of models/transformer.mha_apply (dropout=0), dropout determinism +
statistics + gradient consistency through the regenerated mask."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu.ops.mha_train import (fused_mha_train,
                                                         mha_kernel_ok)

B, T, S, H, D = 3, 12, 20, 4, 256  # dh = 64 -> head pairs of 2


def _ref(q, k, v, maskadd, n_heads):
    """The mha_apply XLA math (f32 inputs: no bf16 rounding), with the
    additive-mask formulation the kernel uses."""
    b, t, d = q.shape
    dh = d // n_heads
    qh = q.reshape(b, t, n_heads, dh)
    kh = k.reshape(b, k.shape[1], n_heads, dh)
    vh = v.reshape(b, v.shape[1], n_heads, dh)
    scores = jnp.einsum("bthd,bshd->bhts", qh, kh) / math.sqrt(dh)
    scores = scores.astype(jnp.float32) + maskadd[:, None, :, :]
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", attn.astype(q.dtype), vh)
    return out.reshape(b, t, d)


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, 1, S) > 0.2)
    maskadd = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)
    seed = jnp.asarray([1234], jnp.int32)
    return q, k, v, maskadd, seed


def test_forward_matches_xla_no_dropout(data):
    q, k, v, maskadd, seed = data
    out = fused_mha_train(q, k, v, maskadd, seed, H, 0.0, True)
    ref = _ref(q, k, v, maskadd, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_causal_mask_no_dropout(data):
    q, k, v, _, seed = data
    qq = q[:, :S, :] if T >= S else q
    t = qq.shape[1]
    causal = jnp.tril(jnp.ones((t, S), bool))[None]
    causal = jnp.broadcast_to(causal, (B, t, S))
    maskadd = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)
    out = fused_mha_train(qq, k, v, maskadd, seed, H, 0.0, True)
    ref = _ref(qq, k, v, maskadd, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_xla_no_dropout(data):
    q, k, v, maskadd, seed = data
    w = jnp.asarray(np.random.RandomState(7).randn(B, T, D), jnp.float32)

    def loss_kern(q_, k_, v_):
        return jnp.sum(fused_mha_train(q_, k_, v_, maskadd, seed,
                                       H, 0.0, True) * w)

    def loss_ref(q_, k_, v_):
        return jnp.sum(_ref(q_, k_, v_, maskadd, H) * w)

    gk = jax.grad(loss_kern, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_dropout_deterministic_and_rate(data):
    q, k, v, maskadd, seed = data
    o1 = fused_mha_train(q, k, v, maskadd, seed, H, 0.5, True)
    o2 = fused_mha_train(q, k, v, maskadd, seed, H, 0.5, True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = fused_mha_train(q, k, v, maskadd, seed + 1, H, 0.5, True)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # expectation check: E[dropout(attn)] = attn, so the mean output over
    # many seeds approaches the rate-0 output
    outs = [np.asarray(fused_mha_train(q, k, v, maskadd,
                                       jnp.asarray([s], jnp.int32),
                                       H, 0.5, True)) for s in range(24)]
    ref = np.asarray(fused_mha_train(q, k, v, maskadd, seed, H, 0.0, True))
    err = np.abs(np.mean(outs, 0) - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert err < 0.2, err


def _ref_with_kernel_mask(q, k, v, maskadd, seed, n_heads, rate):
    """Pure-jnp replica of the kernel INCLUDING its hash dropout mask, so
    jax.grad of this is an autodiff-derived ground truth for the custom
    VJP (which regenerates the mask instead of saving it)."""
    from unpaired_image_captioning_tpu.ops.mha_train import _keep_mask

    b, t, d = q.shape
    s = k.shape[1]
    dh = d // n_heads
    outs = []
    for bi in range(b):
        row = []
        for h in range(n_heads):
            pid = bi * n_heads + h
            qs = q[bi, :, h * dh:(h + 1) * dh]
            ks = k[bi, :, h * dh:(h + 1) * dh]
            vs = v[bi, :, h * dh:(h + 1) * dh]
            sc = qs @ ks.T / math.sqrt(dh)
            sc = sc + maskadd[bi]
            p = jax.nn.softmax(sc, axis=-1)
            if rate > 0:
                keep = _keep_mask(seed[0], pid, t, s, rate)
                p = jnp.where(keep, p / (1 - rate), 0.0)
            row.append(p @ vs)
        outs.append(jnp.concatenate(row, axis=-1))
    return jnp.stack(outs)


def test_dropout_grads_match_autodiff_of_replica(data):
    # the custom VJP regenerates the dropout mask from the seed; jax.grad
    # of a pure-jnp replica that reuses the same mask is the ground truth
    # (finite differences are too noisy in f32 at this loss scale)
    q, k, v, maskadd, seed = data
    w = jnp.asarray(np.random.RandomState(3).randn(B, T, D), jnp.float32)

    def loss_kern(q_, k_, v_):
        return jnp.sum(fused_mha_train(q_, k_, v_, maskadd, seed,
                                       H, 0.3, True) * w)

    def loss_ref(q_, k_, v_):
        return jnp.sum(_ref_with_kernel_mask(q_, k_, v_, maskadd, seed,
                                             H, 0.3) * w)

    out_k = fused_mha_train(q, k, v, maskadd, seed, H, 0.3, True)
    out_r = _ref_with_kernel_mask(q, k, v, maskadd, seed, H, 0.3)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-6, atol=1e-6)
    gk = jax.grad(loss_kern, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_kernel_ok_guard():
    assert mha_kernel_ok(8, 512, 196, 196)
    assert mha_kernel_ok(4, 512, 16, 196)         # dh=128
    assert mha_kernel_ok(8, 384, 196, 196)        # any dh: lane-masked dots
    assert mha_kernel_ok(2, 512, 196, 196)        # dh=256 fine too
    assert not mha_kernel_ok(8, 512, 1024, 2048)  # tile too large
    assert not mha_kernel_ok(7, 512, 196, 196)    # d % n_heads != 0
    # small-tile floor (round 5): both dims tiny -> XLA wins, measured on
    # the NMT transformer's 17x16 tiles (prof_train_nmt_transformer.py)
    assert not mha_kernel_ok(8, 512, 17, 16)
    assert not mha_kernel_ok(8, 512, 16, 16)
    assert mha_kernel_ok(8, 512, 17, 196)         # caption cross: stays
