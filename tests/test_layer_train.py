"""ops/layer_train fused encoder layer: forward/gradient parity with the
XLA sublayer sequence in models/transformer (encode() inner loop), dropout
determinism, and gradient correctness through the regenerated hash masks."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu.ops.layer_train import (
    _N_SITES, enc_layer_kernel_ok, fused_enc_layer)
from unpaired_image_captioning_tpu.ops.mha_train import _keep_mask

B, T, D, H, F = 2, 24, 256, 4, 256
EPS = 1e-6


def _ln(x, s, b):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / (n - 1)
    return (x - mean) / (jnp.sqrt(var) + EPS) * s + b


def _replica(x, maskadd, seed, w, rate):
    """Pure-jnp replica of the kernel INCLUDING its hash dropout masks
    (element e maps to pl.program_id(0)); jax.grad of this is the
    autodiff ground truth for the custom VJP."""
    dh = D // H
    outs = []
    for e in range(x.shape[0]):
        xe = x[e]
        y1 = _ln(xe, w["l1s"], w["l1b"])
        qkv = y1 @ w["wqkv"] + w["bqkv"]
        heads = []
        for h in range(H):
            q = qkv[:, h * dh:(h + 1) * dh]
            k = qkv[:, D + h * dh:D + (h + 1) * dh]
            v = qkv[:, 2 * D + h * dh:2 * D + (h + 1) * dh]
            sc = q @ k.T / math.sqrt(dh)
            sc = jnp.where(maskadd[e] < 0, -1e9, sc)
            p = jax.nn.softmax(sc, axis=-1)
            if rate > 0:
                pid = (e * _N_SITES + 0) * H + h
                keep = _keep_mask(seed[0], pid, T, T, rate)
                p = jnp.where(keep, p / (1 - rate), 0.0)
            heads.append(p @ v)
        o = jnp.concatenate(heads, axis=-1) @ w["wo"] + w["bo"]
        if rate > 0:
            keep = _keep_mask(seed[0], (e * _N_SITES + 1) * H, T, D, rate)
            o = jnp.where(keep, o / (1 - rate), 0.0)
        x2 = xe + o
        y2 = _ln(x2, w["l2s"], w["l2b"])
        hpre = jax.nn.relu(y2 @ w["w1"] + w["b1"])
        if rate > 0:
            keep = _keep_mask(seed[0], (e * _N_SITES + 2) * H, T, F, rate)
            hpre = jnp.where(keep, hpre / (1 - rate), 0.0)
        f = hpre @ w["w2"] + w["b2"]
        if rate > 0:
            keep = _keep_mask(seed[0], (e * _N_SITES + 3) * H, T, D, rate)
            f = jnp.where(keep, f / (1 - rate), 0.0)
        outs.append(x2 + f)
    return jnp.stack(outs)


def _call(x, maskadd, seed, w, rate):
    return fused_enc_layer(x, maskadd, seed, w["wqkv"], w["bqkv"], w["wo"],
                           w["bo"], w["w1"], w["b1"], w["w2"], w["b2"],
                           w["l1s"], w["l1b"], w["l2s"], w["l2b"],
                           H, rate, True)


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, 1, T) > 0.15)
    maskadd = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)
    seed = jnp.asarray([77], jnp.int32)
    sc = 1.0 / math.sqrt(D)
    w = {
        "wqkv": jnp.asarray(rng.randn(D, 3 * D).astype(np.float32)) * sc,
        "bqkv": jnp.asarray(rng.randn(3 * D).astype(np.float32)) * 0.02,
        "wo": jnp.asarray(rng.randn(D, D).astype(np.float32)) * sc,
        "bo": jnp.asarray(rng.randn(D).astype(np.float32)) * 0.02,
        "w1": jnp.asarray(rng.randn(D, F).astype(np.float32)) * sc,
        "b1": jnp.asarray(rng.randn(F).astype(np.float32)) * 0.02,
        "w2": jnp.asarray(rng.randn(F, D).astype(np.float32)) * sc,
        "b2": jnp.asarray(rng.randn(D).astype(np.float32)) * 0.02,
        "l1s": jnp.asarray(1.0 + 0.1 * rng.randn(D).astype(np.float32)),
        "l1b": jnp.asarray(0.1 * rng.randn(D).astype(np.float32)),
        "l2s": jnp.asarray(1.0 + 0.1 * rng.randn(D).astype(np.float32)),
        "l2b": jnp.asarray(0.1 * rng.randn(D).astype(np.float32)),
    }
    return x, maskadd, seed, w


def test_forward_matches_replica_no_dropout(data):
    x, maskadd, seed, w = data
    out = _call(x, maskadd, seed, w, 0.0)
    ref = _replica(x, maskadd, seed, w, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_forward_matches_xla_sublayer_path(data):
    """The no-dropout kernel must equal models/transformer's actual
    fallback sublayer sequence (enc_layer_apply on CPU, training=False
    semantics with the same params)."""
    from unpaired_image_captioning_tpu.models.base import linear_init
    from unpaired_image_captioning_tpu.models.transformer import (
        enc_layer_apply)

    x, maskadd, seed, w = data
    lp = {"self": {}, "ffn": {}, "n1": {"scale": w["l1s"], "offset": w["l1b"]},
          "n2": {"scale": w["l2s"], "offset": w["l2b"]}}
    for i, nm in enumerate(("q", "k", "v")):
        lp["self"][nm] = {"w": w["wqkv"][:, i * D:(i + 1) * D],
                          "b": w["bqkv"][i * D:(i + 1) * D]}
    lp["self"]["o"] = {"w": w["wo"], "b": w["bo"]}
    lp["ffn"]["w1"] = {"w": w["w1"], "b": w["b1"]}
    lp["ffn"]["w2"] = {"w": w["w2"], "b": w["b2"]}
    del linear_init
    ref = enc_layer_apply(lp, x, maskadd >= 0, H, training=False, rngs=None)
    out = _call(x, maskadd, seed, w, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_grads_match_replica_no_dropout(data):
    x, maskadd, seed, w = data
    cot = jnp.asarray(np.random.RandomState(5).randn(B, T, D), jnp.float32)

    def lk(x_, w_):
        return jnp.sum(_call(x_, maskadd, seed, w_, 0.0) * cot)

    def lr(x_, w_):
        return jnp.sum(_replica(x_, maskadd, seed, w_, 0.0) * cot)

    gxk, gwk = jax.grad(lk, argnums=(0, 1))(x, w)
    gxr, gwr = jax.grad(lr, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gxk), np.asarray(gxr),
                               rtol=2e-3, atol=2e-3, err_msg="dx")
    for key in w:
        np.testing.assert_allclose(np.asarray(gwk[key]),
                                   np.asarray(gwr[key]),
                                   rtol=2e-3, atol=2e-3, err_msg=key)


def test_dropout_forward_matches_replica(data):
    x, maskadd, seed, w = data
    out = _call(x, maskadd, seed, w, 0.3)
    ref = _replica(x, maskadd, seed, w, 0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # deterministic per seed; different seed -> different masks
    out2 = _call(x, maskadd, seed, w, 0.3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = _call(x, maskadd, seed + 1, w, 0.3)
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_dropout_grads_match_autodiff_of_replica(data):
    x, maskadd, seed, w = data
    cot = jnp.asarray(np.random.RandomState(6).randn(B, T, D), jnp.float32)

    def lk(x_, w_):
        return jnp.sum(_call(x_, maskadd, seed, w_, 0.3) * cot)

    def lr(x_, w_):
        return jnp.sum(_replica(x_, maskadd, seed, w_, 0.3) * cot)

    gxk, gwk = jax.grad(lk, argnums=(0, 1))(x, w)
    gxr, gwr = jax.grad(lr, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gxk), np.asarray(gxr),
                               rtol=2e-3, atol=2e-3, err_msg="dx")
    for key in w:
        np.testing.assert_allclose(np.asarray(gwk[key]),
                                   np.asarray(gwr[key]),
                                   rtol=2e-3, atol=2e-3, err_msg=key)


def test_kernel_ok_guard():
    assert enc_layer_kernel_ok(8, 512, 512, 196)
    # d_ff=2048 (the NMT transformer) does NOT fit: its FFN backward's
    # bf16 weights + f32 grad accumulators alone are ~12.6 MB of VMEM
    assert not enc_layer_kernel_ok(8, 512, 2048, 196)
    assert not enc_layer_kernel_ok(8, 512, 500, 196)     # lane-unclean f
    assert not enc_layer_kernel_ok(8, 512, 512, 4096)    # T too large
    assert not enc_layer_kernel_ok(12, 512, 512, 196)    # d % heads


# ---------------------------------------------------------------------------
# Fused DECODER layer (self-attn + cross-attn + FFN)
# ---------------------------------------------------------------------------

S = 40  # memory slots (cross-attention source length)


def _replica_dec(x, mk, mv, tm, sm, seeds, w, rate):
    """Pure-jnp replica of fused_dec_layer including its hash dropout
    masks (self/FFN sites under seeds[0], cross sites under seeds[1])."""
    dh = D // H

    def attn(q, k, v, maskadd, seed, e):
        heads = []
        for h in range(H):
            qh = q[:, h * dh:(h + 1) * dh]
            kh = k[:, h * dh:(h + 1) * dh]
            vh = v[:, h * dh:(h + 1) * dh]
            sc = qh @ kh.T / math.sqrt(dh)
            sc = jnp.where(maskadd < 0, -1e9, sc)
            p = jax.nn.softmax(sc, axis=-1)
            if rate > 0:
                keep = _keep_mask(seed, (e * _N_SITES + 0) * H + h,
                                  q.shape[0], k.shape[0], rate)
                p = jnp.where(keep, p / (1 - rate), 0.0)
            heads.append(p @ vh)
        return jnp.concatenate(heads, axis=-1)

    def drop(v, seed, site, e):
        if rate <= 0:
            return v
        keep = _keep_mask(seed, (e * _N_SITES + site) * H,
                          v.shape[0], v.shape[1], rate)
        return jnp.where(keep, v / (1 - rate), 0.0)

    outs = []
    for e in range(x.shape[0]):
        xe = x[e]
        y1 = _ln(xe, w["l1s"], w["l1b"])
        qkv = y1 @ w["wqkv"] + w["bqkv"]
        ao = attn(qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:], tm[e],
                  seeds[0], e)
        x2 = xe + drop(ao @ w["wo"] + w["bo"], seeds[0], 1, e)
        y2 = _ln(x2, w["l2s"], w["l2b"])
        qc = y2 @ w["wq"] + w["bq"]
        co = attn(qc, mk[e], mv[e], sm[e], seeds[1], e)
        x3 = x2 + drop(co @ w["wo2"] + w["bo2"], seeds[1], 1, e)
        y3 = _ln(x3, w["l3s"], w["l3b"])
        hpre = jax.nn.relu(y3 @ w["w1"] + w["b1"])
        hpre = drop(hpre, seeds[0], 2, e)
        f = hpre @ w["w2"] + w["b2"]
        outs.append(x3 + drop(f, seeds[0], 3, e))
    return jnp.stack(outs)


def _call_dec(x, mk, mv, tm, sm, seeds, w, rate):
    from unpaired_image_captioning_tpu.ops.layer_train import fused_dec_layer

    return fused_dec_layer(x, mk, mv, tm, sm, seeds,
                           w["wqkv"], w["bqkv"], w["wo"], w["bo"],
                           w["wq"], w["bq"], w["wo2"], w["bo2"],
                           w["w1"], w["b1"], w["w2"], w["b2"],
                           w["l1s"], w["l1b"], w["l2s"], w["l2b"],
                           w["l3s"], w["l3b"], H, rate, True)


@pytest.fixture
def dec_data():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    mk = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    mv = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    causal = np.tril(np.ones((T, T), bool))
    pad = rng.rand(B, 1, T) > 0.1
    tgt = np.logical_and(causal[None], pad)               # [B, T, T]
    tm = jnp.where(jnp.asarray(tgt), 0.0, -1e9).astype(jnp.float32)
    sm_b = rng.rand(B, 1, S) > 0.15
    sm = jnp.where(jnp.asarray(sm_b), 0.0, -1e9).astype(jnp.float32)
    seed = np.int32(91)
    seeds = jnp.asarray([seed, seed ^ 0x55555555], jnp.int32)
    sc = 1.0 / math.sqrt(D)
    w = {
        "wqkv": jnp.asarray(rng.randn(D, 3 * D).astype(np.float32)) * sc,
        "bqkv": jnp.asarray(rng.randn(3 * D).astype(np.float32)) * 0.02,
        "wo": jnp.asarray(rng.randn(D, D).astype(np.float32)) * sc,
        "bo": jnp.asarray(rng.randn(D).astype(np.float32)) * 0.02,
        "wq": jnp.asarray(rng.randn(D, D).astype(np.float32)) * sc,
        "bq": jnp.asarray(rng.randn(D).astype(np.float32)) * 0.02,
        "wo2": jnp.asarray(rng.randn(D, D).astype(np.float32)) * sc,
        "bo2": jnp.asarray(rng.randn(D).astype(np.float32)) * 0.02,
        "w1": jnp.asarray(rng.randn(D, F).astype(np.float32)) * sc,
        "b1": jnp.asarray(rng.randn(F).astype(np.float32)) * 0.02,
        "w2": jnp.asarray(rng.randn(F, D).astype(np.float32)) * sc,
        "b2": jnp.asarray(rng.randn(D).astype(np.float32)) * 0.02,
        "l1s": jnp.asarray(1.0 + 0.1 * rng.randn(D).astype(np.float32)),
        "l1b": jnp.asarray(0.1 * rng.randn(D).astype(np.float32)),
        "l2s": jnp.asarray(1.0 + 0.1 * rng.randn(D).astype(np.float32)),
        "l2b": jnp.asarray(0.1 * rng.randn(D).astype(np.float32)),
        "l3s": jnp.asarray(1.0 + 0.1 * rng.randn(D).astype(np.float32)),
        "l3b": jnp.asarray(0.1 * rng.randn(D).astype(np.float32)),
    }
    return x, mk, mv, tm, sm, seeds, w


def test_dec_forward_matches_replica_no_dropout(dec_data):
    x, mk, mv, tm, sm, seeds, w = dec_data
    out = _call_dec(x, mk, mv, tm, sm, seeds, w, 0.0)
    ref = _replica_dec(x, mk, mv, tm, sm, seeds, w, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_dec_forward_matches_xla_sublayer_path(dec_data):
    """The no-dropout kernel must equal models/transformer's actual
    fallback decoder sublayer sequence (dec_layer_apply on CPU)."""
    from unpaired_image_captioning_tpu.models.transformer import (
        dec_layer_apply)

    x, mk, mv, tm, sm, seeds, w = dec_data
    lp = {"self": {}, "src": {}, "ffn": {},
          "n1": {"scale": w["l1s"], "offset": w["l1b"]},
          "n2": {"scale": w["l2s"], "offset": w["l2b"]},
          "n3": {"scale": w["l3s"], "offset": w["l3b"]}}
    for i, nm in enumerate(("q", "k", "v")):
        lp["self"][nm] = {"w": w["wqkv"][:, i * D:(i + 1) * D],
                          "b": w["bqkv"][i * D:(i + 1) * D]}
    lp["self"]["o"] = {"w": w["wo"], "b": w["bo"]}
    lp["src"]["q"] = {"w": w["wq"], "b": w["bq"]}
    lp["src"]["o"] = {"w": w["wo2"], "b": w["bo2"]}
    lp["ffn"]["w1"] = {"w": w["w1"], "b": w["b1"]}
    lp["ffn"]["w2"] = {"w": w["w2"], "b": w["b2"]}
    ref = dec_layer_apply(lp, x, mk, mv, tm >= 0, sm >= 0, H,
                          training=False, rngs=None)
    out = _call_dec(x, mk, mv, tm, sm, seeds, w, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("rate", [0.0, 0.3])
def test_dec_grads_match_replica(dec_data, rate):
    x, mk, mv, tm, sm, seeds, w = dec_data
    cot = jnp.asarray(np.random.RandomState(8).randn(B, T, D), jnp.float32)

    def lk(x_, mk_, mv_, w_):
        return jnp.sum(_call_dec(x_, mk_, mv_, tm, sm, seeds, w_, rate)
                       * cot)

    def lr(x_, mk_, mv_, w_):
        return jnp.sum(_replica_dec(x_, mk_, mv_, tm, sm, seeds, w_, rate)
                       * cot)

    gk = jax.grad(lk, argnums=(0, 1, 2, 3))(x, mk, mv, w)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(x, mk, mv, w)
    for name, a, b in (("dx", gk[0], gr[0]), ("dmk", gk[1], gr[1]),
                       ("dmv", gk[2], gr[2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=name)
    for key in w:
        np.testing.assert_allclose(np.asarray(gk[3][key]),
                                   np.asarray(gr[3][key]),
                                   rtol=2e-3, atol=2e-3, err_msg=key)


def test_dec_dropout_forward_deterministic(dec_data):
    x, mk, mv, tm, sm, seeds, w = dec_data
    out = _call_dec(x, mk, mv, tm, sm, seeds, w, 0.3)
    ref = _replica_dec(x, mk, mv, tm, sm, seeds, w, 0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    out2 = _call_dec(x, mk, mv, tm, sm, seeds, w, 0.3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = _call_dec(x, mk, mv, tm, sm, seeds + 1, w, 0.3)
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_dec_kernel_ok_guard():
    from unpaired_image_captioning_tpu.ops.layer_train import (
        dec_layer_kernel_ok)

    assert dec_layer_kernel_ok(8, 512, 512, 17, 196)
    # d_ff=2048 does NOT fit at any T: the FFN backward half's f32
    # dW1/dW2 accumulators alone are 8.4 MB, and the chip confirmed the
    # overflow (16.34M scoped-vmem OOM on the encoder kernel at t=16,
    # round-5 NMT-transformer train A/B) — the guard must reject it so
    # the model falls back to the XLA+mha_train path cleanly
    assert not dec_layer_kernel_ok(8, 512, 2048, 17, 196)
    assert not dec_layer_kernel_ok(8, 512, 2048, 50, 50)
    assert not dec_layer_kernel_ok(8, 512, 2048, 196, 196)
    assert not dec_layer_kernel_ok(8, 512, 512, 17, 4096)  # S too large
    assert not dec_layer_kernel_ok(12, 512, 512, 17, 196)  # d % heads
