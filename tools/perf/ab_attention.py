"""Microbench the fused additive-attention kernel on real TPU.

Variants:
  xla      — pure-XLA reference semantics
  fused    — current production kernel (exact tanh)
  notanh   — same kernel, tanh removed (isolates transcendental cost)
  pade     — tanh via clamped Pade(7,6)-lite rational approx
  beams    — K-beam unexpanded kernel (reads memory once per image)
All timed as ONE device program scanning STEPS invocations (tunnel-safe).
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, N, A, D = 50, 3, 196, 512, 512
STEPS = 512
DT = jnp.bfloat16


def tanh_exact(x):
    return jnp.tanh(x)


def tanh_pade(x):
    # Pade(5,4)-style rational approx on clamped input: for |x|<=4.97,
    # t = x^2; tanh ~ x*(945 + 105 t + t^2) / (945 + 420 t + 15 t^2)
    # (continued-fraction truncation); beyond the clamp tanh is +-1 to
    # bf16 precision.
    xc = jnp.clip(x, -4.97, 4.97)
    t = xc * xc
    num = xc * (945.0 + t * (105.0 + t))
    den = 945.0 + t * (420.0 + 15.0 * t)
    return num / den


def make_kernel(tanh_fn, with_tanh=True):
    def kern(p_att_ref, att_h_ref, alpha_ref, mask_ref, emb_ref, out_ref):
        p_att = p_att_ref[:].astype(jnp.float32)
        att_h = att_h_ref[:].astype(jnp.float32)
        pre = p_att + att_h[:, None, :]
        dot = tanh_fn(pre) if with_tanh else pre
        scores = jax.lax.dot_general(
            dot, alpha_ref[:].astype(jnp.float32),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., 0]
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        w = jnp.exp(scores) * mask_ref[:].astype(jnp.float32)
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
        emb = emb_ref[:].astype(jnp.float32)
        out = jax.lax.dot_general(
            w[:, None, :], emb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]
        out_ref[:] = out.astype(out_ref.dtype)
    return kern


def pallas_attn(kern, p_att, att_h, alpha, mask, emb, block_b=8):
    b, n, a = p_att.shape
    d = emb.shape[-1]
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(b, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, n, a), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, a), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), emb.dtype),
    )(p_att, att_h, alpha, mask, emb)


def xla_attn_unexp(p_att, att_h, alpha, mask, emb):
    # p_att [B,N,A]; att_h [B,K,A]; emb [B,N,D] -> [B,K,D]
    dot = jnp.tanh(p_att.astype(jnp.float32)[:, None]
                   + att_h.astype(jnp.float32)[:, :, None, :])
    scores = jnp.einsum("bkna,ao->bkno", dot, alpha.astype(jnp.float32))[..., 0]
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores) * mask.astype(jnp.float32)[:, None, :]
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    return jnp.einsum("bkn,bnd->bkd", w, emb.astype(jnp.float32)).astype(emb.dtype)


def vpu_kernel(p_att_ref, att_h_ref, alpha_ref, mask_ref, emb_ref, out_ref):
    # scores as one streaming VPU pass: no materialized [.,N,A] f32 buffer
    q = att_h_ref[:].astype(jnp.float32)               # [BB, A]
    al = alpha_ref[:].astype(jnp.float32)[:, 0]        # [A]
    pre = p_att_ref[:].astype(jnp.float32) + q[:, None, :]
    scores = jnp.sum(jnp.tanh(pre) * al[None, None, :], axis=2)  # [BB, N]
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores) * mask_ref[:].astype(jnp.float32)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    emb = emb_ref[:]
    out = jax.lax.dot_general(
        w[:, None, :].astype(emb.dtype), emb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]
    out_ref[:] = out.astype(out_ref.dtype)


def vpu_beams_kernel(tanh_fn):
    def kern(p_att_ref, att_h_ref, alpha_ref, mask_ref, emb_ref, out_ref):
        p_att = p_att_ref[:].astype(jnp.float32)
        emb = emb_ref[:]
        mask = mask_ref[:, 0].astype(jnp.float32)
        al = alpha_ref[:].astype(jnp.float32)[:, 0]
        for k in range(K):
            q = att_h_ref[:, k].astype(jnp.float32)
            scores = jnp.sum(tanh_fn(p_att + q[:, None, :]) * al[None, None, :],
                             axis=2)
            scores = scores - jnp.max(scores, axis=-1, keepdims=True)
            w = jnp.exp(scores) * mask
            w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
            out = jax.lax.dot_general(
                w[:, None, :].astype(emb.dtype), emb,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]
            out_ref[:, k] = out.astype(out_ref.dtype)
    return kern


def xla_attn(p_att, att_h, alpha, mask, emb):
    dot = jnp.tanh(p_att.astype(jnp.float32) + att_h.astype(jnp.float32)[:, None, :])
    scores = jnp.einsum("bna,ao->bno", dot, alpha.astype(jnp.float32))[..., 0]
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores) * mask.astype(jnp.float32)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    return jnp.einsum("bn,bnd->bd", w, emb.astype(jnp.float32)).astype(emb.dtype)


def beams_kernel(tanh_fn):
    def kern(p_att_ref, att_h_ref, alpha_ref, mask_ref, emb_ref, out_ref):
        p_att = p_att_ref[:].astype(jnp.float32)
        emb = emb_ref[:]
        mask = mask_ref[:, 0].astype(jnp.float32)
        alpha = alpha_ref[:].astype(jnp.float32)
        for k in range(K):
            att_h = att_h_ref[:, k].astype(jnp.float32)
            dot = tanh_fn(p_att + att_h[:, None, :])
            scores = jax.lax.dot_general(
                dot, alpha, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[..., 0]
            scores = scores - jnp.max(scores, axis=-1, keepdims=True)
            w = jnp.exp(scores) * mask
            w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
            out = jax.lax.dot_general(
                w[:, None, :].astype(emb.dtype), emb,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]
            out_ref[:, k] = out.astype(out_ref.dtype)
    return kern


def pallas_beams(kern, p_att, att_h, alpha, mask, emb, block_b=5):
    b, n, a = p_att.shape
    d = emb.shape[-1]
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(b, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, n, a), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, K, a), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, K, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, K, d), emb.dtype),
    )(p_att, att_h, alpha, mask[:, None, :], emb)


def bench(fn, args, label, per_call_items=1):
    @jax.jit
    def sweep(p, q0, *rest):
        def body(q, _):
            out = fn(p, q, *rest)
            qn = (out.reshape(q.shape) * jnp.bfloat16(0.1)
                  + q * jnp.bfloat16(0.9))
            return qn, jnp.sum(out[..., :1], dtype=jnp.float32)
        _, outs = jax.lax.scan(body, q0, None, length=STEPS)
        return outs

    r = np.asarray(sweep(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(sweep(*args))
        best = min(best, time.perf_counter() - t0)
    us = best / STEPS * 1e6
    print(f"{label:28s} {us:8.1f} us/invocation")
    return us


def main():
    rng = np.random.RandomState(0)
    # expanded layout: rows = B*K
    pe = jnp.asarray(rng.randn(B * K, N, A), DT)
    qe = jnp.asarray(rng.randn(B * K, A), DT)
    al = jnp.asarray(rng.randn(A, 1), DT)
    me = jnp.ones((B * K, N), jnp.float32)
    ee = jnp.asarray(rng.randn(B * K, N, D), DT)
    # unexpanded layout
    pu = jnp.asarray(rng.randn(B, N, A), DT)
    qu = jnp.asarray(rng.randn(B, K, A), DT)
    mu = jnp.ones((B, N), jnp.float32)
    eu = jnp.asarray(rng.randn(B, N, D), DT)

    # accuracy of pade vs exact
    x = jnp.linspace(-8, 8, 100001)
    err = float(jnp.max(jnp.abs(tanh_pade(x) - jnp.tanh(x))))
    print(f"pade max abs err on [-8,8]: {err:.2e}")

    p1 = jnp.asarray(rng.randn(B, N, A), DT)
    q1 = jnp.asarray(rng.randn(B, A), DT)
    m1 = jnp.ones((B, N), jnp.float32)
    e1 = jnp.asarray(rng.randn(B, N, D), DT)
    which = sys.argv[1:] or ["xla", "xla_unexp", "fused", "vpu", "vpu16",
                             "vpu_beams", "beams"]
    if "k1" in which:
        bench(xla_attn, (p1, q1, al, m1, e1), "xla single-query B=50")
        bench(lambda *a: pallas_attn(make_kernel(tanh_exact), *a),
              (p1, q1, al, m1, e1), "pallas single-query B=50")
        which = []
    if "xla" in which:
        bench(xla_attn, (pe, qe, al, me, ee), "xla expanded")
    if "fused" in which:
        bench(lambda *a: pallas_attn(make_kernel(tanh_exact), *a),
              (pe, qe, al, me, ee), "pallas fused exact-tanh")
    if "notanh" in which:
        bench(lambda *a: pallas_attn(make_kernel(tanh_exact, with_tanh=False), *a),
              (pe, qe, al, me, ee), "pallas fused NO tanh")
    if "pade" in which:
        bench(lambda *a: pallas_attn(make_kernel(tanh_pade), *a),
              (pe, qe, al, me, ee), "pallas fused pade-tanh")
    if "xla_unexp" in which:
        bench(xla_attn_unexp, (pu, qu, al, mu, eu), "xla K-beam unexpanded")
    if "vpu" in which:
        bench(lambda *a: pallas_attn(vpu_kernel, *a),
              (pe, qe, al, me, ee), "pallas vpu-reduce expanded")
    if "vpu16" in which:
        bench(lambda *a: pallas_attn(vpu_kernel, *a, block_b=16),
              (pe, qe, al, me, ee), "pallas vpu-reduce blk16")
    if "vpu_beams" in which:
        bench(lambda *a: pallas_beams(vpu_beams_kernel(tanh_exact), *a),
              (pu, qu, al, mu, eu), "pallas vpu K-beam unexp")
    if "beams" in which:
        bench(lambda *a: pallas_beams(beams_kernel(tanh_exact), *a),
              (pu, qu, al, mu, eu), "pallas K-beam exact-tanh")
    if "beams_pade" in which:
        bench(lambda *a: pallas_beams(beams_kernel(tanh_pade), *a),
              (pu, qu, al, mu, eu), "pallas K-beam pade-tanh")


if __name__ == "__main__":
    main()
