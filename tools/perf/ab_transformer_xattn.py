"""A/B transformer cross-attention decode step: XLA op-chain (current
cross_attend_shared) vs a fused Pallas kernel. Shapes: B=50 images, K=5
beams, S=196 slots, 8 heads x 64. Chained sweep (output feeds next query).
"""
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, S, H, DH = 50, 5, 196, 8, 64
D = H * DH
STEPS = 256
DT = jnp.bfloat16


def xla_cross(q, ck, cv, mask):
    # q: [B*K, D]; ck/cv: [B, S, D]; mask: [B, 1, S] bool
    qh = q.reshape(B, K, H, DH)
    kh = ck.reshape(B, S, H, DH)
    scores = jnp.einsum("bkhd,bshd->bhks", qh, kh) / math.sqrt(DH)
    scores = scores.astype(jnp.float32)
    scores = jnp.where(mask[:, None, :, :], scores, -1e9)
    w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    vh = cv.reshape(B, S, H, DH)
    return jnp.einsum("bhks,bshd->bkhd", w, vh).reshape(B * K, D)


def kern(q_ref, k_ref, v_ref, m_ref, o_ref):
    # (batch, head) folded: q [bh, K, DH]; k/v [bh, S, DH]; m [bh, 1, S]
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    m = m_ref[:, 0, :].astype(jnp.float32)          # [bh, S]
    scale = 1.0 / math.sqrt(DH)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale          # [bh, K, S]
    s = jnp.where(m[:, None, :] > 0, s, -1e9)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    o = jax.lax.dot_general(
        w, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [bh, K, DH]
    o_ref[:] = o.astype(o_ref.dtype)


def kern_vpu(q_ref, k_ref, v_ref, m_ref, o_ref):
    # tiny-M matmuls thrash the MXU issue pipeline (800 per invocation);
    # VPU multiply-reduce streams instead
    q = q_ref[:].astype(jnp.float32)                 # [bh, K, DH]
    k = k_ref[:].astype(jnp.float32)                 # [bh, S, DH]
    v = v_ref[:]
    m = m_ref[:, 0, :].astype(jnp.float32)
    scale = 1.0 / math.sqrt(DH)
    s = jnp.sum(q[:, :, None, :] * k[:, None, :, :], axis=3) * scale
    s = jnp.where(m[:, None, :] > 0, s, -1e9)        # [bh, K, S]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.sum(w[:, :, :, None] * v[:, None, :, :].astype(jnp.float32),
                axis=2)                              # [bh, K, DH]
    o_ref[:] = o.astype(o_ref.dtype)


def pallas_cross_vpu(q, ck, cv, mask, block_b=8):
    qf = q.reshape(B, K, H, DH).transpose(0, 2, 1, 3).reshape(B * H, K, DH)
    kf = ck.reshape(B, S, H, DH).transpose(0, 2, 1, 3).reshape(B * H, S, DH)
    vf = cv.reshape(B, S, H, DH).transpose(0, 2, 1, 3).reshape(B * H, S, DH)
    mf = jnp.broadcast_to(mask.astype(jnp.float32)[:, None, :, :],
                          (B, H, 1, S)).reshape(B * H, 1, S)
    out = pl.pallas_call(
        kern_vpu,
        grid=(pl.cdiv(B * H, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, K, DH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S, DH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S, DH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, K, DH), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, K, DH), q.dtype),
    )(qf, kf, vf, mf)
    return (out.reshape(B, H, K, DH).transpose(0, 2, 1, 3)
            .reshape(B * K, D))


def pallas_cross(q, ck, cv, mask, block_b=40):
    # fold (B, H) into one batch dim; the K/V transpose is loop-invariant
    # in decode (hoisted out of the step loop by XLA)
    qf = q.reshape(B, K, H, DH).transpose(0, 2, 1, 3).reshape(B * H, K, DH)
    kf = ck.reshape(B, S, H, DH).transpose(0, 2, 1, 3).reshape(B * H, S, DH)
    vf = cv.reshape(B, S, H, DH).transpose(0, 2, 1, 3).reshape(B * H, S, DH)
    mf = jnp.broadcast_to(mask.astype(jnp.float32)[:, None, :, :],
                          (B, H, 1, S)).reshape(B * H, 1, S)
    out = pl.pallas_call(
        kern,
        grid=(pl.cdiv(B * H, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, K, DH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S, DH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S, DH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, K, DH), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, K, DH), q.dtype),
    )(qf, kf, vf, mf)
    return (out.reshape(B, H, K, DH).transpose(0, 2, 1, 3)
            .reshape(B * K, D))


def bench(fn, label):
    rng = np.random.RandomState(0)
    q0 = jnp.asarray(rng.randn(B * K, D), DT)
    ck = jnp.asarray(rng.randn(B, S, D), DT)
    cv = jnp.asarray(rng.randn(B, S, D), DT)
    mask = jnp.ones((B, 1, S), bool)

    @jax.jit
    def sweep(q0, ck, cv, mask):
        def body(q, _):
            out = fn(q, ck, cv, mask)
            return out * DT(0.1) + q * DT(0.9), jnp.sum(out[:, :1],
                                                        dtype=jnp.float32)
        _, outs = jax.lax.scan(body, q0, None, length=STEPS)
        return outs

    _ = np.asarray(sweep(q0, ck, cv, mask))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(sweep(q0, ck, cv, mask))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:22s} {best/STEPS*1e6:8.1f} us/invocation")


def main():
    # numerics check
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B * K, D), DT)
    ck = jnp.asarray(rng.randn(B, S, D), DT)
    cv = jnp.asarray(rng.randn(B, S, D), DT)
    mask = jnp.ones((B, 1, S), bool)
    a = np.asarray(xla_cross(q, ck, cv, mask), np.float32)
    b = np.asarray(pallas_cross(q, ck, cv, mask), np.float32)
    print("max abs diff:", float(np.max(np.abs(a - b))))
    c = np.asarray(pallas_cross_vpu(q, ck, cv, mask), np.float32)
    print("vpu max abs diff:", float(np.max(np.abs(a - c))))
    bench(xla_cross, "xla chain")
    bench(pallas_cross, "pallas fused mxu")
    bench(pallas_cross_vpu, "pallas fused vpu")


if __name__ == "__main__":
    main()
