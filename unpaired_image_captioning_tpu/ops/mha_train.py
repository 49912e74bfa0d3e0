"""Fused training-time multi-head attention (Pallas, custom VJP).

Why: the transformer XE step at protocol shapes (6L-512, batch 50, 196-slot
encoder) spends ~1/3 of its 36 ms in [B, 8, 196, 196] f32 softmax / mask /
dropout elementwise+reduce chains, each running 5-7x above its HBM floor
(xplane, tools/perf/prof_train_floor.py TRACE mode) — XLA materializes the
score tensor between every stage and again as an autodiff residual, and the
REMAT_ATTENTION recompute trades it for full matmul recompute (A/B'd worse,
models/transformer.py). At T=S a few hundred, one batch element's whole
attention fits VMEM, so this kernel runs QK^T -> scale -> mask -> softmax
-> dropout -> AV as ONE program per batch element, and the custom VJP
recomputes the tiles in the backward (regenerating the SAME dropout mask
from its seed) instead of saving any [B, h, T, S] residual. Only q, k, v
(and the [B, 1|T, S] additive mask) ever touch HBM.

Head handling — four designs were tried on v5e before this one:
  1. per-head [B, H, T, dh] blocks: the [0,2,1,3] transpose around every
     call costs 551 us per k/v pair per layer (11x its copy floor);
  2. in-kernel lane-splitting reshapes ([T, 128] -> [T, 2, 64]) and
     per-head sliced stores ([T, dh] -> ref[0, :, h, :]): unsupported
     Mosaic shape casts;
  3. 4-D [B, T, H, dh] inputs: the "free" reshape from [B, T, d] is a
     physical tile relayout on TPU (465 us per q/k/v triple per layer);
  4. lane-MASKED full-width dots ((q * mask_h) @ k^T over all d dims —
     exact, zero layout friction — but the 8x MXU overcompute measured
     325 us/layer forward: real money once multiplied by 6 layers x
     fwd+bwd).
The winning form: blocks stay in the natural [B, T|S, d] layout and the
kernel slices each head's [T|S, dh] operands out of the loaded VALUE
(`q[:, h*dh:(h+1)*dh]` — Mosaic lowers 64-offset lane slices of values
fine, verified by probe; it is refs/reshapes that are restricted), runs
proper K=dh dots, and lane-concatenates the per-head outputs for one
full-block store.

Semantics match models/transformer.mha_apply's XLA path at dropout=0 for
bf16 inputs: scores are accumulated in f32 on the MXU then rounded to bf16
(jnp.einsum's bf16 output), scaled by 1/sqrt(dh) in bf16, masked and
softmaxed in f32, and the attention weights are cast to the input dtype
before the AV matmul. f32 inputs skip the rounding (exercised by the
CPU/interpret parity tests). Dropout draws from a stateless splitmix32
hash of (seed, block, element) — a DIFFERENT stream than
jax.random.bernoulli (dropout is stochastic regularization; there is no
parity contract on the mask itself) — deterministic, backend-independent,
and regenerated exactly in the backward.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b, ca, cb):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32)


def _softmax_from_scores(scores, maskadd, *, dh, dtype):
    if dtype == jnp.bfloat16:
        # replicate the XLA path: einsum(bf16, bf16) rounds the f32 MXU
        # accumulator to bf16, and the /sqrt(dh) scale runs in bf16 too
        scores = (scores.astype(jnp.bfloat16)
                  / math.sqrt(dh)).astype(jnp.float32)
    else:
        scores = scores / math.sqrt(dh)
    # where-replace (not add) so masked positions are EXACTLY -1e9 like the
    # XLA core path in models/transformer.mha_apply — identical formulation
    # even for unbounded scores during a divergent run (advisor, round 3)
    scores = jnp.where(maskadd < 0, jnp.float32(-1e9), scores)  # [1|T,S] bcast
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _keep_mask(seed, pid, t, s, rate):
    """Stateless Bernoulli(1-rate) mask from a splitmix32 hash of
    (seed, block id, element index) — pure integer VPU ops, so it runs
    identically on TPU, in interpret mode, and on CPU (the hardware PRNG
    primitives have no interpret lowering), and the backward regenerates
    the exact same mask from the same inputs by construction."""
    base = (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            ^ (jnp.uint32(pid) * jnp.uint32(0x85EBCA6B)))
    idx = (jax.lax.broadcasted_iota(jnp.uint32, (t, s), 0) * s
           + jax.lax.broadcasted_iota(jnp.uint32, (t, s), 1))
    x = base ^ (idx * jnp.uint32(0x2545F491))
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(int(rate * (2.0 ** 32)), 2 ** 32 - 1))
    return x >= thresh


def _head_probs(qh, kh, maskadd, seed, h, *, n_heads, dh, rate, dtype):
    """[T, S] f32 attention for head h; returns (p, attn, keep) where attn
    includes dropout scaling."""
    scores = _dot(qh, kh, 1, 1)                           # q_h @ k_h^T
    p = _softmax_from_scores(scores, maskadd, dh=dh, dtype=dtype)
    if rate > 0.0:
        pid = pl.program_id(0) * n_heads + h
        keep = _keep_mask(seed, pid, qh.shape[0], kh.shape[0], rate)
        return p, jnp.where(keep, p / (1.0 - rate), 0.0), keep
    return p, p, None


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, o_ref, *, n_heads,
                dh, rate, dtype):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]                # [T|S, d]
    maskadd = m_ref[0]
    outs = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        _, attn, _ = _head_probs(q[:, sl], k[:, sl], maskadd, seed_ref[0],
                                 h, n_heads=n_heads, dh=dh, rate=rate,
                                 dtype=dtype)
        outs.append(_dot(attn.astype(dtype), v[:, sl], 1, 0).astype(dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, n_heads, dh, rate, dtype):
    q, k, v, g = q_ref[0], k_ref[0], v_ref[0], g_ref[0]
    maskadd = m_ref[0]
    dqs, dks, dvs = [], [], []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], g[:, sl]
        p, attn, keep = _head_probs(qh, kh, maskadd, seed_ref[0], h,
                                    n_heads=n_heads, dh=dh, rate=rate,
                                    dtype=dtype)
        # dV = attn^T @ g_h (attn cast to `dtype` as in the forward AV)
        dvs.append(_dot(attn.astype(dtype), gh, 0, 0).astype(dtype))
        # dAttn = g_h @ v_h^T, back through dropout, then softmax
        dattn = _dot(gh, vh, 1, 1)                        # [T, S] f32
        if keep is not None:
            dattn = jnp.where(keep, dattn / (1.0 - rate), 0.0)
        ds = p * (dattn - jnp.sum(dattn * p, axis=-1, keepdims=True))
        # exact where-replace VJP: masked scores get ZERO gradient (for a
        # fully-masked row p is uniform and ds would otherwise be nonzero)
        ds = jnp.where(maskadd < 0, 0.0, ds)
        dsd = (ds / math.sqrt(dh)).astype(dtype)
        dqs.append(_dot(dsd, kh, 1, 0).astype(dtype))     # [T, dh]
        dks.append(_dot(dsd, qh, 0, 0).astype(dtype))     # [S, dh]
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)
    dk_ref[0] = jnp.concatenate(dks, axis=-1)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1)


def _call(kernel, q, k, v, maskadd, seed, g, n_outs, *, n_heads, rate,
          interpret):
    b, t, d = q.shape
    s = k.shape[1]
    dh = d // n_heads
    # index maps take (*grid_ids, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — hence the trailing *_
    qspec = pl.BlockSpec((1, t, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, s, d), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, maskadd.shape[1], s), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec, kvspec, mspec]
    args = [q, k, v, maskadd]
    if g is not None:
        in_specs.append(qspec)
        args.append(g)
    if n_outs == 1:
        out_shape = jax.ShapeDtypeStruct((b, t, d), q.dtype)
        out_specs = qspec
    else:
        out_shape = (jax.ShapeDtypeStruct((b, t, d), q.dtype),
                     jax.ShapeDtypeStruct((b, s, d), q.dtype),
                     jax.ShapeDtypeStruct((b, s, d), q.dtype))
        out_specs = (qspec, kvspec, kvspec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        functools.partial(kernel, n_heads=n_heads, dh=dh, rate=rate,
                          dtype=q.dtype),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(seed, *args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_mha_train(q, k, v, maskadd, seed, n_heads: int, rate: float,
                    interpret: bool = False):
    """q [B,T,d] (already q-projected), k/v [B,S,d] (projected), maskadd
    [B, 1|T, S] f32 additive mask (0.0 keep / -1e9 drop), seed [1] int32.
    Returns the merged-head attention output [B, T, d] in q.dtype; the
    output projection stays outside. Natural layouts in and out — no head
    transposes or reshapes anywhere."""
    out, _ = _mha_fwd(q, k, v, maskadd, seed, n_heads, rate, interpret)
    return out


def _mha_fwd(q, k, v, maskadd, seed, n_heads, rate, interpret):
    out = _call(_fwd_kernel, q, k, v, maskadd, seed, None, 1,
                n_heads=n_heads, rate=rate, interpret=interpret)
    return out, (q, k, v, maskadd, seed)


def _mha_bwd(n_heads, rate, interpret, res, g):
    q, k, v, maskadd, seed = res
    dq, dk, dv = _call(_bwd_kernel, q, k, v, maskadd, seed,
                       g.astype(q.dtype), 3,
                       n_heads=n_heads, rate=rate, interpret=interpret)
    return dq, dk, dv, jnp.zeros_like(maskadd), jnp.zeros_like(seed)


fused_mha_train.defvjp(_mha_fwd, _mha_bwd)


def mha_kernel_ok(n_heads: int, d: int, t: int, s: int) -> bool:
    """Routing guard: one [T, S] f32 score tile (plus the [T|S, d] operand
    tiles) per head must fit VMEM comfortably; head width must be a
    sublane-clean lane-slice.

    Small-tile floor (round 5): when BOTH dims are tiny the per-program
    overhead outweighs the fused-chain savings and XLA's batched-across-B
    formulation wins — measured on the NMT transformer (17x16/16x16
    tiles): pure XLA 1.2x faster than the kernel across five paired
    orderings (tools/perf/prof_train_nmt_transformer.py). The caption
    decoder's 17x196 cross tiles stay net-positive
    (tools/perf/ab_dec_mha.py), so the cut is max(t, s) >= 64."""
    if d % n_heads:
        return False
    dh = d // n_heads
    tile = t * s * 4 + 6 * max(t, s) * d * 4
    return (dh % 8 == 0 and tile <= 8 * 1024 * 1024
            and 64 <= max(t, s) <= 1024)
