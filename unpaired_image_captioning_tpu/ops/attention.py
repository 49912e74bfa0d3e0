"""Fused additive attention kernels (OPT-IN — see models/att.py flags).

The reference's Attention (AttModel.py:529-558) computes
`alpha_net(tanh(p_att + h2att(h)))` → softmax → masked renormalize →
weighted sum. These Pallas kernels fuse score computation, masked softmax,
and the weighted sum into one VMEM-resident pass.

Round-2 status: a sequential-dependency microbench on v5e (512 chained
invocations in ONE dispatch, so the ~23 ms tunnel RTT cannot swamp the
comparison) shows current XLA fuses this op BETTER than these kernels:
at B=50/K=3/N=196/A=D=512 the XLA einsum runs 80 us/invocation vs 105 us
(single-query kernel) / 186 us (expanded) / 198 us (K-unrolled beams
kernel). The kernels materialize f32 intermediates between VPU passes and
MXU calls; XLA streams convert+add+tanh into the reducing matmul. tanh is
not the bottleneck (a no-tanh kernel variant measures the same). The
production decode therefore uses the XLA path on the UNEXPANDED beam
layout (models/att.py attention_apply, beam_ctx_no_expand); the kernels
stay available behind att.SINGLE_KERNEL / att.BEAMS_KERNEL for re-A/B on
future shapes or compiler versions.

Semantics notes: the alpha_net bias is dropped (softmax is shift-invariant)
and the mask uses the reference's multiply-then-renormalize form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_attention(p_att, att_h, alpha, mask, att_emb):
    """XLA reference semantics (used as the custom-VJP backward)."""
    dot = jnp.tanh(p_att.astype(jnp.float32) + att_h.astype(jnp.float32)[:, None, :])
    scores = jnp.einsum("bna,ao->bno", dot, alpha.astype(jnp.float32))[..., 0]
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores) * mask.astype(jnp.float32)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    out = jnp.einsum("bn,bnd->bd", w, att_emb.astype(jnp.float32))
    return out.astype(att_emb.dtype)


def _fused_attention_kernel(p_att_ref, att_h_ref, alpha_ref, mask_ref,
                            emb_ref, out_ref):
    p_att = p_att_ref[:].astype(jnp.float32)        # [BB, N, A]
    att_h = att_h_ref[:].astype(jnp.float32)        # [BB, A]
    dot = jnp.tanh(p_att + att_h[:, None, :])
    scores = jax.lax.dot_general(
        dot, alpha_ref[:].astype(jnp.float32),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[..., 0]  # [BB, N]
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores) * mask_ref[:].astype(jnp.float32)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    emb = emb_ref[:].astype(jnp.float32)             # [BB, N, D]
    out = jax.lax.dot_general(
        w[:, None, :], emb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]
    out_ref[:] = out.astype(out_ref.dtype)


def _fused_attention_beams_kernel(p_att_ref, att_h_ref, alpha_ref, mask_ref,
                                  emb_ref, out_ref, *, beams: int):
    """K-beam variant: p_att/emb are read once per image block; the K beam
    queries loop inside the kernel (everything stays in VMEM)."""
    p_att = p_att_ref[:].astype(jnp.float32)         # [BB, N, A]
    emb = emb_ref[:].astype(jnp.float32)             # [BB, N, D]
    mask = mask_ref[:].astype(jnp.float32)           # [BB, N]
    alpha = alpha_ref[:].astype(jnp.float32)         # [A, 1]
    for k in range(beams):                            # static unroll
        att_h = att_h_ref[:, k].astype(jnp.float32)  # [BB, A]
        dot = jnp.tanh(p_att + att_h[:, None, :])
        scores = jax.lax.dot_general(
            dot, alpha, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., 0]
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        w = jnp.exp(scores) * mask
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
        out = jax.lax.dot_general(
            w[:, None, :], emb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]
        out_ref[:, k] = out.astype(out_ref.dtype)


def _reference_attention_beams(p_att, att_h, alpha, mask, att_emb):
    dot = jnp.tanh(p_att.astype(jnp.float32)[:, None]
                   + att_h.astype(jnp.float32)[:, :, None, :])
    scores = jnp.einsum("bkna,ao->bkno", dot, alpha.astype(jnp.float32))[..., 0]
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores) * mask.astype(jnp.float32)[:, None, :]
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    out = jnp.einsum("bkn,bnd->bkd", w, att_emb.astype(jnp.float32))
    return out.astype(att_emb.dtype)


@functools.lru_cache(maxsize=None)
def _make_fused_attention_beams_vjp(block_b: int, interpret: bool):
    @jax.custom_vjp
    def attn(p_att, att_h, alpha, mask, att_emb):
        return _fused_attention_beams_pallas(p_att, att_h, alpha, mask,
                                             att_emb, block_b=block_b,
                                             interpret=interpret)

    def fwd(*args):
        return attn(*args), args

    def bwd(res, ct):
        _, vjp = jax.vjp(_reference_attention_beams, *res)
        return vjp(ct)

    attn.defvjp(fwd, bwd)
    return attn


def fused_additive_attention_beams(p_att, att_h, alpha, mask, att_emb, *,
                                   block_b: int = 8, interpret: bool = False):
    """p_att: [B, N, A]; att_h: [B, K, A] (beam queries); mask: [B, N];
    att_emb: [B, N, D] -> [B, K, D]. Differentiable via custom VJP."""
    return _make_fused_attention_beams_vjp(block_b, interpret)(
        p_att, att_h, alpha, mask, att_emb)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _fused_attention_beams_pallas(p_att, att_h, alpha, mask, att_emb, *,
                                  block_b: int = 8, interpret: bool = False):
    b, n, a = p_att.shape
    k = att_h.shape[1]
    d = att_emb.shape[-1]
    kern = functools.partial(_fused_attention_beams_kernel, beams=k)
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(b, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, n, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, k, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, k, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, d), att_emb.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n * (a + d),
            bytes_accessed=(b * n * (a + d) + b * k * (a + d)) * 2,
            transcendentals=b * k * n * a,
        ),
    )(p_att, att_h, alpha, mask, att_emb)


@functools.lru_cache(maxsize=None)
def _make_fused_attention_vjp(block_b: int, interpret: bool):
    """Pallas forward + XLA-reference backward (SCST differentiates
    through decode-time attention)."""

    @jax.custom_vjp
    def attn(p_att, att_h, alpha, mask, att_emb):
        return _fused_attention_pallas(p_att, att_h, alpha, mask, att_emb,
                                       block_b=block_b, interpret=interpret)

    def fwd(*args):
        return attn(*args), args

    def bwd(res, ct):
        _, vjp = jax.vjp(_reference_attention, *res)
        return vjp(ct)

    attn.defvjp(fwd, bwd)
    return attn


def fused_additive_attention(p_att, att_h, alpha, mask, att_emb, *,
                             block_b: int = 8, interpret: bool = False):
    """p_att: [B, N, A]; att_h: [B, A]; alpha: [A, 1] (alpha_net weight);
    mask: [B, N] (1s if None upstream); att_emb: [B, N, D] -> [B, D].
    Differentiable (custom VJP via the XLA reference)."""
    return _make_fused_attention_vjp(block_b, interpret)(
        p_att, att_h, alpha, mask, att_emb)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _fused_attention_pallas(p_att, att_h, alpha, mask, att_emb, *,
                            block_b: int = 8, interpret: bool = False):
    b, n, a = p_att.shape
    d = att_emb.shape[-1]
    grid = (pl.cdiv(b, block_b),)
    return pl.pallas_call(
        _fused_attention_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, n, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, a), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), att_emb.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (a + d),
            bytes_accessed=(b * n * (a + d) + b * (a + d)) * 2,
            transcendentals=b * n * a,
        ),
    )(p_att, att_h, alpha, mask, att_emb)


# ---------------------------------------------------------------------------
# step-fused attention pair for the Stack/Dense cores
# ---------------------------------------------------------------------------

def _att_lstm_att_kernel(p_att_ref, emb_ref, mask_ref, q1_ref, h0_ref,
                         h1p_ref, c1p_ref, w1_ref, b1_ref, emb2_ref,
                         emb2_b_ref, h2att2_ref, h2att2_b_ref,
                         alpha1_ref, alpha2_ref,
                         h1_out, c1_out, att2_out, *, hidden: int):
    """att1 -> maxout lstm1 -> att2 with the attention memory read ONCE.

    Decode-path fusion for StackAtt/DenseAtt cores (att1 feeds lstm1 whose
    hidden forms att2's query, AttModel.py:478-486/:518-526): profiling
    shows the two separate attention kernels dominate beam decode; keeping
    p_att/emb resident in VMEM across both halves removes one full read of
    the [B, N, A] + [B, N, D] memories per step.
    """
    p_att = p_att_ref[:].astype(jnp.float32)        # [BB, N, A]
    emb = emb_ref[:].astype(jnp.float32)            # [BB, N, D]
    mask = mask_ref[:].astype(jnp.float32)          # [BB, N]

    def attend(q, alpha):                            # q: [BB, A]
        dot = jnp.tanh(p_att + q[:, None, :])
        scores = jax.lax.dot_general(
            dot, alpha.astype(jnp.float32),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., 0]
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        w = jnp.exp(scores) * mask
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
        return jax.lax.dot_general(
            w[:, None, :], emb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]

    att1 = attend(q1_ref[:].astype(jnp.float32), alpha1_ref[:])

    # maxout lstm1: rows of w1 = [h0 | att1 | h1_prev]
    h0 = h0_ref[:].astype(jnp.float32)
    xh = jnp.concatenate([h0, att1, h1p_ref[:].astype(jnp.float32)], axis=-1)
    gates = jnp.dot(xh, w1_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32) + b1_ref[:].astype(jnp.float32)
    sig = jax.nn.sigmoid(gates[..., : 3 * hidden])
    in_t = jnp.maximum(gates[..., 3 * hidden: 4 * hidden],
                       gates[..., 4 * hidden: 5 * hidden])
    c1 = sig[..., hidden: 2 * hidden] * c1p_ref[:].astype(jnp.float32) \
        + sig[..., : hidden] * in_t
    h1 = sig[..., 2 * hidden: 3 * hidden] * jnp.tanh(c1)

    # att2 query: h2att2(h1 + emb2(att1)) — biases included (they sit
    # inside the tanh, not softmax-shift-invariant)
    q2_in = h1 + jnp.dot(att1, emb2_ref[:].astype(jnp.float32),
                         preferred_element_type=jnp.float32) \
        + emb2_b_ref[:].astype(jnp.float32)
    q2 = jnp.dot(q2_in, h2att2_ref[:].astype(jnp.float32),
                 preferred_element_type=jnp.float32) \
        + h2att2_b_ref[:].astype(jnp.float32)
    att2 = attend(q2, alpha2_ref[:])

    h1_out[:] = h1.astype(h1_out.dtype)
    c1_out[:] = c1.astype(c1_out.dtype)
    att2_out[:] = att2.astype(att2_out.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_att_lstm_att(p_att, att_emb, mask, q1, h0d, h1_prev, c1_prev,
                       w1, b1, emb2_w, emb2_b, h2att2_w, h2att2_b,
                       alpha1, alpha2, *,
                       block_b: int = 8, interpret: bool = False):
    """Decode-path fusion (eval only — dropout-free). Returns
    (h1, c1, att2_res); see _att_lstm_att_kernel."""
    b, n, a = p_att.shape
    d = att_emb.shape[-1]
    hidden = h1_prev.shape[-1]
    kern = functools.partial(_att_lstm_att_kernel, hidden=hidden)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    out_shape = (jax.ShapeDtypeStruct((b, hidden), h1_prev.dtype),
                 jax.ShapeDtypeStruct((b, hidden), c1_prev.dtype),
                 jax.ShapeDtypeStruct((b, d), att_emb.dtype))
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(b, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, n, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, a), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, h0d.shape[-1]), row,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), row, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[1],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(emb2_w.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(emb2_b.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(h2att2_w.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(h2att2_b.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(alpha1.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(alpha2.shape, full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, hidden), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d), row, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (2 * n * (a + d) + xh_flops(w1) + a * a + d * a),
            bytes_accessed=(b * n * (a + d)) * 2 + w1.size * 2,
            transcendentals=2 * b * n * a,
        ),
    )(p_att, att_emb, mask, q1, h0d, h1_prev, c1_prev, w1, b1, emb2_w,
      emb2_b, h2att2_w, h2att2_b, alpha1, alpha2)


def xh_flops(w1):
    return w1.shape[0] * w1.shape[1]
