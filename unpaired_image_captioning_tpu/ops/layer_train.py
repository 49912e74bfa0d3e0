"""Fused training-time transformer ENCODER layer (Pallas, custom VJP).

VERDICT r3 Next #6: after the fused training MHA (ops/mha_train.py) the
batch-50 XE step still spends most of its ~26 ms in per-op overheads around
the encoder stack — LayerNorm forward stats + the 3-4 split backward fusions
per norm (~5 ms), the q/k/v/o + FFN projection fusions each 2x over floor
(~1.8 ms), residual/dropout elementwise fusions (~1.5 ms enc share), and 36
separate dW matmul fusions (~1.7 ms). A standalone fused-LN kernel was A/B'd
net-zero: every op it removed came back as per-call overhead + lost neighbor
fusions. The layer is small enough that the only structure that wins is ONE
program per (batch element, layer): this kernel runs
    LN1 -> packed-QKV projection -> 8-head softmax(QK^T/sqrt dh)·V with
    attention dropout -> O projection -> residual dropout+add -> LN2 ->
    FFN (w1/relu/dropout/w2) -> residual dropout+add
entirely in VMEM, with a custom VJP split into TWO backward programs (an
FFN half and an attention half, so each stays inside the ~16 MB VMEM
budget with its f32 weight-gradient accumulators). Weight gradients are
accumulated across the sequential batch grid in f32 output refs; dropout
masks are regenerated in the backward from the same splitmix32 hash
(ops/mha_train._keep_mask) instead of being saved — only x, x2 (the
post-attention residual stream) and the packed weights ever touch HBM.

Semantics: exactly models/transformer.py's encoder sublayer sequence
(reference TransformerModel.py:106-141 SublayerConnection/EncoderLayer with
pre-norm, dropout on each sublayer output, and PositionwiseFeedForward's
internal dropout), with the same bf16 cast points as the XLA path
(f32 MXU accumulation rounded to bf16 per dot, f32 LN and softmax).
The q/k/v projections run as ONE [T,d]x[d,3d] MXU dot (weights packed by
the caller, models/transformer.enc_layer_apply). Dropout draws from the
stateless splitmix32 hash stream (a DIFFERENT stream than
jax.random.bernoulli — stochastic regularization carries no parity
contract), deterministic per (seed, element, site, head) and regenerated
exactly in the backward. Parity + gradient tests: tests/test_layer_train.py.

Rejected variant (tools/perf/ab_layer_bb.py): blocking bb batch elements
per grid step to amortize per-step fixed cost was A/B'd in-process at the
protocol batch (50x16, 6 layers) and came out NET-ZERO — 43.8k tokens/s
both ways; the per-grid-step overhead is already hidden behind the
accumulator read-modify-write, and the unrolled multi-element body costs
what it saves. Keep the one-element grid.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mha_train import _dot, _keep_mask, _softmax_from_scores

_EPS = 1e-6
# dropout site ids within one (layer, element) program: attention probs
# (per head), post-attention residual, FFN-internal, post-FFN residual
_N_SITES = 4


def _ln(x, scale, offset):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    n = x32.shape[-1]
    var = jnp.sum(jnp.square(x32 - mean), axis=-1, keepdims=True) / (n - 1)
    s = jnp.sqrt(var) + _EPS
    xhat = (x32 - mean) / s
    y = xhat * scale.astype(jnp.float32) + offset.astype(jnp.float32)
    return y.astype(x.dtype), xhat, s, var


def _ln_bwd(dy32, xhat, s, var, scale, n):
    """d/dx of _ln given upstream dy (f32): the unbiased-variance,
    eps-outside-sqrt formula's exact VJP."""
    dxhat = dy32 * scale.astype(jnp.float32)
    xm = xhat * s
    dvar = (jnp.sum(dxhat * xm, axis=-1, keepdims=True)
            * (-1.0 / (s * s)) * (0.5 / jnp.sqrt(var)))
    dmean = -jnp.sum(dxhat, axis=-1, keepdims=True) / s
    dx = dxhat / s + dvar * (2.0 / (n - 1)) * xm + dmean / n
    dls = jnp.sum(dy32 * xhat, axis=0, keepdims=True)     # [1, d]
    dlb = jnp.sum(dy32, axis=0, keepdims=True)
    return dx, dls, dlb


def _linear(a, w, b, dtype):
    y = _dot(a, w, 1, 0).astype(dtype)
    return y + b[0].astype(dtype)


def _drop(x, seed, pid, rate):
    if rate <= 0.0:
        return x, None
    keep = _keep_mask(seed, pid, x.shape[0], x.shape[1], rate)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype), keep


def _site(site, h, n_heads):
    return (pl.program_id(0) * _N_SITES + site) * n_heads + h


def _attention_kv(q, k, v, maskadd, seed, *, n_heads, d, rate, dtype):
    """Per-head softmax attention: q [T, d] against k/v [S, d] values.
    Returns (out [T, d], per-head (p, keep, slices) for the backward)."""
    dh = d // n_heads
    outs, saved = [], []
    for h in range(n_heads):
        q_h = q[:, h * dh:(h + 1) * dh]
        k_h = k[:, h * dh:(h + 1) * dh]
        v_h = v[:, h * dh:(h + 1) * dh]
        scores = _dot(q_h, k_h, 1, 1)
        p = _softmax_from_scores(scores, maskadd, dh=dh, dtype=dtype)
        if rate > 0.0:
            keep = _keep_mask(seed, _site(0, h, n_heads), q_h.shape[0],
                              k_h.shape[0], rate)
            attn = jnp.where(keep, p / (1.0 - rate), 0.0)
        else:
            keep, attn = None, p
        outs.append(_dot(attn.astype(dtype), v_h, 1, 0).astype(dtype))
        saved.append((p, keep, q_h, k_h, v_h))
    return jnp.concatenate(outs, axis=-1), saved


def _attention(qkv, maskadd, seed, *, n_heads, d, rate, dtype):
    """Per-head softmax attention over the packed [T, 3d] qkv value."""
    return _attention_kv(qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:],
                         maskadd, seed, n_heads=n_heads, d=d, rate=rate,
                         dtype=dtype)


def _fwd_kernel(seed_ref, x_ref, m_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, l1s_ref, l1b_ref, l2s_ref,
                l2b_ref, o_ref, x2_ref, *, n_heads, rate, dtype):
    x = x_ref[0]                                          # [T, d]
    d = x.shape[-1]
    seed = seed_ref[0]
    y1, _, _, _ = _ln(x, l1s_ref[0], l1b_ref[0])
    qkv = _linear(y1, wqkv_ref[...], bqkv_ref, dtype)     # [T, 3d]
    ao, _ = _attention(qkv, m_ref[0], seed, n_heads=n_heads, d=d,
                       rate=rate, dtype=dtype)
    o = _linear(ao, wo_ref[...], bo_ref, dtype)
    od, _ = _drop(o, seed, _site(1, 0, n_heads), rate)
    x2 = x + od
    y2, _, _, _ = _ln(x2, l2s_ref[0], l2b_ref[0])
    hpre = jax.nn.relu(_linear(y2, w1_ref[...], b1_ref, dtype))
    hd, _ = _drop(hpre, seed, _site(2, 0, n_heads), rate)
    f = _linear(hd, w2_ref[...], b2_ref, dtype)
    fd, _ = _drop(f, seed, _site(3, 0, n_heads), rate)
    o_ref[0] = x2 + fd
    x2_ref[0] = x2


def _acc(ref, val):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        ref[...] = val

    @pl.when(pl.program_id(0) != 0)
    def _add():
        ref[...] += val


def _bwd_ffn_kernel(seed_ref, x2_ref, g_ref, w1_ref, b1_ref, w2_ref,
                    l2s_ref, l2b_ref,
                    dx2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dl2s_ref, dl2b_ref, *, n_heads, rate, dtype):
    """FFN + LN2 half: out = x2 + drop(w2 @ drop(relu(w1 @ LN2(x2))));
    consumes g = d(out), emits the full d(x2) (residual path included)."""
    x2, g = x2_ref[0], g_ref[0]
    n = x2.shape[-1]
    seed = seed_ref[0]
    y2, xhat2, s2, var2 = _ln(x2, l2s_ref[0], l2b_ref[0])
    hlin = _linear(y2, w1_ref[...], b1_ref, dtype)
    hpre = jax.nn.relu(hlin)
    hd, keep2 = _drop(hpre, seed, _site(2, 0, n_heads), rate)
    g32 = g.astype(jnp.float32)
    if rate > 0.0:
        keep3 = _keep_mask(seed, _site(3, 0, n_heads), g.shape[0],
                           g.shape[1], rate)
        df = jnp.where(keep3, g32 / (1.0 - rate), 0.0)
    else:
        df = g32
    dfc = df.astype(dtype)
    _acc(dw2_ref, _dot(hd, dfc, 0, 0))                    # [f, d] f32
    _acc(db2_ref, jnp.sum(df, axis=0, keepdims=True))
    dhd = _dot(dfc, w2_ref[...], 1, 1).astype(jnp.float32)  # [T, f]
    if keep2 is not None:
        dhd = jnp.where(keep2, dhd / (1.0 - rate), 0.0)
    # compare in f32: Mosaic on v5e rejects bf16 comparisons
    # ("Target does not support this comparison")
    dlin = jnp.where(hlin.astype(jnp.float32) > 0, dhd, 0.0)
    dlinc = dlin.astype(dtype)
    _acc(dw1_ref, _dot(y2, dlinc, 0, 0))                  # [d, f] f32
    _acc(db1_ref, jnp.sum(dlin, axis=0, keepdims=True))
    dy2 = _dot(dlinc, w1_ref[...], 1, 1).astype(jnp.float32)
    dx2_ln, dl2s, dl2b = _ln_bwd(dy2, xhat2, s2, var2, l2s_ref[0], n)
    _acc(dl2s_ref, dl2s)
    _acc(dl2b_ref, dl2b)
    dx2_ref[0] = (g32 + dx2_ln).astype(dx2_ref.dtype)


def _bwd_attn_kernel(seed_ref, x_ref, m_ref, g2_ref, wqkv_ref, bqkv_ref,
                     wo_ref, l1s_ref, l1b_ref,
                     dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                     dl1s_ref, dl1b_ref, *, n_heads, rate, dtype):
    """Attention + LN1 half: x2 = x + drop(Wo @ attn(Wqkv @ LN1(x)));
    consumes g2 = d(x2) from the FFN half, emits d(x)."""
    x, g2 = x_ref[0], g2_ref[0]
    d = x.shape[-1]
    dh = d // n_heads
    n = d
    seed = seed_ref[0]
    y1, xhat1, s1, var1 = _ln(x, l1s_ref[0], l1b_ref[0])
    qkv = _linear(y1, wqkv_ref[...], bqkv_ref, dtype)
    ao, saved = _attention(qkv, m_ref[0], seed, n_heads=n_heads, d=d,
                           rate=rate, dtype=dtype)
    g232 = g2.astype(jnp.float32)
    if rate > 0.0:
        keep1 = _keep_mask(seed, _site(1, 0, n_heads), g2.shape[0],
                           g2.shape[1], rate)
        do = jnp.where(keep1, g232 / (1.0 - rate), 0.0)
    else:
        do = g232
    doc = do.astype(dtype)
    _acc(dwo_ref, _dot(ao, doc, 0, 0))                    # [d, d] f32
    _acc(dbo_ref, jnp.sum(do, axis=0, keepdims=True))
    dao = _dot(doc, wo_ref[...], 1, 1).astype(dtype)      # [T, d]
    dqs, dks, dvs = [], [], []
    for h in range(n_heads):
        p, keep, q_h, k_h, v_h = saved[h]
        gh = dao[:, h * dh:(h + 1) * dh]
        attn = (jnp.where(keep, p / (1.0 - rate), 0.0)
                if keep is not None else p)
        dvs.append(_dot(attn.astype(dtype), gh, 0, 0).astype(dtype))
        dattn = _dot(gh, v_h, 1, 1)                       # [T, S] f32
        if keep is not None:
            dattn = jnp.where(keep, dattn / (1.0 - rate), 0.0)
        ds = p * (dattn - jnp.sum(dattn * p, axis=-1, keepdims=True))
        # exact where-replace VJP: masked scores get ZERO gradient (for a
        # fully-masked row p is uniform and ds would otherwise be nonzero)
        ds = jnp.where(m_ref[0] < 0, 0.0, ds)
        dsd = (ds / math.sqrt(dh)).astype(dtype)
        dqs.append(_dot(dsd, k_h, 1, 0).astype(dtype))
        dks.append(_dot(dsd, q_h, 0, 0).astype(dtype))
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)      # [T, 3d]
    _acc(dwqkv_ref, _dot(y1, dqkv, 0, 0))                 # [d, 3d] f32
    _acc(dbqkv_ref, jnp.sum(dqkv.astype(jnp.float32), axis=0,
                            keepdims=True))
    dy1 = _dot(dqkv, wqkv_ref[...], 1, 1).astype(jnp.float32)
    dx_ln, dl1s, dl1b = _ln_bwd(dy1, xhat1, s1, var1, l1s_ref[0], n)
    _acc(dl1s_ref, dl1s)
    _acc(dl1b_ref, dl1b)
    dx_ref[0] = (g232 + dx_ln).astype(dx_ref.dtype)


def _const(shape):
    # index maps take (*grid_ids, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — hence the trailing *_
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, *_: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _row(t, d):
    return pl.BlockSpec((1, t, d), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17))
def fused_enc_layer(x, maskadd, seed, wqkv, bqkv, wo, bo, w1, b1, w2, b2,
                    l1s, l1b, l2s, l2b, n_heads: int, rate: float,
                    interpret: bool = False):
    """One pre-norm transformer encoder layer, training semantics.

    x [B, T, d]; maskadd [B, 1|T, T] f32 additive (0 keep / -1e9 drop);
    seed [1] int32; wqkv [d, 3d] (q|k|v packed on the output axis) + bqkv
    [3d]; wo [d, d] + bo [d]; w1 [d, f] + b1 [f]; w2 [f, d] + b2 [d];
    l1s/l1b/l2s/l2b [d] LayerNorm params. Returns [B, T, d] in x.dtype."""
    out, _ = _layer_fwd(x, maskadd, seed, wqkv, bqkv, wo, bo, w1, b1, w2,
                        b2, l1s, l1b, l2s, l2b, n_heads, rate, interpret)
    return out


def _layer_fwd(x, maskadd, seed, wqkv, bqkv, wo, bo, w1, b1, w2, b2,
               l1s, l1b, l2s, l2b, n_heads, rate, interpret):
    b, t, d = x.shape
    f = w1.shape[1]
    vec = [bqkv.reshape(1, -1), bo.reshape(1, -1), b1.reshape(1, -1),
           b2.reshape(1, -1), l1s.reshape(1, -1), l1b.reshape(1, -1),
           l2s.reshape(1, -1), l2b.reshape(1, -1)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[_row(t, d),
                  pl.BlockSpec((1, maskadd.shape[1], t),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  _const(wqkv.shape), _const((1, 3 * d)),
                  _const(wo.shape), _const((1, d)),
                  _const(w1.shape), _const((1, f)),
                  _const(w2.shape), _const((1, d)),
                  _const((1, d)), _const((1, d)),
                  _const((1, d)), _const((1, d))],
        out_specs=(_row(t, d), _row(t, d)),
    )
    out, x2 = pl.pallas_call(
        functools.partial(_fwd_kernel, n_heads=n_heads, rate=rate,
                          dtype=x.dtype),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct((b, t, d), x.dtype)),
        interpret=interpret,
    )(seed, x, maskadd, wqkv, *vec[:1], wo, *vec[1:2], w1, *vec[2:3],
      w2, *vec[3:4], *vec[4:])
    return out, (x, maskadd, seed, wqkv, bqkv, wo, bo, w1, b1, w2, b2,
                 l1s, l1b, l2s, l2b, x2)


def _layer_bwd(n_heads, rate, interpret, res, g):
    (x, maskadd, seed, wqkv, bqkv, wo, bo, w1, b1, w2, b2,
     l1s, l1b, l2s, l2b, x2) = res
    b, t, d = x.shape
    f = w1.shape[1]
    ffn_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[_row(t, d), _row(t, d),
                  _const(w1.shape), _const((1, f)), _const(w2.shape),
                  _const((1, d)), _const((1, d))],
        out_specs=(_row(t, d), _const(w1.shape), _const((1, f)),
                   _const(w2.shape), _const((1, d)), _const((1, d)),
                   _const((1, d))),
    )
    dx2, dw1, db1, dw2, db2, dl2s, dl2b = pl.pallas_call(
        functools.partial(_bwd_ffn_kernel, n_heads=n_heads, rate=rate,
                          dtype=x.dtype),
        grid_spec=ffn_spec,
        out_shape=(jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct(w1.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, f), jnp.float32),
                   jax.ShapeDtypeStruct(w2.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        interpret=interpret,
    )(seed, x2, g.astype(x.dtype), w1, b1.reshape(1, -1), w2,
      l2s.reshape(1, -1), l2b.reshape(1, -1))
    attn_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[_row(t, d),
                  pl.BlockSpec((1, maskadd.shape[1], t),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  _row(t, d),
                  _const(wqkv.shape), _const((1, 3 * d)),
                  _const(wo.shape), _const((1, d)), _const((1, d))],
        out_specs=(_row(t, d), _const(wqkv.shape), _const((1, 3 * d)),
                   _const(wo.shape), _const((1, d)), _const((1, d)),
                   _const((1, d))),
    )
    dx, dwqkv, dbqkv, dwo, dbo, dl1s, dl1b = pl.pallas_call(
        functools.partial(_bwd_attn_kernel, n_heads=n_heads, rate=rate,
                          dtype=x.dtype),
        grid_spec=attn_spec,
        out_shape=(jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
                   jax.ShapeDtypeStruct(wo.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        interpret=interpret,
    )(seed, x, maskadd, dx2, wqkv, bqkv.reshape(1, -1), wo,
      l1s.reshape(1, -1), l1b.reshape(1, -1))

    def _w(gr, like):
        return gr.reshape(like.shape).astype(like.dtype)

    # each bias cotangent is cast with its OWN primal as the template so a
    # mixed-dtype param tree (f32 biases under bf16 activations) keeps f32
    # gradients (ADVICE r4)
    return (dx, jnp.zeros_like(maskadd), jnp.zeros_like(seed),
            _w(dwqkv, wqkv), _w(dbqkv, bqkv), _w(dwo, wo), _w(dbo, bo),
            _w(dw1, w1), _w(db1, b1), _w(dw2, w2), _w(db2, b2),
            _w(dl1s, l1s), _w(dl1b, l1b), _w(dl2s, l2s), _w(dl2b, l2b))


fused_enc_layer.defvjp(_layer_fwd, _layer_bwd)


def enc_layer_kernel_ok(n_heads: int, d: int, f: int, t: int) -> bool:
    """Routing guard: head width must be a sublane-clean lane slice, and
    the resident weights + f32 weight-grad accumulators + per-element
    temporaries must fit the ~16 MB VMEM budget. The temps estimate
    includes the backward attention half's per-head saved tensors held
    live across the head loop — n_heads [T,T] f32 softmax probs + keep
    masks plus the q/k/v head slices and their gradient lists (ADVICE
    r4) — so an over-budget shape falls back to the XLA path cleanly
    instead of failing the Mosaic compile. Cap calibrated so the
    measured-working protocol shape (8 heads, d=512, f=512, T=196,
    ~14.1 MiB by this estimate) keeps routing."""
    if d % n_heads or (d // n_heads) % 8 or d % 128 or f % 128:
        return False
    # d_ff > d_model is out of the kernel's validated envelope: the FFN
    # backward half's f32 dW1/dW2 accumulators are 2*d*f*4 bytes on top of
    # the resident weights, and at d_ff=2048 the chip measured a 16.34M
    # scoped-vmem OOM (round-5 NMT-transformer train A/B) while this
    # estimate still predicted ~14.6M — the linear model undercounts the
    # FFN half, so reject the regime instead of re-tuning the cap.
    if f > d:
        return False
    weights = (3 * d * d + d * d + 2 * d * f) * 2          # bf16 resident
    grads = max((3 * d * d + d * d) * 4, 2 * d * f * 4)    # larger bwd half
    temps = t * (3 * d + 2 * f + 4 * d) * 4 + t * t * 4
    saved = n_heads * t * t * 8 + 3 * t * d * 4            # bwd head loop
    return (weights + grads + temps + saved <= 15 * 1024 * 1024
            and t <= 512)


# ---------------------------------------------------------------------------
# Fused DECODER layer (self-attn + cross-attn + FFN sublayers)
# ---------------------------------------------------------------------------
# Reference semantics: TransformerModel.py:143-167 DecoderLayer — pre-norm
# self-attention (causal+pad tgt mask), pre-norm source attention over the
# encoder memory, pre-norm FFN, each sublayer with residual dropout. The
# memory K/V projections (linear(lp["src"]["k"/"v"], memory)) stay OUTSIDE
# the kernel: they are [B*S, d]x[d, d] batched MXU matmuls XLA already runs
# at floor, and keeping them out means d(memory) and dW_k/dW_v flow through
# ordinary autodiff. The kernel consumes the per-element [S, d] mk/mv and
# emits per-element dmk/dmv in the backward.
#
# The backward splits into THREE programs so each half's resident weights +
# f32 weight-grad accumulators fit VMEM: the FFN half and the self-attention
# half are the ENCODER kernel's own backward programs reused verbatim
# (identical math: out = a + drop(FFN(LN(a))) and x2 = x + drop(Wo@attn(...)));
# only the cross half is new. Dropout sites: the self/FFN sublayers use the
# encoder's site ids 0-3 under seeds[0]; the cross sublayer reuses site ids
# 0 (probs, per head) and 1 (residual) under the INDEPENDENT seeds[1]
# (= seeds[0] ^ 0x55555555, derived by the caller) so all six sites draw
# independent masks.


def _dec_fwd_kernel(seeds_ref, x_ref, tm_ref, mk_ref, mv_ref, sm_ref,
                    wqkv_ref, bqkv_ref, wo_ref, bo_ref, wq_ref, bq_ref,
                    wo2_ref, bo2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    l1s_ref, l1b_ref, l2s_ref, l2b_ref, l3s_ref, l3b_ref,
                    o_ref, x2_ref, x3_ref, *, n_heads, rate, dtype):
    x = x_ref[0]                                          # [T, d]
    d = x.shape[-1]
    seed, seed2 = seeds_ref[0], seeds_ref[1]
    y1, _, _, _ = _ln(x, l1s_ref[0], l1b_ref[0])
    qkv = _linear(y1, wqkv_ref[...], bqkv_ref, dtype)     # [T, 3d]
    ao, _ = _attention(qkv, tm_ref[0], seed, n_heads=n_heads, d=d,
                       rate=rate, dtype=dtype)
    o = _linear(ao, wo_ref[...], bo_ref, dtype)
    od, _ = _drop(o, seed, _site(1, 0, n_heads), rate)
    x2 = x + od
    y2, _, _, _ = _ln(x2, l2s_ref[0], l2b_ref[0])
    qc = _linear(y2, wq_ref[...], bq_ref, dtype)          # [T, d]
    co, _ = _attention_kv(qc, mk_ref[0], mv_ref[0], sm_ref[0], seed2,
                          n_heads=n_heads, d=d, rate=rate, dtype=dtype)
    o2 = _linear(co, wo2_ref[...], bo2_ref, dtype)
    o2d, _ = _drop(o2, seed2, _site(1, 0, n_heads), rate)
    x3 = x2 + o2d
    y3, _, _, _ = _ln(x3, l3s_ref[0], l3b_ref[0])
    hpre = jax.nn.relu(_linear(y3, w1_ref[...], b1_ref, dtype))
    hd, _ = _drop(hpre, seed, _site(2, 0, n_heads), rate)
    f = _linear(hd, w2_ref[...], b2_ref, dtype)
    fd, _ = _drop(f, seed, _site(3, 0, n_heads), rate)
    o_ref[0] = x3 + fd
    x2_ref[0] = x2
    x3_ref[0] = x3


def _bwd_cross_kernel(seeds_ref, x2_ref, mk_ref, mv_ref, sm_ref, g3_ref,
                      wq_ref, bq_ref, wo2_ref, l2s_ref, l2b_ref,
                      dx2_ref, dmk_ref, dmv_ref, dwq_ref, dbq_ref,
                      dwo2_ref, dbo2_ref, dl2s_ref, dl2b_ref,
                      *, n_heads, rate, dtype):
    """Cross-attention + LN2 half: x3 = x2 + drop(Wo2 @ attn(Wq LN2(x2),
    mk, mv)); consumes g3 = d(x3) from the FFN half, emits the full d(x2)
    (residual included) plus per-element dmk/dmv for the outside memory
    projections."""
    x2, g3 = x2_ref[0], g3_ref[0]
    mk, mv = mk_ref[0], mv_ref[0]
    d = x2.shape[-1]
    dh = d // n_heads
    seed2 = seeds_ref[1]
    y2, xhat2, s2, var2 = _ln(x2, l2s_ref[0], l2b_ref[0])
    qc = _linear(y2, wq_ref[...], bq_ref, dtype)
    co, saved = _attention_kv(qc, mk, mv, sm_ref[0], seed2,
                              n_heads=n_heads, d=d, rate=rate, dtype=dtype)
    g332 = g3.astype(jnp.float32)
    if rate > 0.0:
        keep1 = _keep_mask(seed2, _site(1, 0, n_heads), g3.shape[0],
                           g3.shape[1], rate)
        do = jnp.where(keep1, g332 / (1.0 - rate), 0.0)
    else:
        do = g332
    doc = do.astype(dtype)
    _acc(dwo2_ref, _dot(co, doc, 0, 0))                   # [d, d] f32
    _acc(dbo2_ref, jnp.sum(do, axis=0, keepdims=True))
    dco = _dot(doc, wo2_ref[...], 1, 1).astype(dtype)     # [T, d]
    dqs, dks, dvs = [], [], []
    for h in range(n_heads):
        p, keep, q_h, k_h, v_h = saved[h]
        gh = dco[:, h * dh:(h + 1) * dh]
        attn = (jnp.where(keep, p / (1.0 - rate), 0.0)
                if keep is not None else p)
        dvs.append(_dot(attn.astype(dtype), gh, 0, 0).astype(dtype))
        dattn = _dot(gh, v_h, 1, 1)                       # [T, S] f32
        if keep is not None:
            dattn = jnp.where(keep, dattn / (1.0 - rate), 0.0)
        ds = p * (dattn - jnp.sum(dattn * p, axis=-1, keepdims=True))
        # exact where-replace VJP (see _bwd_attn_kernel)
        ds = jnp.where(sm_ref[0] < 0, 0.0, ds)
        dsd = (ds / math.sqrt(dh)).astype(dtype)
        dqs.append(_dot(dsd, k_h, 1, 0).astype(dtype))    # [T, dh]
        dks.append(_dot(dsd, q_h, 0, 0).astype(dtype))    # [S, dh]
    dqc = jnp.concatenate(dqs, axis=-1)                   # [T, d]
    dmk_ref[0] = jnp.concatenate(dks, axis=-1)
    dmv_ref[0] = jnp.concatenate(dvs, axis=-1)
    _acc(dwq_ref, _dot(y2, dqc, 0, 0))                    # [d, d] f32
    _acc(dbq_ref, jnp.sum(dqc.astype(jnp.float32), axis=0, keepdims=True))
    dy2 = _dot(dqc, wq_ref[...], 1, 1).astype(jnp.float32)
    dx2_ln, dl2s, dl2b = _ln_bwd(dy2, xhat2, s2, var2, l2s_ref[0], d)
    _acc(dl2s_ref, dl2s)
    _acc(dl2b_ref, dl2b)
    dx2_ref[0] = (g332 + dx2_ln).astype(dx2_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(24, 25, 26))
def fused_dec_layer(x, mk, mv, tgt_maskadd, src_maskadd, seeds,
                    wqkv, bqkv, wo, bo, wq, bq, wo2, bo2, w1, b1, w2, b2,
                    l1s, l1b, l2s, l2b, l3s, l3b,
                    n_heads: int, rate: float, interpret: bool = False):
    """One pre-norm transformer DECODER layer, training semantics.

    x [B, T, d]; mk/mv [B, S, d] (memory already K/V-projected outside);
    tgt_maskadd [B, T, T] f32 additive causal+pad mask; src_maskadd
    [B, 1, S]; seeds [2] int32 (seeds[1] must differ from seeds[0] — the
    cross sublayer's dropout stream); wqkv [d, 3d] packed self-attention
    + bqkv [3d]; wo/bo self output; wq/bq cross query; wo2/bo2 cross
    output; w1/b1/w2/b2 FFN; three LayerNorm param pairs. Returns
    [B, T, d] in x.dtype."""
    out, _ = _dec_fwd(x, mk, mv, tgt_maskadd, src_maskadd, seeds,
                      wqkv, bqkv, wo, bo, wq, bq, wo2, bo2, w1, b1, w2, b2,
                      l1s, l1b, l2s, l2b, l3s, l3b, n_heads, rate, interpret)
    return out


def _dec_fwd(x, mk, mv, tgt_maskadd, src_maskadd, seeds,
             wqkv, bqkv, wo, bo, wq, bq, wo2, bo2, w1, b1, w2, b2,
             l1s, l1b, l2s, l2b, l3s, l3b, n_heads, rate, interpret):
    b, t, d = x.shape
    s = mk.shape[1]
    f = w1.shape[1]
    vecs = [bqkv.reshape(1, -1), bo.reshape(1, -1), bq.reshape(1, -1),
            bo2.reshape(1, -1), b1.reshape(1, -1), b2.reshape(1, -1),
            l1s.reshape(1, -1), l1b.reshape(1, -1), l2s.reshape(1, -1),
            l2b.reshape(1, -1), l3s.reshape(1, -1), l3b.reshape(1, -1)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[_row(t, d),
                  pl.BlockSpec((1, tgt_maskadd.shape[1], t),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  _row(s, d), _row(s, d),
                  pl.BlockSpec((1, 1, s), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  _const(wqkv.shape), _const((1, 3 * d)),
                  _const(wo.shape), _const((1, d)),
                  _const(wq.shape), _const((1, d)),
                  _const(wo2.shape), _const((1, d)),
                  _const(w1.shape), _const((1, f)),
                  _const(w2.shape), _const((1, d)),
                  _const((1, d)), _const((1, d)), _const((1, d)),
                  _const((1, d)), _const((1, d)), _const((1, d))],
        out_specs=(_row(t, d), _row(t, d), _row(t, d)),
    )
    out, x2, x3 = pl.pallas_call(
        functools.partial(_dec_fwd_kernel, n_heads=n_heads, rate=rate,
                          dtype=x.dtype),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct((b, t, d), x.dtype)),
        interpret=interpret,
    )(seeds, x, tgt_maskadd, mk, mv, src_maskadd,
      wqkv, vecs[0], wo, vecs[1], wq, vecs[2], wo2, vecs[3],
      w1, vecs[4], w2, vecs[5], *vecs[6:])
    return out, (x, mk, mv, tgt_maskadd, src_maskadd, seeds, wqkv, bqkv,
                 wo, bo, wq, bq, wo2, bo2, w1, b1, w2, b2,
                 l1s, l1b, l2s, l2b, l3s, l3b, x2, x3)


def _dec_bwd(n_heads, rate, interpret, res, g):
    (x, mk, mv, tgt_maskadd, src_maskadd, seeds, wqkv, bqkv, wo, bo, wq, bq,
     wo2, bo2, w1, b1, w2, b2,
     l1s, l1b, l2s, l2b, l3s, l3b, x2, x3) = res
    b, t, d = x.shape
    s = mk.shape[1]
    f = w1.shape[1]
    # (1) FFN + LN3 half — the encoder kernel's own backward program
    # (identical math), consuming x3 and the upstream g
    ffn_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[_row(t, d), _row(t, d),
                  _const(w1.shape), _const((1, f)), _const(w2.shape),
                  _const((1, d)), _const((1, d))],
        out_specs=(_row(t, d), _const(w1.shape), _const((1, f)),
                   _const(w2.shape), _const((1, d)), _const((1, d)),
                   _const((1, d))),
    )
    dx3, dw1, db1, dw2, db2, dl3s, dl3b = pl.pallas_call(
        functools.partial(_bwd_ffn_kernel, n_heads=n_heads, rate=rate,
                          dtype=x.dtype),
        grid_spec=ffn_spec,
        out_shape=(jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct(w1.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, f), jnp.float32),
                   jax.ShapeDtypeStruct(w2.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        interpret=interpret,
    )(seeds, x3, g.astype(x.dtype), w1, b1.reshape(1, -1), w2,
      l3s.reshape(1, -1), l3b.reshape(1, -1))
    # (2) cross-attention + LN2 half
    cross_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[_row(t, d), _row(s, d), _row(s, d),
                  pl.BlockSpec((1, 1, s), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  _row(t, d),
                  _const(wq.shape), _const((1, d)), _const(wo2.shape),
                  _const((1, d)), _const((1, d))],
        out_specs=(_row(t, d), _row(s, d), _row(s, d),
                   _const(wq.shape), _const((1, d)), _const(wo2.shape),
                   _const((1, d)), _const((1, d)), _const((1, d))),
    )
    (dx2, dmk, dmv, dwq, dbq, dwo2, dbo2, dl2s, dl2b) = pl.pallas_call(
        functools.partial(_bwd_cross_kernel, n_heads=n_heads, rate=rate,
                          dtype=x.dtype),
        grid_spec=cross_spec,
        out_shape=(jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct((b, s, d), x.dtype),
                   jax.ShapeDtypeStruct((b, s, d), x.dtype),
                   jax.ShapeDtypeStruct(wq.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct(wo2.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        interpret=interpret,
    )(seeds, x2, mk, mv, src_maskadd, dx3, wq, bq.reshape(1, -1), wo2,
      l2s.reshape(1, -1), l2b.reshape(1, -1))
    # (3) self-attention + LN1 half — the encoder kernel's own backward
    attn_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[_row(t, d),
                  pl.BlockSpec((1, tgt_maskadd.shape[1], t),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  _row(t, d),
                  _const(wqkv.shape), _const((1, 3 * d)),
                  _const(wo.shape), _const((1, d)), _const((1, d))],
        out_specs=(_row(t, d), _const(wqkv.shape), _const((1, 3 * d)),
                   _const(wo.shape), _const((1, d)), _const((1, d)),
                   _const((1, d))),
    )
    dx, dwqkv, dbqkv, dwo, dbo, dl1s, dl1b = pl.pallas_call(
        functools.partial(_bwd_attn_kernel, n_heads=n_heads, rate=rate,
                          dtype=x.dtype),
        grid_spec=attn_spec,
        out_shape=(jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
                   jax.ShapeDtypeStruct(wo.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        interpret=interpret,
    )(seeds, x, tgt_maskadd, dx2, wqkv, bqkv.reshape(1, -1), wo,
      l1s.reshape(1, -1), l1b.reshape(1, -1))

    def _w(gr, like):
        return gr.reshape(like.shape).astype(like.dtype)

    # bias cotangents cast with their OWN primals as templates (ADVICE r4):
    # a mixed-dtype param tree (f32 biases under bf16 activations) keeps
    # f32 gradients instead of silently downcasting
    return (dx, dmk, dmv, jnp.zeros_like(tgt_maskadd),
            jnp.zeros_like(src_maskadd), jnp.zeros_like(seeds),
            _w(dwqkv, wqkv), _w(dbqkv, bqkv), _w(dwo, wo), _w(dbo, bo),
            _w(dwq, wq), _w(dbq, bq), _w(dwo2, wo2), _w(dbo2, bo2),
            _w(dw1, w1), _w(db1, b1), _w(dw2, w2), _w(db2, b2),
            _w(dl1s, l1s), _w(dl1b, l1b), _w(dl2s, l2s), _w(dl2b, l2b),
            _w(dl3s, l3s), _w(dl3b, l3b))


fused_dec_layer.defvjp(_dec_fwd, _dec_bwd)


def dec_layer_kernel_ok(n_heads: int, d: int, f: int, t: int,
                        s: int) -> bool:
    """Routing guard for the decoder kernel: lane-clean head slices and
    the forward's resident weights (6 matrices) + the largest backward
    half's f32 grad accumulators + per-element temporaries (incl. the
    [S, d] mk/mv blocks and [T, S] cross score tiles) within budget.
    The temps estimate includes the backward halves' per-head saved
    tensors (self [T,T] + cross [T,S] f32 probs + keep masks, q/k/v head
    slices + gradient lists, ADVICE r4) so over-budget shapes fall back
    to XLA cleanly instead of failing the Mosaic compile."""
    if d % n_heads or (d // n_heads) % 8 or d % 128 or f % 128:
        return False
    if f > d:                      # same measured limit as the encoder
        return False
    weights = (3 * d * d + 3 * d * d + 2 * d * f) * 2      # bf16 resident
    grads = max((3 * d * d + d * d) * 4, 2 * d * f * 4)    # larger bwd half
    temps = (t * (3 * d + 2 * f + 6 * d) * 4 + t * t * 4 + t * s * 4
             + 4 * s * d * 2)
    saved = n_heads * (t * t + t * s) * 8 + 3 * t * d * 4  # bwd head loops
    return (weights + grads + temps + saved <= 15 * 1024 * 1024
            and t <= 512 and s <= 512)
