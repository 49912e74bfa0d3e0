"""Fused transformer decoder-layer step kernel (Pallas).

Why: the transformer caption decode is the per-family outlier (round-2
BASELINE.md: 2,348 caps/s beam-5 vs 10-19k for the LSTM families). Its
per-step cost is spread across ~100 small XLA ops — 6 layers x (3 layer
norms, 7 projections, 2 attention chains, cache updates) — each a few µs
of compute but paying an inter-op scheduling gap, ~4x above the step's
HBM floor (STATUS round 2). This kernel fuses ONE WHOLE DECODER LAYER
(LN -> packed QKV -> cache write -> self-attention -> LN -> shared-memory
cross-attention -> LN -> FFN, with residuals) into a single Pallas
program, so a step runs ~8 device ops instead of ~100.

Semantics mirror models/transformer.py `step` exactly (reference
TransformerModel.py:436-446 incremental decode):
- per-row positions `t` (diverse-beam groups are time-staggered),
- K/V cache written at slot t before attending (pos <= t mask),
- cross-attention over UNEXPANDED [B, S, d] encoder K/V shared by the
  K beams of each image (cross_attend_shared), src-mask -1e9 masking,
- layer norm / softmax in f32, matmuls bf16 with f32 accumulation.

Grid: over blocks of BI images (BI*K rows). Weights are whole-array
blocks revisited by every grid step (stay VMEM-resident); per-block VMEM
is sized to ~12 MB (v5e has ~16 MB/core). Caches are aliased in-place.

Parity: tests/test_transformer.py::test_layer_kernel_matches_xla_step
(interpret mode, f32). TPU A/B: tools/perf/prof_decode_configs.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

VMEM_BUDGET = int(os.environ.get("UIC_TFD_VMEM_BUDGET",
                                 str(12 * 1024 * 1024)))


def pack_layer_weights(lp) -> dict:
    """Pack one decoder layer's params for the kernel: fused QKV matrix
    for self-attention; cross k/v projections are already folded into the
    precomputed encoder memory (make_decoder)."""
    return {
        "ln1_s": lp["n1"]["scale"][None, :], "ln1_b": lp["n1"]["offset"][None, :],
        "wqkv": jnp.concatenate([lp["self"]["q"]["w"], lp["self"]["k"]["w"],
                                 lp["self"]["v"]["w"]], axis=1),
        "bqkv": jnp.concatenate([lp["self"]["q"]["b"], lp["self"]["k"]["b"],
                                 lp["self"]["v"]["b"]])[None, :],
        "wo_s": lp["self"]["o"]["w"], "bo_s": lp["self"]["o"]["b"][None, :],
        "ln2_s": lp["n2"]["scale"][None, :], "ln2_b": lp["n2"]["offset"][None, :],
        "wq_c": lp["src"]["q"]["w"], "bq_c": lp["src"]["q"]["b"][None, :],
        "wo_c": lp["src"]["o"]["w"], "bo_c": lp["src"]["o"]["b"][None, :],
        "ln3_s": lp["n3"]["scale"][None, :], "ln3_b": lp["n3"]["offset"][None, :],
        "w1": lp["ffn"]["w1"]["w"], "b1": lp["ffn"]["w1"]["b"][None, :],
        "w2": lp["ffn"]["w2"]["w"], "b2": lp["ffn"]["w2"]["b"][None, :],
    }


_WKEYS = ("ln1_s", "ln1_b", "wqkv", "bqkv", "wo_s", "bo_s", "ln2_s", "ln2_b",
          "wq_c", "bq_c", "wo_c", "bo_c", "ln3_s", "ln3_b", "w1", "b1",
          "w2", "b2")


def _ln(x, s, b, eps=1e-6):
    # exact models/transformer.py layer_norm semantics (unbiased var,
    # eps OUTSIDE the sqrt), f32 math
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    n = x32.shape[-1]
    var = jnp.sum(jnp.square(x32 - mean), axis=-1, keepdims=True) / (n - 1)
    out = (x32 - mean) / (jnp.sqrt(var) + eps)
    return (out * s.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _layer_kernel(x_ref, t_ref, ck_ref, cv_ref, mask_ref, cache_k_ref,
                  cache_v_ref, *w_refs, xo_ref, ko_ref, vo_ref,
                  n_heads: int, kb: int):
    # row-carrying arrays arrive as [bi, kb, ...] — leading dims are free
    # of the TPU (8, 128) last-two-dims tiling constraint, so any bi works
    # without padding; merge to [rows, ...] views in-kernel
    w = {k: r[:] for k, r in zip(_WKEYS, w_refs)}
    bi, _, d = x_ref.shape
    rows = bi * kb
    x = x_ref[:].reshape(rows, d)
    dh = d // n_heads
    T = cache_k_ref.shape[2]
    t = t_ref[:].reshape(rows, 1)                  # int32
    cache_k = cache_k_ref[:].reshape(rows, T, d)
    cache_v = cache_v_ref[:].reshape(rows, T, d)
    dt = x.dtype

    # ---- self-attention (packed QKV, cache write, pos<=t mask) ----
    y = _ln(x, w["ln1_s"], w["ln1_b"])
    qkv = (_mm(y, w["wqkv"]) + w["bqkv"].astype(jnp.float32)).astype(dt)
    q, k_t, v_t = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, T), 1)
    # int32 before the minor-dim insert (Mosaic: non-32-bit minor inserts
    # unsupported; (col==t) is i1)
    write = (col == t).astype(jnp.int32)[:, :, None]  # [rows, T, 1]
    ck_new = jnp.where(write > 0, k_t[:, None, :], cache_k)
    cv_new = jnp.where(write > 0, v_t[:, None, :], cache_v)
    ko_ref[:] = ck_new.reshape(bi, kb, T, d)
    vo_ref[:] = cv_new.reshape(bi, kb, T, d)
    # per-head VPU multiply-reduce over dh (T is tiny). Head slicing and
    # minor-dim inserts happen on f32 only — Mosaic supports neither
    # non-32-bit minor-dim insertion nor minor-dim splitting reshapes
    # (f32 included: "unsupported shape cast"), so the per-head loop with
    # f32 column slices is the compilable formulation.
    pos_ok = (col <= t)                            # [rows, T]
    s_outs = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        # slice bf16 then cast per head (full f32 copies of the caches
        # blow the VMEM budget); newaxis and slice stay separate ops —
        # combined they lower to an unsupported in-kernel gather
        q_h = q[:, sl].astype(jnp.float32)
        k_h = ck_new[:, :, sl].astype(jnp.float32)
        sc = jnp.sum(q_h[:, None, :] * k_h, axis=-1) / math.sqrt(dh)
        sc = jnp.where(pos_ok, sc, -1e9)
        a_h = jax.nn.softmax(sc, axis=1)           # [rows, T] f32
        v_h = cv_new[:, :, sl].astype(jnp.float32)
        s_outs.append(jnp.sum(a_h[:, :, None] * v_h, axis=1))
    out = jnp.concatenate(s_outs, axis=-1).astype(dt)   # [rows, d]
    x = x + (_mm(out, w["wo_s"]) + w["bo_s"].astype(jnp.float32)).astype(dt)

    # ---- cross-attention over shared [BI, S, d] encoder memory ----
    # (a head-major [BI, H, S, dh] layout was A/B'd and rejected: the
    # 64-wide minor dim pads to the 128-lane bf16 tile, doubling the
    # ck/cv VMEM footprint and blowing the scoped budget)
    y = _ln(x, w["ln2_s"], w["ln2_b"])
    q2 = _mm(y, w["wq_c"]) + w["bq_c"].astype(jnp.float32)  # f32 [rows, d]
    q2 = q2.reshape(bi, kb, d)
    ck, cv = ck_ref[:], cv_ref[:]                  # [BI, S, d]
    m = mask_ref[:][:, 0, :]                       # [BI, S] (1 = keep)
    outs = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        sc = jax.lax.dot_general(                  # [BI, kb, S]
            q2[:, :, sl].astype(dt), ck[:, :, sl],
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / math.sqrt(dh)
        sc = jnp.where(m[:, None, :] > 0, sc, -1e9)
        wgt = jax.nn.softmax(sc, axis=-1).astype(dt)
        outs.append(jax.lax.dot_general(           # [BI, kb, dh]
            wgt, cv[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    out2 = jnp.concatenate(outs, axis=-1).reshape(rows, d).astype(dt)
    x = x + (_mm(out2, w["wo_c"]) + w["bo_c"].astype(jnp.float32)).astype(dt)

    # ---- FFN ----
    y = _ln(x, w["ln3_s"], w["ln3_b"])
    h1 = jax.nn.relu(_mm(y, w["w1"]) + w["b1"].astype(jnp.float32)).astype(dt)
    x = x + (_mm(h1, w["w2"]) + w["b2"].astype(jnp.float32)).astype(dt)
    xo_ref[:] = x.reshape(bi, kb, d)


def _pick_bi(b: int, kb: int, S: int, d: int, T: int, dff: int,
             itemsize: int) -> int:
    weights = (3 * d * d + d * d + d * d + d * d + 2 * d * dff) * itemsize
    for bi in range(b, 0, -1):
        if b % bi:
            continue
        per_img = (2 * S * d + 4 * kb * T * d + 8 * kb * d) * itemsize
        if weights + bi * per_img <= VMEM_BUDGET:
            return bi
    return 1


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret"))
def decoder_layer_step(x, t, ck, cv, src_mask, cache_k, cache_v, wpack,
                       *, n_heads: int, interpret: bool = False):
    """One fused decoder layer for one decode step.

    x [R, d]; t [R] int32 per-row positions; ck/cv [B, S, d] unexpanded
    cross K/V; src_mask [B, S] (1 = attend) or None; cache_k/v [R, T, d]
    this layer's self-attention cache. Returns (x', cache_k', cache_v')."""
    R, d = x.shape
    B, S, _ = ck.shape
    kb = R // B
    T = cache_k.shape[1]
    dff = wpack["w1"].shape[1]
    if src_mask is None:
        src_mask = jnp.ones((B, S), jnp.float32)
    elif src_mask.ndim == 3:    # encode() emits [B, 1, S]
        src_mask = src_mask[:, 0, :]
    bi = _pick_bi(B, kb, S, d, T, dff, x.dtype.itemsize)
    grid = (B // bi,)
    rows_blk = bi * kb

    kern = functools.partial(_layer_kernel, n_heads=n_heads, kb=kb)

    # Row-carrying arrays are shipped as [B, kb, ...]: the image axis leads
    # and the last two block dims equal the full array dims, satisfying the
    # TPU (8, 128) block-tiling rule for ANY bi without padding.
    def img_spec(shape_tail):
        return pl.BlockSpec((bi,) + shape_tail,
                            lambda i: (i,) + (0,) * len(shape_tail),
                            memory_space=pltpu.VMEM)

    def whole(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    in_specs = [
        img_spec((kb, d)),        # x
        img_spec((kb, 1)),        # t
        img_spec((S, d)),         # ck
        img_spec((S, d)),         # cv
        img_spec((1, S)),         # src_mask
        img_spec((kb, T, d)),     # cache_k
        img_spec((kb, T, d)),     # cache_v
    ] + [whole(wpack[k]) for k in _WKEYS]
    out_specs = (img_spec((kb, d)), img_spec((kb, T, d)),
                 img_spec((kb, T, d)))
    out_shape = (jax.ShapeDtypeStruct((B, kb, d), x.dtype),
                 jax.ShapeDtypeStruct((B, kb, T, d), cache_k.dtype),
                 jax.ShapeDtypeStruct((B, kb, T, d), cache_v.dtype))

    def kern_wrapped(x_r, t_r, ck_r, cv_r, m_r, k_r, v_r, *rest):
        w_refs = rest[:len(_WKEYS)]
        xo, ko, vo = rest[len(_WKEYS):]
        kern(x_r, t_r, ck_r, cv_r, m_r, k_r, v_r, *w_refs,
             xo_ref=xo, ko_ref=ko, vo_ref=vo)

    flops = R * (2 * (3 + 1 + 1 + 1) * d * d + 4 * d * dff
                 + 4 * T * d + 4 * S * d)
    xn, kn, vn = pl.pallas_call(
        kern_wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={5: 1, 6: 2},  # caches update in place
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * B * S * d + 2 * R * T * d * 2
                            + sum(int(np.prod(wpack[k].shape))
                                  for k in _WKEYS)) * x.dtype.itemsize,
            transcendentals=R * (T + S)),
    )(x.reshape(B, kb, d), t.reshape(B, kb, 1).astype(jnp.int32), ck, cv,
      src_mask.astype(jnp.float32)[:, None, :],
      cache_k.reshape(B, kb, T, d), cache_v.reshape(B, kb, T, d),
      *[wpack[k] for k in _WKEYS])
    return xn.reshape(R, d), kn.reshape(R, T, d), vn.reshape(R, T, d)
