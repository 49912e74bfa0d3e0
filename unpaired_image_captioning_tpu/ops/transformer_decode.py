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
# Window cache mode keeps only a tiny 8-slot DMA scratch instead of
# double-buffering full cache output blocks, so the same physical 16 MB
# fits a larger estimate — and the bigger bi halves the grid steps AND
# doubles the matmul M rows (the kernel is MXU-row-padding-bound at beam
# 15: M=kb·bi vs the 128-row systolic array). v5e A/B at the NMT shape:
# bi=1 1,563 sents/s -> bi=2 1,675 -> 1,790 with the write-back wait
# deferred by parity double-buffering (tools/perf/prof_nmt_transformer.py).
WINDOW_VMEM_BUDGET = int(os.environ.get("UIC_TFD_WINDOW_VMEM_BUDGET",
                                        str(14 * 1024 * 1024)))


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


def _layer_math(x, t, ck, cv, m, cache_k, cache_v, w, *, n_heads: int,
                bi: int, kb: int, anc=None):
    """One decoder layer's math on in-VMEM values. x [rows, d]; t [rows, 1]
    int32; ck/cv [bi, S, d] shared cross K/V; m [bi, S] src mask; cache_k/v
    [rows, T, d]. Returns (x_out, ck_new, cv_new, attn_mean) where
    attn_mean [bi, kb, S] f32 is the mean-over-heads cross-attention weight
    (the NMT path's UNK→attn-argmax signal, NMT_Models.py:312-320). Shared
    by the per-layer and whole-stack kernels.

    anc [bi, kb, T] int32 (optional): LAZY beam cache. When given, the
    cache rows are append-only (beam search never physically reorders
    them) and anc[b, k, τ] names the physical row that wrote beam k's
    position-τ K/V; the self-attention mask consults it instead of
    `col_j == row_k`. This turns the [R, L, T, d] cache reorder (~600 MB a
    step at NMT beam 15) into a [R, T] int32 gather — the kernel already
    scores every (query-beam, key-row) pair on the MXU, so the masked
    form costs nothing extra."""
    rows, d = x.shape
    dh = d // n_heads
    T = cache_k.shape[1]
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
    # Self-attention on the MXU, mirroring the cross-attention pattern: a
    # [bi, kb, dh]x[bi, kb*T, dh] batched dot scores EVERY (query-beam,
    # key-beam) pair; the wrong-beam pairs and future positions are folded
    # into one softmax mask, so the weighted sum is a second batched dot
    # with no diagonal extraction. The kb x waste is ~free (MXU M=kb rows
    # were padding anyway); this replaced a per-head VPU multiply +
    # LANE-dim reduce chain that profiled ~1.6x over the kernel's HBM
    # floor. (A transposed [rows, d, T] cache layout that would make the
    # reduction sublane-cheap was rejected: T=16 minor pads to the
    # 128-lane tile, 8x-ing cache HBM/VMEM footprint.)
    ck2 = ck_new.reshape(bi, kb * T, d)
    cv2 = cv_new.reshape(bi, kb * T, d)
    q3 = q.reshape(bi, kb, d)
    t3 = t.reshape(bi, kb)
    colm = jax.lax.broadcasted_iota(jnp.int32, (kb, kb * T), 1)
    col_j = colm // T                              # key row's beam
    col_t = colm - col_j * T                       # key row's position
    if anc is None:
        row_k = jax.lax.broadcasted_iota(jnp.int32, (kb, kb * T), 0)
        ok = jnp.logical_and((col_j == row_k)[None],
                             col_t[None] <= t3[:, :, None])  # [bi,kb,kb*T]
    else:
        # lazy cache: beam k's position-τ K/V lives in row anc[k, τ], so
        # the self-mask is anc[k, col_t] == col_j. Mosaic can't shape-cast
        # a [bi,kb,kb,T] compare into the lane dim, so expand anc across
        # columns with a constant 0/1 position matmul instead:
        # tiled[r, j*T+τ] = Σ_τ' anc[r, τ'] · (τ' == τ) — exact in f32 for
        # row indices < 2^24, and an 11-MFLOP MXU blip at beam 15.
        cm2 = jax.lax.broadcasted_iota(jnp.int32, (T, kb * T), 1)
        ct2 = cm2 - (cm2 // T) * T
        E = (ct2 == jax.lax.broadcasted_iota(jnp.int32, (T, kb * T), 0)
             ).astype(jnp.float32)
        tiled = jax.lax.dot_general(
            anc.reshape(rows, T).astype(jnp.float32), E,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(bi, kb, kb * T)
        ok = jnp.logical_and(tiled == col_j[None].astype(jnp.float32),
                             col_t[None] <= t3[:, :, None])
    # heads fold into the dot batch dim (head-major stacks are cheap
    # VMEM-local copies here; the lane pad 64->128 only hits temporaries):
    # 8 score dots + 8 value dots become 1 + 1
    hb = n_heads * bi
    qh = jnp.stack([q3[:, :, h * dh:(h + 1) * dh]
                    for h in range(n_heads)]).reshape(hb, kb, dh)
    kh = jnp.stack([ck2[:, :, h * dh:(h + 1) * dh]
                    for h in range(n_heads)]).reshape(hb, kb * T, dh)
    vh = jnp.stack([cv2[:, :, h * dh:(h + 1) * dh]
                    for h in range(n_heads)]).reshape(hb, kb * T, dh)
    sc = jax.lax.dot_general(                      # [hb, kb, kb*T]
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / math.sqrt(dh)
    ok_b = jnp.broadcast_to(ok[None], (n_heads,) + ok.shape
                            ).reshape(hb, kb, kb * T)
    sc = jnp.where(ok_b, sc, -1e9)
    a_h = jax.nn.softmax(sc, axis=-1).astype(dt)
    outh = jax.lax.dot_general(                    # [hb, kb, dh]
        a_h, vh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out = jnp.concatenate([outh[h * bi:(h + 1) * bi]
                           for h in range(n_heads)], axis=-1)
    out = out.reshape(rows, d).astype(dt)
    x = x + (_mm(out, w["wo_s"]) + w["bo_s"].astype(jnp.float32)).astype(dt)

    # ---- cross-attention over shared [BI, S, d] encoder memory ----
    # (a head-major [BI, H, S, dh] layout was A/B'd and rejected: the
    # 64-wide minor dim pads to the 128-lane bf16 tile, doubling the
    # ck/cv VMEM footprint and blowing the scoped budget)
    y = _ln(x, w["ln2_s"], w["ln2_b"])
    q2 = _mm(y, w["wq_c"]) + w["bq_c"].astype(jnp.float32)  # f32 [rows, d]
    q2 = q2.reshape(bi, kb, d).astype(dt)
    S = ck.shape[1]
    q2h = jnp.stack([q2[:, :, h * dh:(h + 1) * dh]
                     for h in range(n_heads)]).reshape(hb, kb, dh)
    ckh = jnp.stack([ck[:, :, h * dh:(h + 1) * dh]
                     for h in range(n_heads)]).reshape(hb, S, dh)
    cvh = jnp.stack([cv[:, :, h * dh:(h + 1) * dh]
                     for h in range(n_heads)]).reshape(hb, S, dh)
    sc2 = jax.lax.dot_general(                     # [hb, kb, S]
        q2h, ckh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / math.sqrt(dh)
    m_b = jnp.broadcast_to(m[None, :, None, :],
                           (n_heads, bi, kb, S)).reshape(hb, kb, S)
    sc2 = jnp.where(m_b > 0, sc2, -1e9)
    wgt32 = jax.nn.softmax(sc2, axis=-1)               # [hb, kb, S] f32
    attn_mean = jnp.mean(wgt32.reshape(n_heads, bi, kb, S), axis=0)
    wgt = wgt32.astype(dt)
    out2h = jax.lax.dot_general(                   # [hb, kb, dh]
        wgt, cvh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out2 = jnp.concatenate([out2h[h * bi:(h + 1) * bi]
                            for h in range(n_heads)], axis=-1)
    out2 = out2.reshape(rows, d).astype(dt)
    x = x + (_mm(out2, w["wo_c"]) + w["bo_c"].astype(jnp.float32)).astype(dt)

    # ---- FFN ----
    y = _ln(x, w["ln3_s"], w["ln3_b"])
    h1 = jax.nn.relu(_mm(y, w["w1"]) + w["b1"].astype(jnp.float32)).astype(dt)
    x = x + (_mm(h1, w["w2"]) + w["b2"].astype(jnp.float32)).astype(dt)
    return x, ck_new, cv_new, attn_mean, k_t, v_t


def _layer_kernel(x_ref, t_ref, ck_ref, cv_ref, mask_ref, cache_k_ref,
                  cache_v_ref, *w_refs, xo_ref, ko_ref, vo_ref,
                  n_heads: int, kb: int):
    # row-carrying arrays arrive as [bi, kb, ...] — leading dims are free
    # of the TPU (8, 128) last-two-dims tiling constraint, so any bi works
    # without padding; merge to [rows, ...] views in-kernel
    w = {k: r[:] for k, r in zip(_WKEYS, w_refs)}
    bi, kb_, d = x_ref.shape
    rows = bi * kb
    T = cache_k_ref.shape[2]
    x, ck_new, cv_new, *_ = _layer_math(
        x_ref[:].reshape(rows, d),
        t_ref[:].reshape(rows, 1),
        ck_ref[:], cv_ref[:],
        mask_ref[:][:, 0, :],
        cache_k_ref[:].reshape(rows, T, d),
        cache_v_ref[:].reshape(rows, T, d),
        w, n_heads=n_heads, bi=bi, kb=kb)
    ko_ref[:] = ck_new.reshape(bi, kb, T, d)
    vo_ref[:] = cv_new.reshape(bi, kb, T, d)
    xo_ref[:] = x.reshape(bi, kb, d)


# [1, X] bias/LN rows get sublane-padded to [8, X] in the stack layout:
# Mosaic rejects DMA slices whose second-to-minor dim (1) is unaligned to
# the dtype tiling (2 for bf16, 8 for f32); 8 covers both.
_VEC_WKEYS = frozenset(k for k in _WKEYS
                       if k[0] == "b" or k.startswith("ln"))
_SUBLANE_PAD = 8


def pack_stack_weights(dec_params) -> dict:
    """Stack every layer's packed weights on a leading layer axis:
    {key: [L, *shape]} — the whole-stack kernel keeps these in HBM and
    DMA-streams layer l's slice into VMEM scratch once per layer."""
    per_layer = [pack_layer_weights(lp) for lp in dec_params]

    def prep(arr):
        if arr.shape[0] == 1:  # [1, X] -> [8, X] sublane-aligned DMA slice
            return jnp.broadcast_to(arr, (_SUBLANE_PAD,) + arr.shape[1:])
        return arr

    return {k: jnp.stack([prep(pl_[k]) for pl_ in per_layer])
            for k in _WKEYS}


def _stack_kernel(x0_ref, t_ref, ck_ref, cv_ref, mask_ref, k_in_ref,
                  v_in_ref, *rest, n_heads: int, kb: int, bi: int,
                  want_attn: bool = False, lazy: bool = False,
                  cache_mode: str = "full"):
    """Whole-decoder-stack step: grid (L, B/bi), layer-major order. The
    residual stream x lives in the whole-array output buffer (VMEM-resident
    across grid steps): step (l, i) reads block i's rows (from x0 at l=0),
    runs layer l, writes them back. Layer weights sit in HBM and are DMA'd
    into single-buffered scratch at each layer's first block — auto
    BlockSpec streaming would double-buffer the ~7 MB weight set and blow
    VMEM. With want_attn, the mean-head cross-attention weights are written
    every layer to the same block — last layer's write survives (layer-major
    grid), matching the NMT step's last-layer attn for UNK replacement."""
    if lazy:
        anc_ref, rest = rest[0], rest[1:]
    else:
        anc_ref = None
    if cache_mode == "window":
        ts_ref, rest = rest[0], rest[1:]
    n_w = len(_WKEYS)
    n_out = 4 if want_attn else 3
    w_hbm = rest[:n_w]
    xo_ref, ko_ref, vo_ref = rest[n_w:n_w + 3]
    attn_ref = rest[n_w + 3] if want_attn else None
    scrs = rest[n_w + n_out:n_w + n_out + n_w]
    if cache_mode == "window":
        kwin_scr, vwin_scr, wsem_in, wsem_out = rest[-5:-1]
        sem = rest[-1]
    else:
        sem = rest[-1]
    l = pl.program_id(0)
    i = pl.program_id(1)

    if cache_mode == "window":
        # The window scratch is double-buffered by grid-step PARITY so the
        # write-back DMA issued at step s is waited only at step s+2 (when
        # its buffer is next reused) instead of inline — the serialized
        # per-grid-step output-DMA waits were the remaining dispatch cost of
        # window mode (bi=1 measured BELOW full mode because of them).
        s_idx = l * pl.num_programs(1) + i
        par = s_idx % 2
        last = (pl.num_programs(0) * pl.num_programs(1) - 1) - s_idx == 0

        def _out_cp(p_, i_, scr_k, scr_v):
            # descriptor for the output copy issued at a step with block
            # index i_ and parity p_ (shape-identical for wait purposes)
            k = pltpu.make_async_copy(
                scr_k.at[p_], ko_ref.at[pl.ds(i_ * bi, bi), :, l,
                                        pl.ds((ts_ref[0] // 8) * 8, 8)],
                wsem_out.at[p_, 0])
            v = pltpu.make_async_copy(
                scr_v.at[p_], vo_ref.at[pl.ds(i_ * bi, bi), :, l,
                                        pl.ds((ts_ref[0] // 8) * 8, 8)],
                wsem_out.at[p_, 1])
            return k, v

        # prefetch the 8-aligned cache window holding slot t (overlaps the
        # layer math below); tv is uniform across rows (onmt beam, no
        # diverse groups)
        tv = ts_ref[0]
        tv8 = (tv // 8) * 8

        @pl.when(s_idx >= 2)
        def _drain_same_parity():
            ko_cp, vo_cp = _out_cp(par, i, kwin_scr, vwin_scr)
            ko_cp.wait()
            vo_cp.wait()

        kwin_cp = pltpu.make_async_copy(
            k_in_ref.at[:, :, 0, pl.ds(tv8, 8), :], kwin_scr.at[par],
            wsem_in.at[0])
        vwin_cp = pltpu.make_async_copy(
            v_in_ref.at[:, :, 0, pl.ds(tv8, 8), :], vwin_scr.at[par],
            wsem_in.at[1])
        kwin_cp.start()
        vwin_cp.start()

    @pl.when(i == 0)
    def _fetch_weights():
        for j in range(n_w):
            pltpu.make_async_copy(w_hbm[j].at[l], scrs[j], sem.at[j]).start()
        for j in range(n_w):
            pltpu.make_async_copy(w_hbm[j].at[l], scrs[j], sem.at[j]).wait()

    w = {key: (scrs[j][:][0:1] if key in _VEC_WKEYS else scrs[j][:])
         for j, key in enumerate(_WKEYS)}
    d = x0_ref.shape[-1]
    T = k_in_ref.shape[3]
    rows = bi * kb
    x_first = x0_ref[:].reshape(rows, d)
    x_prev = xo_ref[pl.ds(i * bi, bi)].reshape(rows, d)
    x = jnp.where(l == 0, x_first, x_prev)
    x_out, ck_new, cv_new, attn, k_t, v_t = _layer_math(
        x,
        t_ref[:].reshape(rows, 1),
        ck_ref[:][0], cv_ref[:][0],            # [1,bi,S,d] -> [bi,S,d]
        mask_ref[:][:, 0, :],
        k_in_ref[:].reshape(rows, T, d),       # [bi,kb,1,T,d]
        v_in_ref[:].reshape(rows, T, d),
        w, n_heads=n_heads, bi=bi, kb=kb,
        anc=(anc_ref[:] if lazy else None))
    xo_ref[pl.ds(i * bi, bi)] = x_out.reshape(bi, kb, d)
    if cache_mode == "window":
        # write-traffic elision: instead of streaming the whole (unchanged)
        # cache back out — ~half the kernel's HBM traffic — DMA back only
        # the 8-aligned window around slot t with the new entry inserted.
        # (A bare 1-slot write is Mosaic-illegal: T-slices must be
        # 8-aligned in SHAPE; /tmp window-DMA probe r4.) The write-back is
        # NOT waited here — the wait for this parity's buffer happens two
        # grid steps later (or in the drain below on the last two steps).
        kwin_cp.wait()
        vwin_cp.wait()
        rowi = jax.lax.broadcasted_iota(jnp.int32, (bi, kb, 8, d), 2)
        off = tv - tv8
        kwin_scr[par] = jnp.where(rowi == off, k_t.reshape(bi, kb, 1, d),
                                  kwin_scr[par])
        vwin_scr[par] = jnp.where(rowi == off, v_t.reshape(bi, kb, 1, d),
                                  vwin_scr[par])
        kw_out, vw_out = _out_cp(par, i, kwin_scr, vwin_scr)
        kw_out.start()
        vw_out.start()

        @pl.when(last)
        def _drain_all():
            # final grid step: both parities may have in-flight write-backs
            # (this step's own + the previous step's) — drain before the
            # program completes
            ks, vs = _out_cp(par, i, kwin_scr, vwin_scr)
            ks.wait()
            vs.wait()

            @pl.when(s_idx >= 1)
            def _other():
                ko_cp, vo_cp = _out_cp(1 - par, i, kwin_scr, vwin_scr)
                ko_cp.wait()
                vo_cp.wait()
    elif cache_mode == "entries":
        # only the NEW position-t entries leave the kernel ([1, bi, kb, d]
        # per layer); the caller folds them into its carried cache with a
        # dynamic_update_slice. (Kept for reference: XLA copies the whole
        # cache around the DUS inside the beam while-loop, so "window"
        # wins on TPU.)
        ko_ref[:] = k_t.reshape(1, bi, kb, d)
        vo_ref[:] = v_t.reshape(1, bi, kb, d)
    else:
        ko_ref[:] = ck_new.reshape(bi, kb, 1, T, d)
        vo_ref[:] = cv_new.reshape(bi, kb, 1, T, d)
    if want_attn:
        attn_ref[:] = attn  # last layer's write survives (grid is l-major)


def _pick_bi_stack(b: int, kb: int, S: int, d: int, T: int, dff: int,
                   itemsize: int, cache_mode: str = "full") -> int:
    """VMEM budget for the stack kernel: weight scratch is single-buffered;
    cross K/V blocks (2 arrays) and cache blocks (2 in + 2 out, or 2 in +
    2 slot-entry out under emit_entries) are double-buffered by the
    pipeline; the x carry is one whole [B,kb,d] buffer."""
    weights = (3 * d * d + d * d + d * d + d * d + 2 * d * dff) * itemsize
    fixed = weights + b * kb * d * itemsize
    # out-side cache VMEM per image block: full [*,T,d] blocks, tiny
    # [*,1,d] entry blocks, or the parity-double-buffered 8-slot window
    # scratch (2 buffers so the write-back DMA wait defers two grid steps)
    cache_T_out = {"full": 2 * T, "entries": 2, "window": 16}[cache_mode]
    budget = WINDOW_VMEM_BUDGET if cache_mode == "window" else VMEM_BUDGET
    for bi in range(b, 0, -1):
        if b % bi:
            continue
        blocks = (2 * 2 * S * d + 2 * (2 * T + cache_T_out) * kb * d
                  + 2 * 2 * kb * d) * bi * itemsize
        if fixed + blocks <= budget:
            return bi
    return 1


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "interpret", "want_attn",
                                    "cache_mode"))
def decoder_stack_step(x, t, ck_all, cv_all, src_mask, cache_k, cache_v,
                       wstack, anc=None, *, n_heads: int,
                       interpret: bool = False, want_attn: bool = False,
                       cache_mode: str = "full"):
    """All L fused decoder layers for one decode step in ONE Pallas program.

    x [R, d]; t [R] int32; ck_all/cv_all [L, B, S, d] unexpanded cross K/V;
    src_mask [B, S] or [B, 1, S] or None; cache_k/v [R, L, T, d] — row axis
    LEADING so beam search's axis-0 state reorder and in-place aliasing
    both keep working (the kernel blocks the middle layer axis). wstack:
    pack_stack_weights output. Returns (x', cache_k', cache_v'), plus the
    LAST layer's mean-head cross-attention weights [R, S] f32 when
    want_attn (the transformer-NMT UNK→attn-argmax signal).

    anc [R, T] int32 (optional): lazy-beam-cache ancestry — see
    _layer_math. With anc the caller must NOT reorder cache_k/cache_v
    across beam steps (onmt_beam_search's lazy_state mechanism).

    cache_mode:
    - "full": aliased full-cache outputs (block writes) — required when t
      is per-row (diverse groups).
    - "window": aliased ANY-space cache outputs; the kernel DMAs back
      ONLY the 8-aligned T-window containing slot t with the new entry
      inserted — write traffic drops from R·L·T·d to R·L·8·d a step.
      Requires UNIFORM t across rows (onmt beam; t is read from t[0]).
    - "entries": return the new position-t K/V as [R, L, d] for the
      caller to DUS into its carry (kept for reference — XLA copies the
      whole cache around the DUS in a while body, so "window" wins)."""
    R, d = x.shape
    L, B, S, _ = ck_all.shape
    kb = R // B
    T = cache_k.shape[2]
    dff = wstack["w1"].shape[2]
    if src_mask is None:
        src_mask = jnp.ones((B, S), jnp.float32)
    elif src_mask.ndim == 3:
        src_mask = src_mask[:, 0, :]
    bi = _pick_bi_stack(B, kb, S, d, T, dff, x.dtype.itemsize,
                        cache_mode=cache_mode)
    grid = (L, B // bi)

    kern = functools.partial(_stack_kernel, n_heads=n_heads, kb=kb, bi=bi,
                             want_attn=want_attn, lazy=anc is not None,
                             cache_mode=cache_mode)

    in_specs = [
        pl.BlockSpec((bi, kb, d), lambda l, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),          # x0
        pl.BlockSpec((bi, kb, 1), lambda l, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),          # t
        pl.BlockSpec((1, bi, S, d), lambda l, i: (l, i, 0, 0),
                     memory_space=pltpu.VMEM),          # ck_all
        pl.BlockSpec((1, bi, S, d), lambda l, i: (l, i, 0, 0),
                     memory_space=pltpu.VMEM),          # cv_all
        pl.BlockSpec((bi, 1, S), lambda l, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),          # src_mask
        pl.BlockSpec((bi, kb, 1, T, d), lambda l, i: (i, 0, l, 0, 0),
                     memory_space=pltpu.VMEM),          # cache_k
        pl.BlockSpec((bi, kb, 1, T, d), lambda l, i: (i, 0, l, 0, 0),
                     memory_space=pltpu.VMEM),          # cache_v
    ] + ([pl.BlockSpec((bi, kb, T), lambda l, i: (i, 0, 0),
                       memory_space=pltpu.VMEM)]        # anc (lazy cache)
         if anc is not None else []) \
      + ([pl.BlockSpec(memory_space=pltpu.SMEM)]        # ts (window mode)
         if cache_mode == "window" else []) \
      + [pl.BlockSpec(memory_space=pl.ANY) for _ in _WKEYS]
    if cache_mode == "window":
        # ANY-space aliased outputs: the kernel window-DMAs slot t's
        # 8-aligned neighborhood; everything else keeps the input bytes
        cache_out_spec = pl.BlockSpec(memory_space=pl.ANY)
        cache_out_shape = jax.ShapeDtypeStruct((B, kb, L, T, d),
                                               cache_k.dtype)
    elif cache_mode == "entries":
        # L leads: a [*, 1(L), d] block would slice the tiled
        # second-to-minor dim (Mosaic: must be 8-aligned); [1(L), bi, kb,
        # d] blocks keep the tiled pair (kb, d) whole
        cache_out_spec = pl.BlockSpec((1, bi, kb, d),
                                      lambda l, i: (l, i, 0, 0),
                                      memory_space=pltpu.VMEM)
        cache_out_shape = jax.ShapeDtypeStruct((L, B, kb, d), cache_k.dtype)
    else:
        cache_out_spec = pl.BlockSpec((bi, kb, 1, T, d),
                                      lambda l, i: (i, 0, l, 0, 0),
                                      memory_space=pltpu.VMEM)
        cache_out_shape = jax.ShapeDtypeStruct((B, kb, L, T, d),
                                               cache_k.dtype)
    out_specs = (
        pl.BlockSpec((B, kb, d), lambda l, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),          # x carry / result
        cache_out_spec,
        cache_out_spec,
    )
    out_shape = (jax.ShapeDtypeStruct((B, kb, d), x.dtype),
                 cache_out_shape, cache_out_shape)
    if want_attn:
        out_specs = out_specs + (
            pl.BlockSpec((bi, kb, S), lambda l, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((B, kb, S), jnp.float32),)

    flops = L * R * (2 * (3 + 1 + 1 + 1) * d * d + 4 * d * dff
                     + 4 * T * d + 4 * S * d)
    wbytes = sum(int(np.prod(wstack[k].shape)) for k in _WKEYS)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # full/window cache outputs update in place; "entries" has no big
        # outputs to alias (the caller DUSes the entries into the carry)
        input_output_aliases=({} if cache_mode == "entries"
                              else {5: 1, 6: 2}),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        scratch_shapes=[pltpu.VMEM(wstack[k].shape[1:], wstack[k].dtype)
                        for k in _WKEYS]
        + ([pltpu.VMEM((2, bi, kb, 8, d), cache_k.dtype),
            pltpu.VMEM((2, bi, kb, 8, d), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),        # input window copies
            pltpu.SemaphoreType.DMA((2, 2))]      # out copies [parity, k/v]
           if cache_mode == "window" else [])
        + [pltpu.SemaphoreType.DMA((len(_WKEYS),))],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(L * 2 * B * S * d + L * 2 * R * T * d * 2
                            + wbytes) * x.dtype.itemsize,
            transcendentals=L * R * (T + S)),
    )(x.reshape(B, kb, d), t.reshape(B, kb, 1).astype(jnp.int32),
      ck_all, cv_all, src_mask.astype(jnp.float32)[:, None, :],
      cache_k.reshape(B, kb, L, T, d), cache_v.reshape(B, kb, L, T, d),
      *([anc.reshape(B, kb, T).astype(jnp.int32)] if anc is not None else []),
      *([t[:1].astype(jnp.int32)] if cache_mode == "window" else []),
      *[wstack[k] for k in _WKEYS])
    xn, kn, vn = outs[:3]
    if cache_mode == "entries":
        ret = (xn.reshape(R, d),
               jnp.transpose(kn, (1, 2, 0, 3)).reshape(R, L, d),
               jnp.transpose(vn, (1, 2, 0, 3)).reshape(R, L, d))
    else:
        ret = (xn.reshape(R, d), kn.reshape(R, L, T, d),
               vn.reshape(R, L, T, d))
    if want_attn:
        return ret + (outs[3].reshape(R, S),)
    return ret


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
