"""Pallas row-wise top-k for beam selection.

Beam search needs top-k over the vocab dimension every decode step
(reference: the host `sorted(...)` of CaptionModel.py:61-74 and the flat
`topk` of onmt/Beam.py:72-80). XLA's generic variadic top-k on a
`[B*K, V]` f32 matrix measures ~42 us/step on v5e at [150, 9488] k=3 —
the largest single op in the decode loop after the attention rework. For
small k an iterative masked-argmax does the same job in a few VPU passes
over a VMEM-resident row block.

Tie semantics match `jax.lax.top_k` exactly: values descending, ties
broken by the LOWEST index first (each pass takes `min(index)` among the
maxima, then masks that column out) — this is what keeps token-identity
with the reference's stable host sorts (see ops/beam_search.py).

Returns (values [R, k] f32, indices [R, k] i32). Off-TPU (and for large
k, where iterative argmax loses to a single sort) it falls back to
`jax.lax.top_k`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# iterative masked-argmax is O(k) full passes over the row block — it
# wins at k<=2 (where the lane kernel's witness tier cannot save a
# pass), but at NMT beam-15 ([750,8571] k=15)
# the 15 full-width VPU passes are 81% of the translate's device time
# (xplane, round 3). Alternatives A/B'd at that shape (us/call, v5e,
# tools/perf/ab_topk15.py): iterative 618, chunked-two-stage 621 (the
# XLA glue — lax.top_k on chunk maxes + one-hot gather — eats the
# algorithmic win), lax.top_k 6807, approx_max_k 291 but INEXACT. The
# exact fix is `_lane_topk_pallas`: per-LANE top-m (m=4 sublane
# reduction passes build a 4*128-candidate set; global top-k ⊆ per-lane
# top-m unless >m of a row's true top-k share one lane, detected
# EXACTLY by a witness tier — see the kernel docstring — and handled by
# a lax.cond rerun of the iterative kernel), so ~m+2 pass-equivalents
# replace k: 210 us at the same shape, 2.9x, exact vs lax.top_k on
# device. Lanes are a strided partition (element v lives in lane
# v%128), so consecutive vocab ids — where peaked beam rows concentrate
# — land in distinct lanes, and on hash-spread ids the failure needs
# m+1 of the top-k in one of 128 lanes (~1e-5 per row at k=15). Also
# A/B'd and rejected earlier (15.6 ms/batch): a no-rewrite iterative
# variant excluding extracted elements via one lexicographic compare —
# the extra per-element predicate ops cost more than the masked
# rewrite. A grouped per-sentence variant (one kernel selecting
# directly over each sentence's [K*V] candidates, replacing
# beam_search._flat_topk's merge) was built and rejected: Mosaic's
# block-divisibility forces >=8*K rows per block, which blows the 16MB
# scoped-VMEM limit (18.34M at K=15, V=8571), and the merge it removes
# measures ~12 us. The chunked reduction is kept for very large k.
# Round-3 follow-up at the caption beam-5 shape ([250,9488] k=5,
# tools/perf/ab_topk5.py, chained-invocation us/call): iterative 143.5,
# lane m=4 129.4, m=3 115.9, m=2 101.7-but-14%-fallback-rate. In-loop
# (xplane, beam decode): k=5 lane m=3 32.7 us vs iterative 67.2; k=3
# lane m=2 18.9 vs iterative 23.4 — a lane tier (sublane-axis reduce)
# is ~2x cheaper than an iterative full-row pass, so everything k>=3
# routes to the lane kernel and only k<=2 stays iterative. The k=4 tier
# was measured directly round 4 (`ab_topk5.py 4`, same shape): iterative
# 137.3, lane m=4 122.9, m=3 129.0, m=2 112.1-but-~6%-fallback — m=3 and
# m=4 are within chained-A/B noise (which ranks but inflates); the
# m=3 routing stands on the measurement, not just tier economics.
MAX_ITERATIVE_K = 2
MAX_LANE_K = 16
LANE_M = 4


LANES = 128
CHUNK = 128


def _lane_m_for(k: int) -> int:
    """Smallest extraction depth whose containment-failure odds stay
    negligible (per-row failure = P(>m of the top-k share one of LANES
    lanes) ~ C(k, m+1)/128^m on hash-spread ids): k=3 tolerates m=2
    (6.1e-5/row), m=3 keeps k<=6 under ~1e-5/row, k>=7 needs m=4.
    Fewer tiers = fewer passes (tiers = m+1 incl. witness vs k for the
    iterative kernel), and a lane tier measures ~2x cheaper than an
    iterative full-row pass in-loop (the [BR, S, LANES] sublane-axis
    reduce vectorizes better than row-wide max+argmin): beam-5
    selection 67.2 -> 32.7 us/step on v5e. m=2 at k=5 would fire the
    iterative fallback on ~14% of [250-row] calls — a wash
    (tools/perf/ab_topk5.py)."""
    if k <= 3:
        return 2
    return 3 if k <= 6 else LANE_M


def _iterative_topk_body(x, vals_ref, idx_ref, *, k: int):
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    big = jnp.int32(2 ** 30)
    # Extracted columns are excluded via an explicit boolean, not by
    # rewriting the value buffer to -inf: a -inf rewrite is a no-op on
    # entries that are already -inf, which made rows with >=2 -inf
    # entries in their top-k return DUPLICATE indices (advisor finding,
    # round 2). With the mask, an all--inf tail resolves to ascending
    # untaken columns, exactly like lax.top_k.
    taken = jnp.zeros(x.shape, jnp.bool_)
    for j in range(k):
        cur = jnp.where(taken, -jnp.inf, x)
        m = jnp.max(cur, axis=1, keepdims=True)            # [BR, 1]
        i = jnp.min(jnp.where(jnp.logical_and(jnp.logical_not(taken),
                                              x == m), col, big),
                    axis=1, keepdims=True)                 # first max col
        vals_ref[:, j] = m[:, 0]
        idx_ref[:, j] = i[:, 0]
        if j + 1 < k:
            taken = jnp.logical_or(taken, col == i)


def _row_topk_kernel(x_ref, vals_ref, idx_ref, *, k: int):
    _iterative_topk_body(x_ref[:], vals_ref, idx_ref, k=k)


@functools.partial(jax.jit, static_argnames=("k", "block_r", "interpret"))
def _row_topk_pallas(x, *, k: int, block_r: int = 8, interpret: bool = False):
    rows, v = x.shape
    kern = functools.partial(_row_topk_kernel, k=k)
    vals, idx = pl.pallas_call(
        kern,
        grid=(pl.cdiv(rows, block_r),),
        in_specs=[pl.BlockSpec((block_r, v), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((block_r, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((rows, k), x.dtype),
                   jax.ShapeDtypeStruct((rows, k), jnp.int32)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * k * rows * v, bytes_accessed=rows * v * 4,
            transcendentals=0),
    )(x)
    return vals, idx


def _lane_topk_kernel(x_ref, vals_ref, idx_ref, trig_ref, *, k: int,
                      m: int, v: int, n_rows: int):
    """Per-lane top-m candidate reduction; exact modulo a trigger output.

    Lanes are the STRIDED partition lane(v) = v % LANES, so element
    [s, l] of the reshaped [BR, S, LANES] view has flat index s*LANES+l
    (consecutive vocab ids — where peaked beam rows concentrate — land
    in distinct lanes). m sublane-reduction passes extract each lane's
    top-m under lax.top_k's (value desc, index asc) order; the row's
    top-k is then selected from the m*LANES candidates. Containment
    (same theorem as `_chunked_topk`, lexicographic form, valid for any
    partition): a true top-k element can only be missing from the
    candidates if its lane's m candidates all beat it, i.e. >m of the
    row's top-k share one lane. That case is detected EXACTLY by one
    extra WITNESS pass — the best still-unextracted element of the row:
    the candidate top-k is the true top-k of (row \\ unseen), so an
    unseen element belongs in the true top-k iff the best unseen one
    lexicographically beats our k-th winner. trig ⟺ containment failed;
    no trigger ⟹ candidates ⊇ top-k ⟹ exact.

    Extracted positions are excluded via an explicit `avail` mask, not
    by rewriting values to -inf: the rewrite is a no-op on entries that
    are already -inf, which would re-emit duplicate positions from
    all--inf lanes AND hand the witness an already-seen position — a
    guaranteed false trigger on every dead-beam row (same hazard class
    as the round-2 advisor finding on `_iterative_topk_body`). With the
    mask, -inf lanes emit strictly ascending sublanes and the witness
    is always genuinely unseen. Candidate indices are unique, so the
    selection loop's -inf/big rewrite cannot collide.
    """
    br = x_ref.shape[0]
    x = x_ref[:]                                           # [BR, V] f32
    pad = (-v) % LANES
    if pad:
        # pad flat ids (>= v) are never emitted: a pad slot sits in a
        # lane's LAST sublane at value -inf, and each pad lane keeps at
        # least one real position available through all m+1 passes (the
        # routing gate v > (m+1)*LANES gives s >= m+2, so >= s-1-m >= 1
        # real slots survive m extractions), so a lower real sublane
        # always wins the min-sublane tie-break against the pad
        x = jnp.concatenate(
            [x, jnp.full((br, pad), -jnp.inf, x.dtype)], axis=1)
    s = (v + pad) // LANES
    xv = x.reshape(br, s, LANES)
    srow = jax.lax.broadcasted_iota(jnp.int32, (br, s, LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
    big = jnp.int32(2 ** 30)
    avail = jnp.ones((br, s, LANES), jnp.bool_)
    cvals, cidxs = [], []
    for j in range(m + 1):                                 # m tiers + witness
        cur = jnp.where(avail, xv, -jnp.inf)
        mx = jnp.max(cur, axis=1)                          # [BR, L]
        hit = jnp.logical_and(avail, xv == mx[:, None, :])
        sj = jnp.min(jnp.where(hit, srow, big), axis=1)    # [BR, L]
        if j < m:
            cvals.append(mx)
            cidxs.append(sj * LANES + lane)                # flat id in row
            avail = jnp.logical_and(avail, srow != sj[:, None, :])
        else:
            w_val, w_flat = mx, sj * LANES + lane          # best unseen/lane
    cv = jnp.concatenate(cvals, axis=1)                    # [BR, m*L]
    ci = jnp.concatenate(cidxs, axis=1)
    for j in range(k):
        mx = jnp.max(cv, axis=1, keepdims=True)            # [BR, 1]
        gi = jnp.min(jnp.where(cv == mx, ci, big), axis=1,
                     keepdims=True)                        # [BR, 1]
        vals_ref[:, j] = mx[:, 0]
        idx_ref[:, j] = gi[:, 0]
        if j + 1 < k:
            sel = ci == gi
            cv = jnp.where(sel, -jnp.inf, cv)
            ci = jnp.where(sel, big, ci)
        else:
            lastv, lasti = mx[:, 0], gi[:, 0]
    bw = jnp.max(w_val, axis=1)                            # [BR]
    bwi = jnp.min(jnp.where(w_val == bw[:, None], w_flat, big), axis=1)
    trig = jnp.logical_or(
        bw > lastv, jnp.logical_and(bw == lastv, bwi < lasti))
    # out-of-bounds rows of a ragged final block hold garbage — they are
    # dropped from vals/idx by the block writeback but must not trigger
    in_bounds = (pl.program_id(0) * br
                 + jax.lax.broadcasted_iota(jnp.int32, (br,), 0)) < n_rows
    trig_ref[:, 0] = jnp.logical_and(trig, in_bounds).astype(jnp.int32)


def _lane_topk_raw(x, *, k: int, m: int = LANE_M, block_r: int = 64,
                   interpret: bool = False):
    """Kernel invocation without the fallback: returns (vals, idx, trig
    [R,1] i32). trig != 0 on exactly the rows whose top-k is not
    guaranteed contained in the per-lane candidates (tests poke this to
    pin the trigger's false-positive behavior on degenerate rows)."""
    rows, v = x.shape
    kern = functools.partial(_lane_topk_kernel, k=k, m=m, v=v, n_rows=rows)
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(rows, block_r),),
        in_specs=[pl.BlockSpec((block_r, v), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((block_r, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((rows, k), x.dtype),
                   jax.ShapeDtypeStruct((rows, k), jnp.int32),
                   jax.ShapeDtypeStruct((rows, 1), jnp.int32)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * (m + 2) * rows * v, bytes_accessed=rows * v * 4,
            transcendentals=0),
    )(x)


@functools.partial(
    jax.jit, static_argnames=("k", "m", "block_r", "interpret"))
def _lane_topk_pallas(x, *, k: int, m: int = LANE_M, block_r: int = 64,
                      interpret: bool = False):
    """Row-wise top-k, `jax.lax.top_k`-identical. The rare containment
    failure (>m of a row's top-k in one lane, see kernel docstring)
    falls back to the exact iterative kernel through a `lax.cond`, so
    its k full-width passes are paid only when the witness actually
    fires (~1e-5 per row at k=15 on lane-hashed ids)."""
    vals, idx, trig = _lane_topk_raw(x, k=k, m=m, block_r=block_r,
                                     interpret=interpret)
    return jax.lax.cond(
        jnp.any(trig > 0),
        lambda: _row_topk_pallas(x, k=k, interpret=interpret),
        lambda: (vals, idx))


def _chunked_topk(x, k: int, interpret: bool = False):
    """Exact two-stage top-k for larger k: reduce to the top-k chunks by
    chunk-max, then run the iterative kernel on the k*CHUNK candidate set.

    Correctness: if element x has global rank <= k, then fewer than k
    elements rank above it, so fewer than k chunks have (max > x) or
    (max == x with a lower chunk id) — x's own chunk is therefore among
    the top-k chunks under lax.top_k's (value desc, index asc) order,
    and chunk id ascending == flat index ascending, so re-ranking the
    gathered candidates by (value desc, candidate position asc) over
    chunk-id-sorted candidates reproduces lax.top_k's flat tie-break
    exactly."""
    rows, v = x.shape
    # finite values only: the one-hot gather below multiplies every
    # element by 0 or 1 and 0 * inf = NaN. Beam selection matrices are
    # finite by construction (masks use -1e10); clamp defensively so a
    # stray -inf degrades to float-min ordering instead of NaNs.
    x = jnp.clip(x, jnp.finfo(x.dtype).min, jnp.finfo(x.dtype).max)
    vp = ((v + CHUNK - 1) // CHUNK) * CHUNK
    if vp != v:
        # pad only wins if a row has fewer than k entries above float-min,
        # which beam selection matrices never do
        x = jnp.pad(x, ((0, 0), (0, vp - v)),
                    constant_values=jnp.finfo(x.dtype).min)
    c = vp // CHUNK
    xc = x.reshape(rows, c, CHUNK)
    cmax = jnp.max(xc, axis=2)                               # [R, C]
    _, cid = jax.lax.top_k(cmax, k)                          # ties: low id
    cid = jnp.sort(cid, axis=1)                              # flat order
    # gather the k candidate chunks as a one-hot batched matmul: TPU
    # gathers are slow, the MXU is not, and onehot-x-value products/sums
    # are exact in f32 (x*1.0 + zeros)
    onehot = (cid[:, :, None] == jnp.arange(c)[None, None, :]).astype(x.dtype)
    cand = jnp.einsum("rkc,rcl->rkl", onehot, xc).reshape(rows, k * CHUNK)
    vals, p = _row_topk_pallas(cand, k=k, interpret=interpret)
    idx = (jnp.take_along_axis(cid, p // CHUNK, axis=1) * CHUNK
           + p % CHUNK).astype(jnp.int32)
    return vals, idx


def row_topk(x, k: int):
    """Top-k along the last axis of a 2-D f32 array, `lax.top_k`-identical
    (values desc, ties to the lowest index)."""
    if (jax.default_backend() == "tpu" and x.ndim == 2
            and x.dtype == jnp.float32 and x.shape[-1] >= 256):
        if k <= MAX_ITERATIVE_K:
            return _row_topk_pallas(x, k=k)
        # lane kernel needs every lane to hold > m REAL elements so the
        # -inf column padding can never surface as a candidate index
        m = _lane_m_for(k)
        if k <= MAX_LANE_K and x.shape[-1] > (m + 1) * LANES:
            return _lane_topk_pallas(x, k=k, m=m)
        if k * CHUNK * 2 <= x.shape[-1] and k <= 64:
            return _chunked_topk(x, k)
    return jax.lax.top_k(x, k)
