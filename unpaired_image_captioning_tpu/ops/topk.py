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

# iterative masked-argmax is O(k) full passes over the row block, yet it
# wins every measured beam shape. v5e, NMT beam-15 translate ms/batch
# ([750,8571] k=15 selection): iterative 12.5, chunked two-stage 15.0
# with a take_along_axis gather / 14.3 with the one-hot-matmul gather,
# XLA sort-based top-k 20.5. Also
# A/B'd and rejected (15.6): a no-rewrite variant that excludes extracted
# elements via one lexicographic compare against the last (value, index)
# pair — the extra per-element predicate ops cost more than the masked
# buffer rewrite. The chunked reduction is kept for very large k where
# O(k) full passes must lose eventually.
MAX_ITERATIVE_K = 16
CHUNK = 128


def _row_topk_kernel(x_ref, vals_ref, idx_ref, *, k: int):
    x = x_ref[:]                                           # [BR, V] f32
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
        if k * CHUNK * 2 <= x.shape[-1] and k <= 64:
            return _chunked_topk(x, k)
    return jax.lax.top_k(x, k)
