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

# iterative masked-argmax is O(k) passes; beyond this, one sort wins
MAX_ITERATIVE_K = 16


def _row_topk_kernel(x_ref, vals_ref, idx_ref, *, k: int):
    x = x_ref[:]                                           # [BR, V] f32
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    big = jnp.int32(2 ** 30)
    cur = x
    for j in range(k):
        m = jnp.max(cur, axis=1, keepdims=True)            # [BR, 1]
        i = jnp.min(jnp.where(cur == m, col, big), axis=1,
                    keepdims=True)                         # first max col
        vals_ref[:, j] = m[:, 0]
        idx_ref[:, j] = i[:, 0]
        if j + 1 < k:
            cur = jnp.where(col == i, -jnp.inf, cur)


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


def row_topk(x, k: int):
    """Top-k along the last axis of a 2-D f32 array, `lax.top_k`-identical
    (values desc, ties to the lowest index)."""
    if (jax.default_backend() == "tpu" and x.ndim == 2
            and x.dtype == jnp.float32 and k <= MAX_ITERATIVE_K
            and x.shape[-1] >= 256):
        return _row_topk_pallas(x, k=k)
    return jax.lax.top_k(x, k)
