"""Fused training-time LayerNorm (Pallas, custom VJP).

Why: at the protocol transformer shapes (6L-512, batch 50, 196-slot encoder,
17-token decoder) the XE step's xplane showed ~7 of its ~25 ms/step in
LayerNorm-adjacent XLA fusions — the forward mean/var reductions
(`convert_reduce_fusion`, ~190 us per encoder-sized call) and, worse, the
backward, which XLA splits into 3-4 separate fusions per norm (d_scale,
d_offset, and the two row-reduction terms of dx), each re-reading the full
[B, T, d] activation from HBM (~4.2 ms/step across 72 fusions). One
[B, T, d] tensor is 10 MB bf16, so a single-pass kernel's floor is ~24 us
forward (read x, write y) and ~37 us backward (read g + x, write dx).

The kernel takes the activation in its NATIVE [B, T, d] layout and grids
over batch blocks — a first 2D [B*T, d] version reshaped outside the kernel,
and since T=196 is not a sublane-tile multiple that reshape was a physical
relayout costing ~1.3 ms/step across the fwd+bwd graph (xplane: `reshape
bf16[9800,512]` + its transpose_jvp/copy-done partners), eating most of the
win. All reductions run in VMEM; d_scale/d_offset are accumulated across
grid steps in a f32 output ref (TPU grids are sequential).

Semantics are EXACTLY models/transformer.layer_norm (reference
TransformerModel.py:96-105 — torch's unbiased n-1 variance, eps OUTSIDE the
sqrt): compute in f32, y = (x - mean) / (sqrt(var) + eps) * scale + offset,
cast back to x.dtype. The backward differentiates that same formula (the
d(sqrt) = 1/(2 sqrt(var)) term and the n-1 divisor included), so gradients
match jax.grad of the XLA path to float tolerance; parity + gradient tests:
tests/test_ln_train.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target rows (= bb * T) per grid step: 1024 x 1024 f32 temporaries are
# ~4 MB, keeping the handful of live temps inside VMEM while amortizing
# per-grid-step overhead
_TARGET_ROWS = 1024


def _stats(x32, n, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.sum(jnp.square(x32 - mean), axis=-1, keepdims=True) / (n - 1)
    s = jnp.sqrt(var) + eps
    return mean, var, s


def _fwd_kernel(x_ref, s_ref, b_ref, y_ref, *, eps):
    x32 = x_ref[...].astype(jnp.float32)                  # [bb, T, d]
    mean, _, s = _stats(x32, x32.shape[-1], eps)
    xhat = (x32 - mean) / s
    y = xhat * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, s_ref, g_ref, dx_ref, ds_ref, db_ref, *, eps, nb):
    n = x_ref.shape[-1]
    x32 = x_ref[...].astype(jnp.float32)
    g32 = g_ref[...].astype(jnp.float32)
    # zero the tail block's padded batch rows so they don't pollute
    # d_scale/d_offset; mask the PRODUCT too — padded VMEM can be NaN and
    # NaN * 0 would poison the accumulator
    b0 = pl.program_id(0) * x_ref.shape[0]
    bid = b0 + jax.lax.broadcasted_iota(jnp.int32, x32.shape, 0)
    valid = bid < nb
    g32 = jnp.where(valid, g32, 0.0)
    mean, var, s = _stats(x32, n, eps)
    xm = x32 - mean
    xhat = xm / s
    dxhat = g32 * s_ref[...].astype(jnp.float32)
    # y = xhat * scale + offset; xhat = (x - mean) / (sqrt(var) + eps)
    dvar = (jnp.sum(dxhat * xm, axis=-1, keepdims=True)
            * (-1.0 / (s * s)) * (0.5 / jnp.sqrt(var)))
    dmean = -jnp.sum(dxhat, axis=-1, keepdims=True) / s
    dx = dxhat / s + dvar * (2.0 / (n - 1)) * xm + dmean / n
    dx_ref[...] = dx.astype(dx_ref.dtype)
    pds = jnp.sum(jnp.where(valid, g32 * xhat, 0.0), axis=(0, 1),
                  keepdims=True)                          # [1, 1, d] f32
    pdb = jnp.sum(g32, axis=(0, 1), keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ds_ref[...] = pds
        db_ref[...] = pdb

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        ds_ref[...] += pds
        db_ref[...] += pdb


def _specs(b, t, d):
    bb = min(b, max(1, _TARGET_ROWS // t))
    xspec = pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    return xspec, pspec, pl.cdiv(b, bb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, scale, offset, eps: float = 1e-6,
                     interpret: bool = False):
    """x [B, T, d] (f32/bf16) in its native layout, scale/offset [d].
    Returns y [B, T, d] in x.dtype."""
    y, _ = _ln_fwd(x, scale, offset, eps, interpret)
    return y


def _ln_fwd(x, scale, offset, eps, interpret):
    b, t, d = x.shape
    xspec, pspec, grid = _specs(b, t, d)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[xspec, pspec, pspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, 1, d), offset.reshape(1, 1, d))
    return y, (x, scale)


def _ln_bwd(eps, interpret, res, g):
    x, scale = res
    b, t, d = x.shape
    xspec, pspec, grid = _specs(b, t, d)
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, nb=b),
        grid=(grid,),
        in_specs=[xspec, pspec, xspec],
        out_specs=(xspec, pspec, pspec),
        out_shape=(jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct((1, 1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1, d), jnp.float32)),
        interpret=interpret,
    )(x, scale.reshape(1, 1, d), g.astype(x.dtype))
    return (dx, ds.reshape(d).astype(scale.dtype),
            db.reshape(d).astype(scale.dtype))


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)


def ln_kernel_ok(shape, d: int) -> bool:
    """Routing guard: 3D input, lane-clean width, bounded VMEM per block,
    and enough rows that the kernel beats per-call overhead."""
    if len(shape) != 3:
        return False
    rows = shape[0] * shape[1]
    return d % 128 == 0 and d <= 2048 and rows >= 64 and shape[1] <= 2048
