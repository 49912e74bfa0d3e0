"""Timestep-blocked maxout-LSTM chain: the round-5 challenge to the LSTM
training floor (VERDICT r4 Weak #6 / Next #5).

BASELINE.md's floor analysis argues the teacher-forcing scan runs AT its
HBM streaming floor because each timestep re-streams the recurrent core
(reference cell: models/FCModel.py:26-42). This module is the structure
that could beat that floor for a single cell:

1. The input-side gate contributions are scan-invariant under teacher
   forcing, so ``x_contrib = xh_in @ w_i2h + b`` hoists OUT of the
   recurrence as one large [B*T, D] x [D, G*H] MXU matmul (weights read
   once, not T times) — and so does its backward (``dW_i2h = xh_in^T @
   dgates``, one matmul instead of T streamed accumulations).
2. What remains sequential is only the h2h half: ``gates_t = x_contrib_t
   + h_{t-1} @ w_h2h``. The forward kernel keeps w_h2h (2.6 MB bf16 at
   H=512) VMEM-resident across ALL T grid steps and streams just the
   per-step activations; the backward kernel keeps w_h2h^T resident, runs
   the reverse dh/dc recurrence, and emits dgates to HBM so every weight
   gradient becomes one hoisted matmul (the cuDNN-style blocked
   formulation).

Whether this beats XLA's scan at the protocol batch (50) is an empirical
question — the A/B lives in tools/perf/ab_lstm_block.py and its verdict
in BASELINE.md. Parity: chain outputs match a lax.scan of
ops.rnn.lstm_step_ref step-for-step (same per-step h/c dtype casts),
gradients match the scan's to float tolerance
(tests/test_lstm_block.py).

Why only ONE cell: in the Stack/Dense cores (models/att.py) lstm1/lstm2
consume in-step attention outputs, so their x-side cannot hoist and their
recurrence cannot be blocked without dragging the 196-slot attention (and
its 20 MB/step memory stream) into the kernel; lstm0's input
[word_emb_t, fc] is fully known before the scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rnn import _lstm_elementwise


# ---------------------------------------------------------------------------
# forward: grid (T,), w_h2h resident, h/c carried in VMEM scratch
# ---------------------------------------------------------------------------

def _chain_fwd_kernel(x_ref, h0_ref, c0_ref, w_ref, hs_ref, cs_ref,
                      gates_ref, h_scr, c_scr, *, hidden: int, maxout: bool):
    # time-major layout ([T, B, *]): the blocked axis must lead so the
    # trailing two block dims equal the array dims (Mosaic block rule)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    gates = (x_ref[0].astype(jnp.float32)
             + jnp.dot(h_scr[:], w_ref[:],
                       preferred_element_type=jnp.float32))
    h_new, c_new = _lstm_elementwise(gates, c_scr[:].astype(jnp.float32),
                                     hidden, maxout)
    # match the scan path's per-step casts (lstm_step returns h/c in the
    # carry dtype, so the next step's matmul consumes the cast value)
    h_scr[:] = h_new.astype(h_scr.dtype)
    c_scr[:] = c_new.astype(c_scr.dtype)
    hs_ref[0] = h_scr[:]
    cs_ref[0] = c_scr[:]
    gates_ref[0] = gates.astype(gates_ref.dtype)


def _chain_fwd(x_contrib, h0, c0, w_h2h, *, maxout: bool, interpret: bool):
    t, b, gh = x_contrib.shape
    hidden = h0.shape[-1]
    kern = functools.partial(_chain_fwd_kernel, hidden=hidden, maxout=maxout)
    return pl.pallas_call(
        kern,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, gh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, gh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, b, hidden), h0.dtype),
            jax.ShapeDtypeStruct((t, b, hidden), c0.dtype),
            # saved preactivation residuals follow the input precision:
            # bf16 under mixed-precision training (halves the bwd stream),
            # f32 when the caller computes in f32
            jax.ShapeDtypeStruct((t, b, gh), x_contrib.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((b, hidden), h0.dtype),
                        pltpu.VMEM((b, hidden), c0.dtype)],
        interpret=interpret,
    )(x_contrib, h0, c0, w_h2h)


# ---------------------------------------------------------------------------
# backward: grid (T,) reversed, w_h2h^T resident, dh/dc carried in scratch;
# dgates emitted to HBM (weight grads become hoisted matmuls outside) and
# the final carries ARE dh0/dc0 (written every step, last grid write wins)
# ---------------------------------------------------------------------------

def _chain_bwd_kernel(gates_ref, cprev_ref, c_ref, dhs_ref, dcs_ref, wT_ref,
                      dgates_ref, dh0_ref, dc0_ref, dh_scr, dc_scr, *,
                      hidden: int, maxout: bool):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    g = gates_ref[0].astype(jnp.float32)
    sig = jax.nn.sigmoid(g[:, : 3 * hidden])
    i_g = sig[:, :hidden]
    f_g = sig[:, hidden: 2 * hidden]
    o_g = sig[:, 2 * hidden: 3 * hidden]
    if maxout:
        m1 = g[:, 3 * hidden: 4 * hidden]
        m2 = g[:, 4 * hidden: 5 * hidden]
        in_t = jnp.maximum(m1, m2)
    else:
        in_t = jnp.tanh(g[:, 3 * hidden: 4 * hidden])
    c_t = c_ref[0].astype(jnp.float32)
    c_prev = cprev_ref[0].astype(jnp.float32)
    th = jnp.tanh(c_t)

    dh = dhs_ref[0].astype(jnp.float32) + dh_scr[:]
    do = dh * th
    dct = (dh * o_g * (1.0 - th * th) + dc_scr[:]
           + dcs_ref[0].astype(jnp.float32))
    dgi = dct * in_t * i_g * (1.0 - i_g)
    dgf = dct * c_prev * f_g * (1.0 - f_g)
    dgo = do * o_g * (1.0 - o_g)
    dm = dct * i_g
    if maxout:
        pick = (m1 >= m2).astype(jnp.float32)
        dtail = jnp.concatenate([dm * pick, dm * (1.0 - pick)], axis=-1)
    else:
        dtail = dm * (1.0 - in_t * in_t)
    dgates = jnp.concatenate([dgi, dgf, dgo, dtail], axis=-1)
    dgates_ref[0] = dgates
    dh_scr[:] = jnp.dot(dgates.astype(wT_ref.dtype), wT_ref[:],
                        preferred_element_type=jnp.float32)
    dc_scr[:] = dct * f_g
    # after the LAST grid step (t==0 processed) these hold exactly the
    # cotangents flowing into h0/c0; earlier writes are overwritten
    dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)
    dc0_ref[:] = dc_scr[:].astype(dc0_ref.dtype)


def _chain_bwd_call(gates, cs_prev, cs, dhs, dcs, w_h2h_T, h_dtype, c_dtype,
                    *, maxout: bool, interpret: bool):
    t, b, gh = gates.shape
    hidden = cs.shape[-1]
    kern = functools.partial(_chain_bwd_kernel, hidden=hidden, maxout=maxout)
    rev = t - 1

    def _r(i):
        return (rev - i, 0, 0)

    return pl.pallas_call(
        kern,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, gh), _r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), _r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), _r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), _r, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, hidden), _r, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, gh), _r, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, b, gh), jnp.float32),
            jax.ShapeDtypeStruct((b, hidden), h_dtype),
            jax.ShapeDtypeStruct((b, hidden), c_dtype),
        ),
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32),
                        pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=interpret,
    )(gates, cs_prev, cs, dhs, dcs, w_h2h_T)


# ---------------------------------------------------------------------------
# public chain with custom VJP
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_chain(maxout: bool, interpret: bool):
    @jax.custom_vjp
    def chain(x_contrib, h0, c0, w_h2h):
        hs, cs, _ = _chain_fwd(x_contrib, h0, c0, w_h2h, maxout=maxout,
                               interpret=interpret)
        return hs, cs

    def fwd(x_contrib, h0, c0, w_h2h):
        hs, cs, gates = _chain_fwd(x_contrib, h0, c0, w_h2h, maxout=maxout,
                                   interpret=interpret)
        return (hs, cs), (hs, cs, gates, h0, c0, w_h2h)

    def bwd(res, cts):
        hs, cs, gates, h0, c0, w_h2h = res
        dhs, dcs = cts
        cs_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
        hs_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
        dgates, dh0, dc0 = _chain_bwd_call(
            gates, cs_prev, cs, dhs, dcs, w_h2h.T, h0.dtype, c0.dtype,
            maxout=maxout, interpret=interpret)
        dx_contrib = dgates
        dw = jnp.einsum("tbh,tbg->hg",
                        hs_prev.astype(jnp.float32), dgates
                        ).astype(w_h2h.dtype)
        return dx_contrib, dh0, dc0, dw

    chain.defvjp(fwd, bwd)
    return chain


def blocked_lstm_chain(x_contrib, h0, c0, w_h2h, *, maxout: bool = True,
                       interpret: bool | None = None):
    """Run T LSTM steps with w_h2h VMEM-resident (see module docstring).

    TIME-MAJOR layout throughout ([T, B, *]) — the natural lax.scan
    stacking order, and required by Mosaic's block rule (the trailing two
    block dims must equal the array dims, so the per-step blocked axis
    leads).

    x_contrib: [T, B, G*H] — precomputed ``xh_in @ w_i2h + b`` (its dtype
               sets the saved-residual precision: f32 exact, bf16 lean).
    h0, c0:    [B, H] (bf16 in training; per-step casts match a
               lstm_step_ref chain that casts h/c to the carry dtype
               each step, i.e. the production scan path).
    w_h2h:     [H, G*H] (the hidden rows of ops.rnn's fused weight).
    Returns (hs [T, B, H], cs [T, B, H]). Differentiable via a blocked
    reverse-recurrence kernel; both h and c cotangents are honored.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _make_chain(maxout, interpret)(x_contrib, h0, c0, w_h2h)
