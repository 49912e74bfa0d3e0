"""LSTM cells, including the fused maxout cell used by the FC captioner.

The reference's `LSTMCore` (models/FCModel.py:14-42) computes one fused
`i2h(x) + h2h(h)` matmul producing 5*rnn_size gate pre-activations: three
sigmoid gates (i, f, o) and a 2-way **maxout** input transform; the
FCModel_NMT variant (models/FCModel_NMT.py:47-49) additionally applies
dropout to the hidden state inside the cell.

Here the cell is a single `[B, D+H] @ [D+H, G*H]` matmul plus an elementwise
block — an ideal Pallas fusion target: the gate intermediate never leaves
VMEM. A numerically identical pure-XLA path is used on CPU (tests) and as a
fallback for unaligned shapes.

Weights layout (one pytree per cell):
    w: f32[D + H, G*H]   (input rows first, then hidden rows)
    b: f32[G*H]
with G = 4 (standard LSTM: i, f, o, g-tanh) or G = 5 (maxout: i, f, o, m1, m2).
Gate order matches the description above.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def init_lstm_params(rng, input_size: int, hidden_size: int, *, maxout: bool = False,
                     dtype=jnp.float32) -> dict:
    g = 5 if maxout else 4
    k1, k2 = jax.random.split(rng)
    scale = 1.0 / jnp.sqrt(hidden_size)
    w = jax.random.uniform(k1, (input_size + hidden_size, g * hidden_size),
                           dtype=dtype, minval=-scale, maxval=scale)
    b = jax.random.uniform(k2, (g * hidden_size,), dtype=dtype,
                           minval=-scale, maxval=scale)
    return {"w": w, "b": b}


def _lstm_elementwise(gates, c, hidden_size: int, maxout: bool):
    h_ = hidden_size
    sig = jax.nn.sigmoid(gates[..., : 3 * h_])
    i_g = sig[..., :h_]
    f_g = sig[..., h_: 2 * h_]
    o_g = sig[..., 2 * h_: 3 * h_]
    if maxout:
        in_t = jnp.maximum(gates[..., 3 * h_: 4 * h_], gates[..., 4 * h_: 5 * h_])
    else:
        in_t = jnp.tanh(gates[..., 3 * h_: 4 * h_])
    c_new = f_g * c + i_g * in_t
    h_new = o_g * jnp.tanh(c_new)
    return h_new, c_new


def lstm_step_ref(params, x, h, c, *, maxout: bool = False):
    """Pure-XLA reference cell. x: [B, D]; h, c: [B, H]."""
    hidden_size = h.shape[-1]
    xh = jnp.concatenate([x, h], axis=-1)
    gates = jnp.dot(xh, params["w"], preferred_element_type=jnp.float32)
    gates = gates + params["b"].astype(jnp.float32)
    return _lstm_elementwise(gates, c.astype(jnp.float32), hidden_size, maxout)


def _fused_cell_kernel(x_ref, h_ref, c_ref, w_ref, b_ref, h_out, c_out,
                       *, hidden_size: int, maxout: bool):
    d = x_ref.shape[-1]
    # gate preactivations: [TB, G*H], accumulated in fp32 on the MXU
    gates = (
        jnp.dot(x_ref[:], w_ref[:d, :], preferred_element_type=jnp.float32)
        + jnp.dot(h_ref[:], w_ref[d:, :], preferred_element_type=jnp.float32)
        + b_ref[:].astype(jnp.float32)
    )
    h_new, c_new = _lstm_elementwise(gates, c_ref[:].astype(jnp.float32),
                                     hidden_size, maxout)
    h_out[:] = h_new.astype(h_out.dtype)
    c_out[:] = c_new.astype(c_out.dtype)


@functools.partial(jax.jit, static_argnames=("maxout", "block_b", "interpret"))
def _fused_lstm_pallas(w, b, x, h, c, *, maxout: bool, block_b: int,
                       interpret: bool = False):
    batch, _ = x.shape
    hidden = h.shape[-1]
    grid = (pl.cdiv(batch, block_b),)
    kern = functools.partial(_fused_cell_kernel, hidden_size=hidden, maxout=maxout)
    g = 5 if maxout else 4
    out_shape = (
        jax.ShapeDtypeStruct((batch, hidden), h.dtype),
        jax.ShapeDtypeStruct((batch, hidden), c.dtype),
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, x.shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((x.shape[-1] + hidden, g * hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g * hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * (x.shape[-1] + hidden) * g * hidden,
            bytes_accessed=(x.size + h.size + c.size) * 4
            + (x.shape[-1] + hidden) * g * hidden * 4,
            transcendentals=batch * hidden * 4,
        ),
    )(x, h, c, w, b)


@functools.lru_cache(maxsize=None)
def _make_fused_cell_vjp(maxout: bool, block_b: int, interpret: bool):
    """Pallas forward + XLA-reference backward (pallas_call has no
    auto-VJP; training differentiates through the cell)."""

    @jax.custom_vjp
    def cell(w, b, x, h, c):
        hn, cn = _fused_lstm_pallas(w, b, x, h, c, maxout=maxout,
                                    block_b=block_b, interpret=interpret)
        return hn.astype(h.dtype), cn.astype(c.dtype)

    def ref(w, b, x, h, c):
        hn, cn = lstm_step_ref({"w": w, "b": b}, x, h, c, maxout=maxout)
        return hn.astype(h.dtype), cn.astype(c.dtype)

    def fwd(w, b, x, h, c):
        return cell(w, b, x, h, c), (w, b, x, h, c)

    def bwd(res, ct):
        _, vjp = jax.vjp(ref, *res)
        return vjp(ct)

    cell.defvjp(fwd, bwd)
    return cell


def lstm_step(params, x, h, c, *, maxout: bool = False,
              use_pallas: bool | None = None) -> Tuple[jax.Array, jax.Array]:
    """One LSTM step. Uses the fused Pallas kernel on TPU when shapes align
    (differentiable: custom VJP recomputes gates via the reference path).

    Returns (h_new, c_new), both [B, H] in h.dtype.
    """
    hidden = h.shape[-1]
    batch = x.shape[0]
    if use_pallas is None:
        use_pallas = _on_tpu()
    aligned = hidden % 128 == 0 and x.shape[-1] % 128 == 0 and batch % 8 == 0
    if use_pallas and aligned:
        block_b = min(batch, 256)
        if batch % block_b != 0:
            block_b = batch
        cell = _make_fused_cell_vjp(maxout, block_b, not _on_tpu())
        return cell(params["w"], params["b"], x, h, c)
    h_new, c_new = lstm_step_ref(params, x, h, c, maxout=maxout)
    return h_new.astype(h.dtype), c_new.astype(c.dtype)


# ---------------------------------------------------------------------------
# Stacked input-feed cells (NMT decoder; reference onmt/modules/StackedRNN.py)
# ---------------------------------------------------------------------------

def init_stacked_lstm(rng, num_layers: int, input_size: int, hidden_size: int,
                      dtype=jnp.float32) -> list:
    params = []
    for layer in range(num_layers):
        rng, sub = jax.random.split(rng)
        in_size = input_size if layer == 0 else hidden_size
        params.append(init_lstm_params(sub, in_size, hidden_size, dtype=dtype))
    return params


def stacked_lstm_step(params: list, x, hs, cs, *, dropout_rng=None,
                      dropout: float = 0.0):
    """Input-feed stacked LSTM step (parity: StackedRNN.py:5-35).

    hs, cs: [L, B, H]. Dropout applied between layers (not after the last).
    Returns (top_h, new_hs, new_cs).
    """
    num_layers = len(params)
    new_h, new_c = [], []
    inp = x
    for layer in range(num_layers):
        h_i, c_i = lstm_step(params[layer], inp, hs[layer], cs[layer])
        inp = h_i
        if layer + 1 != num_layers and dropout > 0.0 and dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, inp.shape)
            inp = jnp.where(keep, inp / (1.0 - dropout), 0.0).astype(inp.dtype)
        new_h.append(h_i)
        new_c.append(c_i)
    return inp, jnp.stack(new_h), jnp.stack(new_c)
