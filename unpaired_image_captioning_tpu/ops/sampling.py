"""Batched autoregressive sampling as one `lax.scan` program.

Replaces the reference's per-timestep Python sampling loop with finished-mask
early-exit (AttModel.py:198-253) by a fixed-length scan with the same
semantics: token 0 is BOS and EOS; once a sequence emits 0 it stays 0; the
recorded logprob is that of the sampled token.

The model is abstracted as a step function:
    step_fn(params, state, it) -> (logprobs [B, V+1], new_state)
where `it` is the previous token ids [B] (0 at t=0 = BOS feed).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

StepFn = Callable  # (params, state, it) -> (logprobs, state)


def sample(
    step_fn: StepFn,
    params,
    init_state,
    batch_size: int,
    seq_length: int,
    rng: jax.Array,
    *,
    greedy: bool = True,
    temperature: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (seq [B, T] int32, logprobs [B, T] f32).

    greedy=True  -> argmax decode (reference sample_max=1)
    greedy=False -> multinomial with temperature (reference sample_max=0),
                    implemented via Gumbel-max (pure tensor op, on-device).
    """
    it0 = jnp.zeros((batch_size,), dtype=jnp.int32)
    unfinished0 = jnp.ones((batch_size,), dtype=jnp.bool_)
    seq0 = jnp.zeros((batch_size, seq_length), jnp.int32)
    logps0 = jnp.zeros((batch_size, seq_length), jnp.float32)
    step_rngs = jax.random.split(rng, seq_length)

    # while_loop with an early exit once every sequence has emitted EOS
    # (the reference's `if unfinished.sum() == 0: break`, AttModel.py:242)
    def cond(carry):
        t, state, it, unfinished, seq, logps = carry
        return jnp.logical_and(t < seq_length, jnp.any(unfinished))

    def body(carry):
        t, state, it, unfinished, seq, logps = carry
        logprobs, state = step_fn(params, state, it)
        logprobs = logprobs.astype(jnp.float32)
        if greedy:
            nxt = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
        else:
            scaled = logprobs / jnp.float32(temperature)
            gumbel = -jnp.log(-jnp.log(
                jax.random.uniform(step_rngs[t], logprobs.shape,
                                   minval=1e-20, maxval=1.0)))
            nxt = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
        tok_logprob = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
        nxt = jnp.where(unfinished, nxt, 0)
        write = jnp.arange(seq_length)[None, :] == t
        seq = jnp.where(write, nxt[:, None], seq)
        logps = jnp.where(write, jnp.where(unfinished, tok_logprob, 0.0)[:, None],
                          logps)
        unfinished = jnp.logical_and(unfinished, nxt > 0)
        return (t + 1, state, nxt, unfinished, seq, logps)

    _, _, _, _, seq, logps = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init_state, it0, unfinished0, seq0, logps0))
    return seq, logps
