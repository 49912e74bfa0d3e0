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

    def body(carry, step_rng):
        state, it, unfinished = carry
        logprobs, state = step_fn(params, state, it)
        logprobs = logprobs.astype(jnp.float32)
        if greedy:
            nxt = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
        else:
            scaled = logprobs / jnp.float32(temperature)
            gumbel = -jnp.log(-jnp.log(
                jax.random.uniform(step_rng, logprobs.shape, minval=1e-20, maxval=1.0)))
            nxt = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
        tok_logprob = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
        nxt = jnp.where(unfinished, nxt, 0)
        new_unfinished = jnp.logical_and(unfinished, nxt > 0)
        return (state, nxt, new_unfinished), (nxt, tok_logprob)

    step_rngs = jax.random.split(rng, seq_length)
    (_, _, _), (seq, logps) = jax.lax.scan(
        body, (init_state, it0, unfinished0), step_rngs)
    return seq.T, logps.T  # scan stacks time-major; return batch-major
