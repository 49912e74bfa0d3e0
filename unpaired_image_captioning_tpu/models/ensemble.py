"""Model ensembles: probabilities averaged after softmax, then re-logged.

Parity: reference `models/AttEnsemble.py` — per-model hidden states carried
side by side, per-step distributions averaged in probability space (:53),
then the shared beam search runs on the mixed distribution. The reference
needed a bespoke beam_search handling list-of-list states (:100-244); here
the generic vectorized beam search consumes the ensemble like any model
because states are just a tuple pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp

from .base import CaptionDecoder, Features


@dataclasses.dataclass(frozen=True)
class AttEnsemble:
    models: Tuple[CaptionDecoder, ...]

    def __post_init__(self):
        assert len(self.models) >= 1
        sl = {m.seq_length for m in self.models}
        assert len(sl) == 1, "ensemble members must share seq_length"
        vs = {m.vocab_size for m in self.models}
        assert len(vs) == 1, "ensemble members must share vocab"

    @property
    def seq_length(self) -> int:
        return self.models[0].seq_length

    @property
    def vocab_size(self) -> int:
        return self.models[0].vocab_size

    def make_decoder(self, params_list: Sequence, feats: Features, *,
                     training: bool = False, rng=None):
        ctxs, states = [], []
        for m, p in zip(self.models, params_list):
            ctx, st = m.make_decoder(p, feats, training=training, rng=rng)
            ctxs.append(ctx)
            states.append(st)
        return tuple(ctxs), tuple(states)

    def step(self, params_list, ctxs, states, it, *, training: bool = False,
             rng=None):
        probs = None
        new_states = []
        for m, p, c, s in zip(self.models, params_list, ctxs, states):
            lp, ns = m.step(p, c, s, it, training=training, rng=rng)
            pr = jnp.exp(lp.astype(jnp.float32))
            probs = pr if probs is None else probs + pr
            new_states.append(ns)
        probs = probs / len(self.models)
        return jnp.log(jnp.maximum(probs, 1e-20)), tuple(new_states)

    def sample(self, params_list, feats: Features, rng, *, greedy: bool = True,
               temperature: float = 1.0):
        from ..ops.sampling import sample as _sample

        ctxs, states = self.make_decoder(params_list, feats)
        ctxs = tuple(m.decode_ctx(c) for m, c in zip(self.models, ctxs))

        def step_fn(p, state, it):
            return self.step(p, ctxs, state, it)

        return _sample(step_fn, params_list, states, feats.fc_feats.shape[0],
                       self.seq_length, rng, greedy=greedy,
                       temperature=temperature)

    def sample_beam(self, params_list, feats: Features, *, beam_size: int,
                    **beam_opts):
        from ..ops.beam_search import beam_search

        ctxs, states = self.make_decoder(params_list, feats)
        ctxs = tuple(m.decode_ctx(c) for m, c in zip(self.models, ctxs))

        def step_fn(p, c, state, it):
            return self.step(p, c, state, it)

        # per-member unexpanded beam memories (each member's
        # attention_apply handles the [B*K] query vs [B] memory split)
        no_expand = tuple(m.beam_ctx_no_expand for m in self.models)
        return beam_search(step_fn, params_list, ctxs, states,
                           beam_size=beam_size, seq_length=self.seq_length,
                           eos_is_zero=True, ctx_no_expand=no_expand,
                           **beam_opts)
