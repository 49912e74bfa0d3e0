"""FC captioner: fc-feature-conditioned maxout-LSTM decoder.

Behavioral parity with the reference `FCModel_NMT` (models/FCModel_NMT.py,
the class actually wired for ``--caption_model fc``, models/__init__.py:24-26):

- image fed exactly once, at t=0, through `img_embed` (FCModel_NMT.py:95-97);
- custom maxout LSTM core with a single fused `i2h+h2h` 5*rnn_size gate
  matmul (FCModel_NMT.py:14-52) — here the fused Pallas cell (ops/rnn.py);
- dropout applied to the hidden state inside the cell (FCModel_NMT.py:47-49);
- `logit` to vocab_size+1 and log_softmax per step.

The per-timestep Python loop of the reference becomes `lax.scan`
(base.CaptionDecoder.forward); the image step runs once in `make_decoder`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import rnn
from .base import CaptionDecoder, Features, dropout, embedding_init, linear, linear_init


@dataclasses.dataclass(frozen=True)
class FCModel(CaptionDecoder):
    def init_params(self, rng) -> dict:
        ks = jax.random.split(rng, 4)
        return {
            "img_embed": linear_init(ks[0], self.fc_feat_size, self.input_encoding_size),
            "embed": embedding_init(ks[1], self.vocab_size + 1, self.input_encoding_size),
            "core": rnn.init_lstm_params(ks[2], self.input_encoding_size,
                                         self.rnn_size, maxout=True),
            "logit": linear_init(ks[3], self.rnn_size, self.vocab_size + 1, scale=0.1),
        }

    def _core(self, params, xt, state, *, training: bool, rng):
        h, c = state
        h_new, c_new = rnn.lstm_step(params["core"], xt, h, c, maxout=True)
        out = dropout(rng, h_new, self.drop_prob_lm, training)
        return out, (h_new, c_new)

    def make_decoder(self, params, feats: Features, *, training: bool = False,
                     rng: Optional[jax.Array] = None) -> Tuple[Any, Any]:
        batch = feats.fc_feats.shape[0]
        h0 = jnp.zeros((batch, self.rnn_size), dtype=feats.fc_feats.dtype)
        state = (h0, h0)
        xt = linear(params["img_embed"], feats.fc_feats)
        _, state = self._core(params, xt, state, training=training, rng=rng)
        return None, state

    def step(self, params, ctx, state, it, *, training: bool = False,
             rng: Optional[jax.Array] = None):
        h, state = self.step_core(params, ctx, state, it, training=training,
                                  rng=rng)
        return self.head(params, h), state

    @property
    def has_split_head(self) -> bool:
        return True

    def step_core(self, params, ctx, state, it, *, training: bool = False,
                  rng: Optional[jax.Array] = None):
        del ctx
        xt = params["embed"][it]
        return self._core(params, xt, state, training=training, rng=rng)

    def head(self, params, h, *, training: bool = False,
             rng: Optional[jax.Array] = None):
        logits = linear(params["logit"], h)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
