"""Show-and-tell: plain stacked-LSTM decoder, image fed once at t=0.

Parity: reference `models/ShowTellModel.py:14-171` — `img_embed` Linear,
word embedding, nn.LSTM core (num_layers, inter-layer dropout), logit,
dropout on the top hidden state. Present as a class but unwired in the
reference factory; wired here under ``--caption_model show_tell``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import rnn
from .base import CaptionDecoder, Features, dropout, embedding_init, linear, linear_init


@dataclasses.dataclass(frozen=True)
class ShowTellModel(CaptionDecoder):
    def init_params(self, rng) -> dict:
        ks = jax.random.split(rng, 4)
        return {
            "img_embed": linear_init(ks[0], self.fc_feat_size, self.input_encoding_size),
            "embed": embedding_init(ks[1], self.vocab_size + 1, self.input_encoding_size),
            "core": rnn.init_stacked_lstm(ks[2], self.num_layers,
                                          self.input_encoding_size, self.rnn_size),
            "logit": linear_init(ks[3], self.rnn_size, self.vocab_size + 1, scale=0.1),
        }

    def _core(self, params, xt, state, *, training: bool, rng):
        h, c = state  # [B, L, H]
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        top, hs, cs = rnn.stacked_lstm_step(
            params["core"], xt, jnp.moveaxis(h, 1, 0), jnp.moveaxis(c, 1, 0),
            dropout_rng=r1 if training else None, dropout=self.drop_prob_lm)
        out = dropout(r2, top, self.drop_prob_lm, training)
        return out, (jnp.moveaxis(hs, 0, 1), jnp.moveaxis(cs, 0, 1))

    def make_decoder(self, params, feats: Features, *, training: bool = False,
                     rng: Optional[jax.Array] = None) -> Tuple[Any, Any]:
        batch = feats.fc_feats.shape[0]
        z = jnp.zeros((batch, self.num_layers, self.rnn_size),
                      dtype=feats.fc_feats.dtype)
        xt = linear(params["img_embed"], feats.fc_feats)
        _, state = self._core(params, xt, (z, z), training=training, rng=rng)
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


@dataclasses.dataclass(frozen=True)
class AllImgModel(CaptionDecoder):
    """all_img: the raw fc feature concatenated to EVERY step's word input.

    Parity: reference `models/OldModel.py` AllImgCore (:234-249) +
    AllImgModel (:256) — nn.LSTM over [word_emb; fc_feats], image-derived
    initial hidden (`init_hidden` via `linear`, OldModel.py:48-53).
    """

    def init_params(self, rng) -> dict:
        ks = jax.random.split(rng, 4)
        return {
            "img_linear": linear_init(ks[0], self.fc_feat_size,
                                      self.num_layers * self.rnn_size),
            "embed": embedding_init(ks[1], self.vocab_size + 1,
                                    self.input_encoding_size),
            "core": rnn.init_stacked_lstm(
                ks[2], self.num_layers,
                self.input_encoding_size + self.fc_feat_size, self.rnn_size),
            "logit": linear_init(ks[3], self.rnn_size, self.vocab_size + 1,
                                 scale=0.1),
        }

    def make_decoder(self, params, feats: Features, *, training: bool = False,
                     rng: Optional[jax.Array] = None) -> Tuple[Any, Any]:
        img = linear(params["img_linear"], feats.fc_feats)
        img = img.reshape(feats.fc_feats.shape[0], self.num_layers,
                          self.rnn_size)
        return {"fc": feats.fc_feats}, (img, img)

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
        xt = jnp.concatenate([params["embed"][it], ctx["fc"]], axis=-1)
        h, c = state
        top, hs, cs = rnn.stacked_lstm_step(
            params["core"], xt, jnp.moveaxis(h, 1, 0), jnp.moveaxis(c, 1, 0),
            dropout_rng=rng if training else None, dropout=self.drop_prob_lm)
        out = dropout(rng, top, self.drop_prob_lm, training)
        return out, (jnp.moveaxis(hs, 0, 1), jnp.moveaxis(cs, 0, 1))

    def head(self, params, h, *, training: bool = False,
             rng: Optional[jax.Array] = None):
        logits = linear(params["logit"], h)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
