"""StackCap: coarse-to-fine 3-stage captioner with attribute features.

Parity: reference `models/StackCapModel.py` — AttModel-style embeddings plus
an `attri_embed` (bias-free Linear + ReLU + dropout) over the 1601-d box
class-probability attribute vector (:62-64); `StackCapCore` (:255-293):
three maxout LSTMCores where lstm1/lstm2 receive `xt + attri_emb`
alongside stacked hiddens and attention results; the core returns
`[h_0, h_1, fusion2([h_0,h_1,h_2])]` feeding a 3-headed shared logit whose
losses sum (criterion.py:138-159). Decoding uses the final head only
(:244-249).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import rnn
from .att import AttModel, _rngs, attention_apply, attention_init
from .base import Features, dropout, linear, linear_init


@dataclasses.dataclass(frozen=True)
class StackCapModel(AttModel):
    attri_feat_size: int = 1601
    attri_hid_size: int = 512

    @property
    def eff_num_layers(self):
        return 3

    def init_params(self, rng):
        p = super().init_params(rng)
        k = jax.random.fold_in(rng, 202)
        p["attri_embed"] = {"w": linear_init(k, self.attri_feat_size,
                                             self.input_encoding_size)["w"]}
        return p

    def core_init(self, rng):
        ks = _rngs(rng, 7)
        h = self.rnn_size
        e = self.input_encoding_size
        return {
            "lstm0": rnn.init_lstm_params(ks[0], e + h, h, maxout=True),
            "lstm1": rnn.init_lstm_params(ks[1], e + 2 * h, h, maxout=True),
            "lstm2": rnn.init_lstm_params(ks[2], e + 2 * h, h, maxout=True),
            "att1": attention_init(ks[3], h, self.att_hid_size),
            "att2": attention_init(ks[4], h, self.att_hid_size),
            "fusion1": linear_init(ks[5], 2 * h, h),
            "fusion2": linear_init(ks[6], 3 * h, h),
        }

    def make_decoder(self, params, feats: Features, *, training=False, rng=None,
                     aux_out=None):
        r = _rngs(rng, 2)
        ctx, state = super().make_decoder(params, feats, training=training,
                                          rng=r[0], aux_out=aux_out)
        attri = feats.attri_feats
        if attri is None:
            attri = jnp.zeros((feats.fc_feats.shape[0], self.attri_feat_size),
                              feats.fc_feats.dtype)
        attri_x = jnp.dot(attri, params["attri_embed"]["w"],
                          preferred_element_type=jnp.float32).astype(attri.dtype)
        ctx["attri"] = dropout(r[1], jax.nn.relu(attri_x), self.drop_prob_lm, training)
        return ctx, state

    def _core_heads(self, p, xt, ctx, state, *, training, rng):
        h, c = state
        r = _rngs(rng, 2)
        h0, c0 = rnn.lstm_step(p["lstm0"], jnp.concatenate([xt, ctx["fc"]], -1),
                               h[:, 0], c[:, 0], maxout=True)
        att1 = attention_apply(p["att1"], h0, ctx["att"], ctx["p_att"],
                               ctx["masks"], training=training)
        xa = xt + ctx["attri"]
        h1, c1 = rnn.lstm_step(p["lstm1"], jnp.concatenate([xa, h0, att1], -1),
                               h[:, 1], c[:, 1], maxout=True)
        att2 = attention_apply(p["att2"], h1, ctx["att"], ctx["p_att"],
                               ctx["masks"], training=training)
        fused01 = dropout(r[0], jax.nn.relu(
            linear(p["fusion1"], jnp.concatenate([h0, h1], -1))),
            self.drop_prob_lm, training)
        h2, c2 = rnn.lstm_step(p["lstm2"], jnp.concatenate([xa, fused01, att2], -1),
                               h[:, 2], c[:, 2], maxout=True)
        final = dropout(r[1], jax.nn.relu(
            linear(p["fusion2"], jnp.concatenate([h0, h1, h2], -1))),
            self.drop_prob_lm, training)
        new_state = (jnp.stack([h0, h1, h2], 1), jnp.stack([c0, c1, c2], 1))
        return [h0, h1, final], new_state

    def core_step(self, p, xt, ctx, state, *, training, rng):
        heads, state = self._core_heads(p, xt, ctx, state, training=training, rng=rng)
        return heads[-1], state  # decode path uses the final head (:244-249)

    def forward(self, params, feats: Features, seq, *, training: bool = False,
                rng: Optional[jax.Array] = None, ss_prob: float = 0.0,
                ss_enabled: bool = True, aux_out=None):
        """3-headed teacher forcing: returns a list of three [B, L-1, V+1]
        logprob tensors (coarse, fine, final) for the summed loss."""
        batch = seq.shape[0]
        n_steps = seq.shape[1] - 1
        if rng is None:
            rng = jax.random.PRNGKey(0)
        ctx_rng, dec_rng = jax.random.split(rng)
        ctx, state0 = self.make_decoder(params, feats, training=training,
                                        rng=ctx_rng, aux_out=aux_out)
        use_ss = training  # traced ss_prob: the coin flip handles 0 exactly
        vocab_p1 = self.vocab_size + 1
        init_lp = jnp.zeros((batch, vocab_p1), jnp.float32)

        def body(carry, inp):
            state, prev_lp = carry
            tok, step_rng, t = inp
            if use_ss:
                r1, r2, r3 = jax.random.split(step_rng, 3)
                # t=0 (BOS) is never replaced — reference gates on i >= 1
                # (AttModel.py:130); prev_lp at t=0 is uninformative zeros.
                coin = (jax.random.uniform(r1, (batch,)) < ss_prob) & (t > 0)
                sampled = jax.random.categorical(r2, prev_lp, axis=-1).astype(tok.dtype)
                it = jnp.where(coin, sampled, tok)
                sub = r3
            else:
                it, sub = tok, step_rng
            r_embed, r_core, r_logit = jax.random.split(sub, 3)
            xt = params["embed"][it]
            xt = dropout(r_embed, jax.nn.relu(xt), self.drop_prob_lm, training)
            heads, state = self._core_heads(params["core"], xt, ctx, state,
                                            training=training, rng=r_core)
            lps = [jax.nn.log_softmax(
                self._logit(params, hd, training, r_logit).astype(jnp.float32),
                axis=-1) for hd in heads]
            return (state, lps[-1]), tuple(lps)

        step_rngs = jax.random.split(dec_rng, n_steps)
        (_, _), out = jax.lax.scan(body, (state0, init_lp),
                                   (seq[:, :-1].T, step_rngs,
                                    jnp.arange(n_steps)))
        return [jnp.transpose(o, (1, 0, 2)) for o in out]


# ---------------------------------------------------------------------------
# auxiliary modules shipped alongside StackCap in the reference
# ---------------------------------------------------------------------------

def bilinear_d3_init(rng, x_dim: int, y_dim: int) -> dict:
    """Parity: StackCapModel.py BilinearD3 (:300-330) — bilinear scoring
    `score[b, o] = x[b] @ W @ y[b, o]` over a 3-D candidate tensor."""
    scale = 1.0 / jnp.sqrt(x_dim)
    return {"w": jax.random.uniform(rng, (x_dim, y_dim), minval=-scale,
                                    maxval=scale)}


def bilinear_d3_apply(p, x, y):
    """x: [B, Dx]; y: [B, O, Dy] -> scores [B, O]."""
    xw = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)  # [B, Dy]
    return jnp.einsum("bd,bod->bo", xw, y.astype(xw.dtype))


def sentence_attention_init(rng, rnn_size: int, att_hid: int) -> dict:
    """Parity: StackCapModel.py sentence-attention module (:332-380) —
    additive attention over previously generated hidden states."""
    from .att import attention_init

    return attention_init(rng, rnn_size, att_hid)


def sentence_attention_apply(p, h, hist, hist_mask, training: bool = False):
    """h: [B, H] query; hist: [B, T, H] past hiddens; hist_mask: [B, T]."""
    from .att import attention_apply
    from .base import linear

    p_hist = linear(p["h2att"], hist)  # project history like ctx2att
    return attention_apply(p, h, hist, p_hist, hist_mask, training=training)
