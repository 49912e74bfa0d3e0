"""The vendored OpenNMT fork's transformer layers, fork-faithful.

The production transformer-NMT route is `models/nmt_transformer.py` (modern
pre-norm AIAYN, megakernel decode). THIS module is the §2.8 fork-surface
twin of `onmt/modules/Transformer.py:1-110` + `MultiHeadedAttn.py:9-88` +
`onmt/Models.py:257-261,406-424` (the `-encoder_layer transformer
-decoder_layer transformer` option), which is a structurally DIFFERENT,
older architecture:

- POST-norm: LayerNorm runs at the END of each sublayer, and lives INSIDE
  the attention/FFN modules (`MultiHeadedAttn.py:25,80`,
  `Transformer.py:38,45`);
- the fork LayerNorm (`onmt/modules/Util.py:29-52`) uses UNBIASED std and
  eps=1e-3 OUTSIDE the sqrt;
- q/k/v projections carry NO bias and there is NO output projection — the
  per-head context concat feeds the residual directly
  (`MultiHeadedAttn.py:19-22,76-80`);
- the residual of the attention sublayer is the PRE-projection query;
- decode re-runs the FULL grown prefix every step
  (`onmt/Models.py:386-388,419-423` TransformerDecoderState.previous_input)
  — there is no KV cache in the fork;
- positional encoding uses the fork's own per-index formula
  (`onmt/Models.py:128-134`): pe[j, i] = sin(j / 10000^(2i/d)) for even i,
  cos(...) for odd i — NOT the paired sin/cos of the paper.

Weights load from fork checkpoints via `models/convert.py
convert_fork_transformer`; execution parity against the fork's own exec'd
sources (module outputs, stacks, and greedy decode token identity) is
pinned in `tests/test_ref_fork_transformer_parity.py`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from .. import constants as C


def fork_layer_norm(p, z, eps: float = 1e-3):
    """onmt/modules/Util.py:29-52 LayerNorm: unbiased std, eps outside the
    sqrt. (The d==1 passthrough branch never fires for d_model > 1.)"""
    z32 = z.astype(jnp.float32)
    mu = jnp.mean(z32, axis=-1, keepdims=True)
    n = z32.shape[-1]
    var = jnp.sum(jnp.square(z32 - mu), axis=-1, keepdims=True) / (n - 1)
    out = (z32 - mu) / (jnp.sqrt(var) + eps)
    return (out * p["a_2"] + p["b_2"]).astype(z.dtype)


def fork_positional_encoding(max_len: int, dim: int) -> jnp.ndarray:
    """onmt/Models.py:128-134 make_positional_encodings — per-INDEX
    frequency (2i/dim for the i-th channel), sin on even / cos on odd."""
    j = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    i = jnp.arange(dim, dtype=jnp.float32)[None, :]
    k = j / jnp.power(10000.0, 2.0 * i / dim)
    return jnp.where(jnp.arange(dim)[None, :] % 2 == 1, jnp.cos(k),
                     jnp.sin(k))


def fork_mha_apply(p, key, value, query, mask, *, n_heads: int):
    """MultiHeadedAttn.py:29-88. key/value/query [B, L, d]; mask [B, Lq, Lk]
    bool, True = masked (the fork's PAD convention). Returns (ret, attn)
    where ret includes the residual + post-LN and attn is the post-softmax
    per-head weights [B, h, Lq, Lk] (the fork returns them flattened as
    [B*h, Lq, Lk])."""
    d = query.shape[-1]
    dh = d // n_heads

    def split(x, w):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        b, l, _ = y.shape
        return y.reshape(b, l, n_heads, dh)

    k_up = split(key, p["k"]["w"])
    v_up = split(value, p["v"]["w"])
    q_up = split(query, p["q"]["w"])
    scaled = jnp.einsum("bqhd,bkhd->bhqk", q_up, k_up).astype(jnp.float32)
    scaled = scaled / math.sqrt(dh)
    if mask is not None:
        scaled = jnp.where(mask[:, None, :, :], -jnp.inf, scaled)
    attn = jax.nn.softmax(scaled, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(query.dtype), v_up)
    out = out.reshape(query.shape)
    res = out + query                     # residual = PRE-projection query
    return fork_layer_norm(p["ln"], res), attn


def fork_ffn_apply(p, x):
    """Transformer.py:32-45 PositionwiseFeedForward: post-norm residual,
    w_1/w_2 with bias (BottleLinear defaults)."""
    h = jax.nn.relu(jnp.dot(x, p["w1"]["w"],
                            preferred_element_type=jnp.float32)
                    .astype(x.dtype) + p["w1"]["b"])
    out = (jnp.dot(h, p["w2"]["w"], preferred_element_type=jnp.float32)
           .astype(x.dtype) + p["w2"]["b"])
    return fork_layer_norm(p["ln"], out + x)


def _pad_mask(q_ids, k_ids):
    """Transformer.py:12-21 get_attn_padding_mask: [B, Lq, Lk] True where
    the KEY token is PAD."""
    b, lk = k_ids.shape
    return jnp.broadcast_to((k_ids == C.PAD)[:, None, :],
                            (b, q_ids.shape[1], lk))


def fork_enc_layer_apply(lp, x, words, *, n_heads: int):
    """Transformer.py:48-69 TransformerEncoder.forward."""
    mask = _pad_mask(words, words)
    mid, _ = fork_mha_apply(lp["self"], x, x, x, mask, n_heads=n_heads)
    return fork_ffn_apply(lp["ffn"], mid)


def fork_dec_layer_apply(lp, x, context, src_words, tgt_words, *,
                         n_heads: int):
    """Transformer.py:72-110 TransformerDecoder.forward: self-attention
    under pad+subsequent mask, then context attention (key=value=context,
    query=self-attn output), then FFN. Returns (out, attn)."""
    t = tgt_words.shape[1]
    sub = jnp.triu(jnp.ones((t, t), bool), k=1)[None]
    dec_mask = jnp.logical_or(_pad_mask(tgt_words, tgt_words), sub)
    pad_mask = _pad_mask(tgt_words, src_words)
    query, _ = fork_mha_apply(lp["self"], x, x, x, dec_mask,
                              n_heads=n_heads)
    mid, attn = fork_mha_apply(lp["src"], context, context, query, pad_mask,
                               n_heads=n_heads)
    return fork_ffn_apply(lp["ffn"], mid), attn


@dataclasses.dataclass(frozen=True)
class ForkTransformerNMT:
    """Fork-semantics transformer NMT (batch-first everywhere; the fork's
    len-first tensors are transposed at its own module boundaries,
    onmt/Models.py:258,410-411)."""

    src_vocab_size: int
    tgt_vocab_size: int
    d_model: int = 512
    d_inner: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    position_encoding: bool = True
    max_len: int = 5000

    def _linear_init(self, rng, din, dout, bias=True):
        w = jax.random.normal(rng, (din, dout)) / math.sqrt(din)
        return {"w": w, "b": jnp.zeros((dout,))} if bias else {"w": w}

    def init_params(self, rng) -> dict:
        def mha_init(r):
            ks = jax.random.split(r, 3)
            d = self.d_model
            return {"q": self._linear_init(ks[0], d, d, bias=False),
                    "k": self._linear_init(ks[1], d, d, bias=False),
                    "v": self._linear_init(ks[2], d, d, bias=False),
                    "ln": {"a_2": jnp.ones((d,)), "b_2": jnp.zeros((d,))}}

        def ffn_init(r):
            k1, k2 = jax.random.split(r)
            d, f = self.d_model, self.d_inner
            return {"w1": self._linear_init(k1, d, f),
                    "w2": self._linear_init(k2, f, d),
                    "ln": {"a_2": jnp.ones((d,)), "b_2": jnp.zeros((d,))}}

        ks = jax.random.split(rng, 3 + 3 * self.num_layers)
        p = {"src_embed": jax.random.normal(
                 ks[0], (self.src_vocab_size, self.d_model)) * 0.1,
             "tgt_embed": jax.random.normal(
                 ks[1], (self.tgt_vocab_size, self.d_model)) * 0.1,
             "generator": self._linear_init(ks[2], self.d_model,
                                            self.tgt_vocab_size),
             "enc": [], "dec": []}
        for i in range(self.num_layers):
            r1, r2, r3 = jax.random.split(ks[3 + 3 * i], 3)
            p["enc"].append({"self": mha_init(r1), "ffn": ffn_init(r2)})
            r4, r5, r6 = jax.random.split(ks[3 + 3 * i + 1], 3)
            p["dec"].append({"self": mha_init(r4), "src": mha_init(r5),
                             "ffn": ffn_init(r6)})
        return p

    def _embed(self, table, ids):
        emb = table[ids]
        if self.position_encoding:
            pe = fork_positional_encoding(ids.shape[1], self.d_model)
            emb = emb + pe[None].astype(emb.dtype)
        return emb

    def encode(self, params, src_ids):
        """onmt/Models.py:257-261: emb -> L fork encoder layers. No final
        norm (post-norm layers end normalized)."""
        x = self._embed(params["src_embed"], src_ids)
        for lp in params["enc"]:
            x = fork_enc_layer_apply(lp, x, src_ids, n_heads=self.num_heads)
        return x

    def decode(self, params, context, src_ids, tgt_ids):
        """onmt/Models.py:406-424: full-prefix decoder stack. Returns
        (outputs [B, T, d], last layer's attn [B, h, T, S])."""
        x = self._embed(params["tgt_embed"], tgt_ids)
        attn = None
        for lp in params["dec"]:
            x, attn = fork_dec_layer_apply(lp, x, context, src_ids, tgt_ids,
                                           n_heads=self.num_heads)
        return x, attn

    def forward(self, params, src_ids, tgt_ids):
        """Teacher forcing: log-probs [B, T, tgt_vocab] over the generator
        (Linear + LogSoftmax, the fork's external generator)."""
        ctxv = self.encode(params, src_ids)
        out, attn = self.decode(params, ctxv, src_ids, tgt_ids)
        logits = (jnp.dot(out, params["generator"]["w"],
                          preferred_element_type=jnp.float32)
                  + params["generator"]["b"])
        return jax.nn.log_softmax(logits, axis=-1), attn

    def translate_greedy(self, params, src_ids, max_len: int = 50):
        """Greedy decode with the fork's FULL-prefix re-run semantics
        (TransformerDecoderState accumulates previous_input; every step
        re-decodes the whole grown prefix and reads the last position —
        onmt/Models.py:386-388,419-423). The growing prefix makes each step
        its own shape, so the loop is a host loop like the fork's own
        Translator; this is the compatibility surface, not the production
        decode path (TransformerNMTModel's cached beam megakernel is)."""
        b = src_ids.shape[0]
        ctxv = self.encode(params, src_ids)
        prefix = jnp.full((b, max_len), C.PAD, jnp.int32)
        prefix = prefix.at[:, 0].set(C.BOS)
        toks = []
        done = jnp.zeros((b,), bool)
        for t in range(max_len - 1):
            out, _ = self.decode(params, ctxv, src_ids, prefix[:, :t + 1])
            logits = (jnp.dot(out[:, -1], params["generator"]["w"],
                              preferred_element_type=jnp.float32)
                      + params["generator"]["b"])
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, C.PAD, nxt)
            toks.append(nxt)
            done = jnp.logical_or(done, nxt == C.EOS)
            prefix = prefix.at[:, t + 1].set(nxt)
        return jnp.stack(toks, axis=1)
