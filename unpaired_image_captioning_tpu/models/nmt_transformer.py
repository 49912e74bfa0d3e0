"""Transformer NMT: the zh→en transformer recipe.

Parity role: the reference trains its best zh2en translator with an
external OpenNMT/tensor2tensor transformer (train.sh:147-265,
AI_Challenger/Baselines translation_and_interpretation run.sh:1-20) and the
vendored fork ships transformer encoder/decoder layers
(onmt/modules/Transformer.py, MultiHeadedAttn.py). This module provides the
same capability natively, sharing the attention/FFN/LayerNorm primitives
with the caption transformer (models/transformer.py) and exposing the SAME
interface as the recurrent `NMTModel` (forward / generator_logits /
translate_batch), so the trainer, translate CLI, and pivot path accept
either via ``--nmt_model_type transformer``.

Decode: fixed-size per-layer K/V cache (scan-safe static shapes), batched
beam via ops.beam_search with BOS/EOS ids.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from .. import constants as C
from .base import linear, linear_init
from .transformer import (DROPOUT, dec_layer_apply, enc_layer_apply,
                          ffn_apply, ffn_init, layer_norm, layer_norm_init,
                          mha_apply, mha_init, positional_encoding)
from .base import dropout as _dropout


def _rngs(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


# Whole-stack fused decode kernel (ops/transformer_decode.decoder_stack_step)
# for translate_batch: all L decoder layers in ONE Pallas program per beam
# step, with the last layer's mean-head cross-attention weights as a kernel
# output (the UNK→attn-argmax signal). This is the same megakernel that took
# the caption transformer 2,348 → 4,557 caps/s; the NMT variant's cross
# memory is even smaller (≤50-token sentences vs 196 att slots). The XLA
# step path remains the fallback and the parity reference
# (tests/test_nmt_transformer.py::test_translate_stack_kernel_token_identity).
STACK_KERNEL = True
_INTERPRET = False  # tests flip to run the kernel on CPU (interpret mode)


def _use_stack_kernel(d_model: int, num_heads: int) -> bool:
    dh = d_model // num_heads
    shape_ok = d_model % num_heads == 0 and dh % 8 == 0
    return (STACK_KERNEL and shape_ok
            and (jax.default_backend() == "tpu" or _INTERPRET))


@dataclasses.dataclass(frozen=True)
class TransformerNMTModel:
    src_vocab_size: int
    tgt_vocab_size: int
    d_model: int = 512
    d_ff: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    dropout: float = 0.1
    share_decoder_embeddings: bool = False
    max_decode_len: int = 100
    beam_size: int = 15

    @classmethod
    def from_config(cls, cfg) -> "TransformerNMTModel":
        return cls(src_vocab_size=cfg.nmt_src_vocab_size,
                   tgt_vocab_size=cfg.nmt_tgt_vocab_size,
                   d_model=cfg.word_vec_size, d_ff=cfg.rnn_size,
                   num_layers=cfg.layers, num_heads=cfg.num_heads,
                   dropout=cfg.dropout,
                   share_decoder_embeddings=cfg.share_decoder_embeddings)

    def init_params(self, rng) -> dict:
        d = self.d_model
        N = self.num_layers
        ks = _rngs(rng, 4 + 10 * N)
        i = iter(range(len(ks)))
        p = {
            "src_embed": jax.random.normal(ks[next(i)], (self.src_vocab_size, d)) * (d ** -0.5),
            "tgt_embed": jax.random.normal(ks[next(i)], (self.tgt_vocab_size, d)) * (d ** -0.5),
            "enc_norm": layer_norm_init(d),
            "dec_norm": layer_norm_init(d),
            "enc": [], "dec": [],
        }
        if not self.share_decoder_embeddings:
            p["generator"] = linear_init(ks[next(i)], d, self.tgt_vocab_size)
        else:
            p["generator"] = {"b": jnp.zeros((self.tgt_vocab_size,))}
        for _ in range(N):
            p["enc"].append({"self": mha_init(ks[next(i)], d),
                             "ffn": ffn_init(ks[next(i)], d, self.d_ff),
                             "n1": layer_norm_init(d), "n2": layer_norm_init(d)})
        for _ in range(N):
            p["dec"].append({"self": mha_init(ks[next(i)], d),
                             "src": mha_init(ks[next(i)], d),
                             "ffn": ffn_init(ks[next(i)], d, self.d_ff),
                             "n1": layer_norm_init(d), "n2": layer_norm_init(d),
                             "n3": layer_norm_init(d)})
        return p

    def _embed(self, table, ids, offset=None):
        d = self.d_model
        x = table[ids] * math.sqrt(d)
        x = x * (ids != C.PAD)[..., None].astype(x.dtype)
        if offset is None:
            t = ids.shape[-1]
            return x + positional_encoding(t, d)[None].astype(x.dtype)
        return x + positional_encoding(5000, d)[offset].astype(x.dtype)

    def encode(self, params, src_ids, lengths, *, training=False, rng=None):
        """Pre-norm encoder stack via the shared enc_layer_apply (same
        sublayer appliers — and the same fused whole-layer train kernel
        routing — as the caption transformer, models/transformer.py).
        Round 5: this also brought the FFN-internal dropout back to
        reference semantics on this route (it was silently rngless)."""
        r = _rngs(rng, 1 + 4 * self.num_layers)
        x = self._embed(params["src_embed"], src_ids)
        x = _dropout(r[0], x, self.dropout, training)
        s = src_ids.shape[-1]
        src_mask = (jnp.arange(s)[None, :] < lengths[:, None])[:, None, :]
        ri = 1
        for lp in params["enc"]:
            x = enc_layer_apply(lp, x, src_mask, self.num_heads,
                                training=training,
                                rngs=r[ri:ri + 4] if rng is not None
                                else None)
            ri += 4
        return layer_norm(params["enc_norm"], x), src_mask

    def generator_logits(self, params, output):
        if self.share_decoder_embeddings:
            return (jnp.dot(output, params["tgt_embed"].T,
                            preferred_element_type=jnp.float32)
                    + params["generator"]["b"])
        return linear(params["generator"], output).astype(jnp.float32)

    @staticmethod
    def src_embedding(params):
        return params["src_embed"]

    @staticmethod
    def tgt_embedding(params):
        return params["tgt_embed"]

    def gold_scores(self, params, src_ids, src_lengths, tgt_ids):
        """Per-sentence gold log-likelihood — same semantics (and same
        broken-upstream citation) as NMTModel.gold_scores."""
        outs = self.forward(params, src_ids, src_lengths, tgt_ids)[0]
        lp = jax.nn.log_softmax(
            self.generator_logits(params, outs), axis=-1)
        gold = tgt_ids[:, 1:]
        tok = jnp.take_along_axis(lp, gold[..., None].astype(jnp.int32),
                                  axis=-1)[..., 0]
        return jnp.sum(jnp.where(gold != C.PAD, tok, 0.0), axis=-1)

    def forward(self, params, src_ids, src_lengths, tgt_ids, *,
                training=False, rng=None):
        """Parallel teacher forcing. Returns (decoder outputs [B, T-1, d],
        cross-attentions placeholder None) matching NMTModel.forward."""
        r = _rngs(rng, 2 + 6 * self.num_layers)
        memory, src_mask = self.encode(params, src_ids, src_lengths,
                                       training=training, rng=r[0])
        tgt_in = tgt_ids[:, :-1]
        x = self._embed(params["tgt_embed"], tgt_in)
        x = _dropout(r[1], x, self.dropout, training)
        t = tgt_in.shape[-1]
        pad_ok = tgt_in != C.PAD
        causal = jnp.tril(jnp.ones((t, t), bool))
        tgt_mask = jnp.logical_and(pad_ok[:, None, :], causal[None])
        ri = 2
        for lp in params["dec"]:
            mk = linear(lp["src"]["k"], memory)
            mv = linear(lp["src"]["v"], memory)
            x = dec_layer_apply(lp, x, mk, mv, tgt_mask, src_mask,
                                self.num_heads, training=training,
                                rngs=r[ri:ri + 6] if rng is not None
                                else None)
            ri += 6
        return layer_norm(params["dec_norm"], x), None

    def translate_batch(self, params, src_ids, src_lengths, *,
                        beam_size: Optional[int] = None, n_best: int = 1,
                        max_len: Optional[int] = None, src2tgt=None):
        # src2tgt accepted for interface parity with NMTModel.translate_batch;
        # the transformer NMT has no copy attention so it is ignored.
        del src2tgt
        from ..ops.beam_search import onmt_beam_search

        beam_size = beam_size or self.beam_size
        T = max_len or self.max_decode_len
        d = self.d_model
        memory, src_mask = self.encode(params, src_ids, src_lengths)
        cross = [{"k": linear(lp["src"]["k"], memory),
                  "v": linear(lp["src"]["v"], memory)}
                 for lp in params["dec"]]
        b = src_ids.shape[0]
        ctx = {"cross": cross, "src_mask": src_mask, "memory": memory}
        if _use_stack_kernel(d, self.num_heads):
            return self._translate_batch_kernel(
                params, ctx, cross, memory, src_ids, beam_size, T)
        state0 = {
            "k": jnp.zeros((b, self.num_layers, T, d), memory.dtype),
            "v": jnp.zeros((b, self.num_layers, T, d), memory.dtype),
            "t": jnp.zeros((b,), jnp.int32),
            "attn": jnp.zeros((b, src_ids.shape[1]), jnp.float32),
        }

        def step_fn(p, c, state, it):
            t = state["t"]  # [B] per-row position (ADVICE r1: rows may be
            # time-staggered under grouped beam search)
            x = (p["tgt_embed"][it] * math.sqrt(d)
                 + positional_encoding(T, d)[t].astype(memory.dtype))[:, None, :]
            new_k, new_v = state["k"], state["v"]
            bsz = it.shape[0]
            bm = c["memory"].shape[0]
            kbeams = bsz // bm  # cross K/V unexpanded: read once per sentence
            nh = self.num_heads
            dh = d // nh
            pos_ok = (jnp.arange(T)[None, :] <= t[:, None])[:, None, :]
            attn_out = state["attn"]
            for li, lp in enumerate(p["dec"]):
                y = layer_norm(lp["n1"], x)
                k_t = linear(lp["self"]["k"], y)[:, 0]
                v_t = linear(lp["self"]["v"], y)[:, 0]
                write = (jnp.arange(T)[None, :] == t[:, None])[:, :, None]
                new_k = new_k.at[:, li].set(
                    jnp.where(write, k_t[:, None, :], new_k[:, li]))
                new_v = new_v.at[:, li].set(
                    jnp.where(write, v_t[:, None, :], new_v[:, li]))
                x = x + mha_apply(lp["self"], y, new_k[:, li], new_v[:, li],
                                  pos_ok, self.num_heads)
                y = layer_norm(lp["n2"], x)
                # cross-attention against the [B, S, ...] shared memory;
                # also expose mean-head weights for UNK replacement
                q = linear(lp["src"]["q"], y)
                qh = q.reshape(bm, kbeams, nh, dh)
                kh = c["cross"][li]["k"].reshape(bm, -1, nh, dh)
                scores = jnp.einsum("bkhd,bshd->bhks", qh, kh) / math.sqrt(dh)
                mask = c["src_mask"][:, None, :, :]       # [B, 1, 1, S]
                scores = jnp.where(mask, scores, -1e9)
                w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
                vh = c["cross"][li]["v"].reshape(bm, -1, nh, dh)
                ctx_vec = jnp.einsum("bhks,bshd->bkhd", w.astype(x.dtype), vh)
                ctx_vec = ctx_vec.reshape(bsz, 1, d)
                x = x + linear(lp["src"]["o"], ctx_vec)
                if li == len(p["dec"]) - 1:
                    attn_out = jnp.mean(w, axis=1).reshape(bsz, -1)
                y = layer_norm(lp["n3"], x)
                x = x + ffn_apply(lp["ffn"], y)
            x = layer_norm(p["dec_norm"], x)
            logits = self.generator_logits(p, x[:, 0])
            state = {"k": new_k, "v": new_v, "t": state["t"] + 1,
                     "attn": attn_out}
            return jax.nn.log_softmax(logits, axis=-1), state

        # onmt beam semantics, same as the RNN NMT path
        return onmt_beam_search(
            step_fn, params, ctx, state0, beam_size=beam_size, seq_length=T,
            bos_token=C.BOS, eos_token=C.EOS,
            ctx_no_expand=("cross", "src_mask", "memory"),
            record_aux_from_state=lambda st: jnp.argmax(st["attn"], axis=-1))

    def _translate_batch_kernel(self, params, ctx, cross, memory, src_ids,
                                beam_size: int, T: int):
        """Whole-stack-kernel beam decode: one Pallas program per step runs
        all L fused decoder layers (ops/transformer_decode.decoder_stack_step
        with want_attn=True for the UNK→attn-argmax trace). Token-identical
        to the XLA step path
        (tests/test_nmt_transformer.py::test_translate_stack_kernel_token_identity)."""
        from ..ops.beam_search import onmt_beam_search
        from ..ops.transformer_decode import (decoder_stack_step,
                                              pack_stack_weights)

        d = self.d_model
        b = src_ids.shape[0]
        # cache T padded to the bf16 sublane tile: the kernel's
        # [rows, T, d] -> [bi, kb*T, d] MXU cache view is layout-preserving
        # only for T % 16 == 0 (models/transformer._use_layer_kernel); the
        # pos<=t masks ignore the dead tail
        T_pad = -(-T // 16) * 16
        ctx = dict(ctx)
        del ctx["cross"]
        ctx["wstack"] = pack_stack_weights(params["dec"])
        ctx["cross_k"] = jnp.stack([c["k"] for c in cross])
        ctx["cross_v"] = jnp.stack([c["v"] for c in cross])
        state0 = {
            "k": jnp.zeros((b, self.num_layers, T_pad, d), memory.dtype),
            "v": jnp.zeros((b, self.num_layers, T_pad, d), memory.dtype),
            "t": jnp.zeros((b,), jnp.int32),
            "attn": jnp.zeros((b, src_ids.shape[1]), jnp.float32),
            # lazy-beam-cache ancestry (re-initialized by onmt_beam_search)
            "anc": jnp.zeros((b, T_pad), jnp.int32),
        }

        def step_fn(p, c, state, it):
            t = state["t"]
            x = (p["tgt_embed"][it] * math.sqrt(d)
                 + positional_encoding(T, d)[t].astype(memory.dtype))
            # cache_mode on-chip A/B: "window" at bi=2 wins (1,790
            # sents/s with the write-back DMA wait deferred two grid steps
            # by parity double-buffering; 1,675 with inline waits) — its
            # small window scratch frees VMEM for a second image per block,
            # halving grid steps and doubling the MXU M rows; "full" 1,563
            # (bi=1), "window" at bi=1 1,425 (inline output-DMA waits
            # serialize without the bi win), "entries" 1,267 (XLA copies
            # the cache around the caller-side DUS).
            # t is uniform across rows (onmt beam — window's requirement)
            x, k_all, v_all, attn = decoder_stack_step(
                x, t, c["cross_k"], c["cross_v"], c["src_mask"],
                state["k"], state["v"], c["wstack"], state["anc"],
                n_heads=self.num_heads, interpret=_INTERPRET,
                want_attn=True, cache_mode="window")
            x = layer_norm(p["dec_norm"], x[:, None, :])[:, 0]
            logits = self.generator_logits(p, x)
            state = {"k": k_all, "v": v_all, "t": t + 1, "attn": attn,
                     "anc": state["anc"]}
            return jax.nn.log_softmax(logits, axis=-1), state

        # k/v are LAZY: append-only rows + the anc mask inside the kernel
        # replace the per-step [R, L, T, d] cache reorder (xplane: the
        # reorder+freeze selects and their defensive copies were ~2/3 of
        # the decode's device time at beam 15)
        return onmt_beam_search(
            step_fn, params, ctx, state0, beam_size=beam_size, seq_length=T,
            bos_token=C.BOS, eos_token=C.EOS,
            ctx_no_expand=("src_mask", "memory", "wstack", "cross_k",
                           "cross_v"),
            record_aux_from_state=lambda st: jnp.argmax(st["attn"], axis=-1),
            lazy_state=("k", "v"), ancestry_key="anc")


def make_nmt_model(cfg):
    """Factory: --nmt_model_type {rnn, transformer}."""
    from .nmt import NMTModel

    kind = getattr(cfg, "nmt_model_type", "rnn")
    if kind == "transformer":
        return TransformerNMTModel.from_config(cfg)
    return NMTModel.from_config(cfg)
