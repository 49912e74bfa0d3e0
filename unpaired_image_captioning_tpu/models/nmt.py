"""NMT seq2seq: BiLSTM encoder + input-feed stacked-LSTM decoder with
global attention — the zh→en translator of the pivot pipeline.

Parity map (reference `models/NMT_Models.py` and the vendored
`misc/OpenNMT-py-dalegebit/onmt/`):

- `Embeddings` (:27-72): word LUT with PAD→0, optional sinusoid positional
  encoding + dropout;
- `Encoder` (:75-135): `layers`-layer bidirectional LSTM, hidden size
  rnn_size/2 per direction, packed sequences → here forward+backward
  `lax.scan` with length masks;
- `Decoder` (:137-271): StackedLSTM with input feed (prev attentional
  output concatenated to the word embedding), `GlobalAttention` (Luong
  dotprod default / Bahdanau mlp, pluggable softmax / sparsemax /
  constrained transforms, GlobalAttention.py:11-177), fertility
  upper-bound bookkeeping with a <SINK> column absorbing residual mass
  (`upper_bounds -= attn`, NMT_Models.py:229-243), optional context gate
  (Gate.py) and coverage;
- `NMTModel` (:273-420): encode → `_fix_enc_hidden` (bidir interleave fix)
  → init decoder state → decode; batched beam `translateBatch` (beam 15,
  100-step cap) is `ops.beam_search` with BOS/EOS ids and per-step
  source-attention argmax recorded for UNK replacement (:312-320).

Layout: batch-major everywhere ([B, T]) — the reference's time-major
tensors (and its DataParallel(dim=1) quirk) have no TPU purpose.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .. import constants as C
from ..ops import rnn
from ..ops.attention_transforms import TRANSFORMS
from .base import dropout as _dropout
from .base import linear, linear_init
from .transformer import positional_encoding

NEG_INF = -1e18


def _rngs(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def embeddings_init(rng, vocab: int, dim: int) -> dict:
    emb = jax.random.normal(rng, (vocab, dim)) * 0.01
    emb = emb.at[C.PAD].set(0.0)
    return {"word_lut": emb}


def embed_tokens(p, ids, *, position_encoding=False, pos_offset=None,
                 dropout=0.0, training=False, rng=None):
    """ids [...,] -> [..., E]; PAD embeds to exactly 0 (padding_idx parity)."""
    emb = p["word_lut"][ids]
    emb = emb * (ids != C.PAD)[..., None].astype(emb.dtype)
    if position_encoding:
        t = ids.shape[-1] if ids.ndim > 1 else 1
        dim = emb.shape[-1]
        pe = positional_encoding(5000, dim)
        if pos_offset is None:
            emb = emb + pe[:t][None].astype(emb.dtype)
        else:
            emb = emb + pe[pos_offset].astype(emb.dtype)
        emb = _dropout(rng, emb, dropout, training)
    return emb


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NMTEncoder:
    vocab_size: int
    word_vec_size: int = 512
    rnn_size: int = 512
    layers: int = 1
    brnn: bool = True
    dropout: float = 0.3
    position_encoding: bool = False
    # BottleLinear+ReLU on the source word embeddings. The main-repo
    # NMT_Models.py Encoder ALWAYS applies it (Embeddings.__init__'s py2
    # mutable default `feature_dicts=[]` is not-None, :28,41-42,67); the
    # vendored fork — the authoritative onmt per SURVEY §0 — defaults it
    # OFF (onmt/Models.py:96 feature_dicts=None, MLP only with real
    # feature dicts). Off by default here; flip on for main-repo parity
    # (tests/test_ref_nmt_source_parity.py executes that source).
    emb_mlp: bool = False
    # `word￨feat` source features (fork Models.py:110-125, 153-159): one
    # LUT of width feature_vec_size per column, concat with the word
    # embedding, ReLU(BottleLinear(...)) down to word_vec_size. The MLP is
    # structural once features exist (it restores the embedding width), so
    # feature_sizes ≠ () implies the emb_mlp path with the wider input.
    feature_sizes: tuple = ()
    feature_vec_size: int = 100
    # per-word fertility prediction head (fork Models.py:214-222, 275-287):
    # 1 + exp(W3 relu(W2 relu(W1 [enc_out; emb]))) per source position,
    # consumed as the constrained-attention upper-bound init instead of the
    # constant -fertility (Models.py:455-462). The fork reshapes the
    # S-major flat head output with .view(n_batch, s_len) — correct only
    # at batch 1 (exec-pinned there); here it is per-position [B, S].
    predict_fertility: bool = False

    @property
    def num_directions(self) -> int:
        return 2 if self.brnn else 1

    @property
    def hidden_size(self) -> int:
        assert self.rnn_size % self.num_directions == 0
        return self.rnn_size // self.num_directions

    def init_params(self, rng) -> dict:
        k0, k1 = jax.random.split(rng)
        p = {"embeddings": embeddings_init(k0, self.vocab_size, self.word_vec_size),
             "layers": []}
        if self.feature_sizes:
            p["embeddings"]["feature_luts"] = [
                embeddings_init(jax.random.fold_in(k0, 10 + j), n,
                                self.feature_vec_size)["word_lut"]
                for j, n in enumerate(self.feature_sizes)]
        if self.emb_mlp or self.feature_sizes:
            p["embeddings"]["linear"] = linear_init(
                jax.random.fold_in(k0, 1),
                self.word_vec_size
                + len(self.feature_sizes) * self.feature_vec_size,
                self.word_vec_size)
        if self.predict_fertility:
            # fork Models.py:218-222: two hidden layers of width 2*rnn,
            # bias-free scalar out
            d2 = 2 * self.rnn_size
            p["fertility_linear"] = linear_init(
                jax.random.fold_in(k0, 20),
                self.rnn_size + self.word_vec_size, d2)
            p["fertility_linear_2"] = linear_init(
                jax.random.fold_in(k0, 21), d2, d2)
            p["fertility_out"] = {"w": linear_init(
                jax.random.fold_in(k0, 22), d2, 1)["w"]}
        for layer in range(self.layers):
            in_size = (self.word_vec_size if layer == 0
                       else self.hidden_size * self.num_directions)
            lp = {"fwd": rnn.init_lstm_params(
                jax.random.fold_in(k1, 2 * layer), in_size, self.hidden_size)}
            if self.brnn:
                lp["bwd"] = rnn.init_lstm_params(
                    jax.random.fold_in(k1, 2 * layer + 1), in_size, self.hidden_size)
            p["layers"].append(lp)
        return p

    def _scan_dir(self, cell, x, lengths, reverse: bool):
        """One unidirectional LSTM layer over time with length masking."""
        b, s, _ = x.shape
        h0 = jnp.zeros((b, self.hidden_size), x.dtype)

        def step(carry, xt_t):
            h, c = carry
            xt, valid = xt_t
            h_new, c_new = rnn.lstm_step(cell, xt, h, c)
            h_new = jnp.where(valid[:, None], h_new, h)
            c_new = jnp.where(valid[:, None], c_new, c)
            return (h_new, c_new), h_new

        valid = jnp.arange(s)[None, :] < lengths[:, None]   # [B, S]
        xs = jnp.moveaxis(x, 1, 0)                           # [S, B, E]
        vs = valid.T
        if reverse:
            xs, vs = xs[::-1], vs[::-1]
        (h_f, c_f), hs = jax.lax.scan(step, (h0, h0), (xs, vs))
        if reverse:
            hs = hs[::-1]
        out = jnp.moveaxis(hs, 0, 1)                         # [B, S, H]
        # zero outputs at padded positions (packed-sequence parity)
        out = out * valid[..., None].astype(out.dtype)
        return out, h_f, c_f

    def fertility_values(self, params, context, emb_x):
        """Per-position predicted fertility [B, S] (fork Models.py:281-286:
        1 + exp of a 2-layer ReLU MLP over [top-layer outputs; embeddings];
        the dead use_sigmoid_fertility branch is not ported)."""
        h = jnp.concatenate([context, emb_x], axis=-1)
        h = jax.nn.relu(linear(params["fertility_linear"], h))
        h = jax.nn.relu(linear(params["fertility_linear_2"], h))
        out = jnp.dot(h, params["fertility_out"]["w"],
                      preferred_element_type=jnp.float32)[..., 0]
        return 1.0 + jnp.exp(out)

    def apply(self, params, src_ids, lengths, *, training=False, rng=None,
              src_feats=None, with_fertility=False):
        """src_ids: [B, S] int32; lengths: [B]. Returns (context [B, S, rnn],
        (h, c) each [layers, B, rnn]) with bidirectional halves concatenated
        — both between layers (torch bidirectional nn.LSTM semantics) and in
        the final hidden (parity: NMTModel._fix_enc_hidden, :284-287).

        src_feats: [B, S, n_feat] int32 word-feature ids (fork
        Models.py:153-159), required iff feature_sizes was configured."""
        r = _rngs(rng, 1 + self.layers)
        x = embed_tokens(params["embeddings"], src_ids,
                         position_encoding=self.position_encoding,
                         dropout=self.dropout, training=training, rng=r[0])
        if self.feature_sizes:
            assert src_feats is not None, "encoder configured with features"
            feats = [lut[src_feats[..., j]]
                     * (src_feats[..., j] != C.PAD)[..., None].astype(x.dtype)
                     for j, lut in enumerate(params["embeddings"]["feature_luts"])]
            x = jnp.concatenate([x] + feats, axis=-1)
        if self.emb_mlp or self.feature_sizes:
            x = jax.nn.relu(linear(params["embeddings"]["linear"], x))
        emb_x = x
        finals_h, finals_c = [], []
        for li, lp in enumerate(params["layers"]):
            out_f, h_f, c_f = self._scan_dir(lp["fwd"], x, lengths, False)
            if self.brnn:
                out_b, h_b, c_b = self._scan_dir(lp["bwd"], x, lengths, True)
                x_next = jnp.concatenate([out_f, out_b], axis=-1)
                finals_h.append(jnp.concatenate([h_f, h_b], axis=-1))
                finals_c.append(jnp.concatenate([c_f, c_b], axis=-1))
            else:
                x_next = out_f
                finals_h.append(h_f)
                finals_c.append(c_f)
            x = x_next
            if (training and self.dropout > 0 and r[1 + li] is not None
                    and li + 1 < self.layers):
                x = _dropout(r[1 + li], x, self.dropout, training)
        enc = (x, (jnp.stack(finals_h), jnp.stack(finals_c)))
        if with_fertility:
            assert self.predict_fertility
            return enc + (self.fertility_values(params, x, emb_x),)
        return enc


@dataclasses.dataclass(frozen=True)
class NMTImageEncoder:
    """im2text-style image encoder for the NMT decoder.

    Parity: reference `onmt/modules/ImageEncoder.py` (vendored, im2text) —
    conv feature grid flattened row-wise through a bidirectional LSTM with a
    learned per-row position embedding, producing an NMT-compatible
    (context, hidden) pair. Here the conv grid comes from models/resnet.
    """

    feat_size: int = 2048
    rnn_size: int = 512
    layers: int = 1
    dropout: float = 0.3

    def _enc(self) -> "NMTEncoder":
        return NMTEncoder(vocab_size=1, word_vec_size=self.feat_size,
                          rnn_size=self.rnn_size, layers=self.layers,
                          brnn=True, dropout=self.dropout)

    def init_params(self, rng) -> dict:
        k1, k2 = jax.random.split(rng)
        p = self._enc().init_params(k1)
        del p["embeddings"]
        p["row_embed"] = jax.random.normal(k2, (64, self.feat_size)) * 0.01
        return p

    def apply(self, params, feat_grid, *, training=False, rng=None):
        """feat_grid: [B, H, W, C] -> (context [B, H*W, rnn], (h, c))."""
        b, h, w, c = feat_grid.shape
        x = feat_grid + params["row_embed"][:h][None, :, None, :].astype(feat_grid.dtype)
        x = x.reshape(b, h * w, c)
        lengths = jnp.full((b,), h * w, jnp.int32)
        enc = self._enc()
        finals_h, finals_c = [], []
        for lp in params["layers"]:
            out_f, h_f, c_f = enc._scan_dir(lp["fwd"], x, lengths, False)
            out_b, h_b, c_b = enc._scan_dir(lp["bwd"], x, lengths, True)
            x = jnp.concatenate([out_f, out_b], axis=-1)
            finals_h.append(jnp.concatenate([h_f, h_b], axis=-1))
            finals_c.append(jnp.concatenate([c_f, c_b], axis=-1))
        return x, (jnp.stack(finals_h), jnp.stack(finals_c))


# ---------------------------------------------------------------------------
# Global attention
# ---------------------------------------------------------------------------

def global_attention_init(rng, dim: int, attn_type: str = "dotprod") -> dict:
    ks = _rngs(rng, 3)
    if attn_type == "dotprod":
        return {
            "linear_in": {"w": linear_init(ks[0], dim, dim)["w"]},
            "linear_out": {"w": linear_init(ks[1], 2 * dim, dim)["w"]},
        }
    return {  # mlp (Bahdanau)
        "linear_context": {"w": linear_init(ks[0], dim, dim)["w"]},
        "linear_query": {"w": linear_init(ks[1], dim, dim)["w"]},
        "v": {"w": linear_init(ks[2], dim, 1)["w"]},
    }


def global_attention_apply(p, query, context, *, attn_type="dotprod",
                           attn_transform="softmax", mask=None,
                           upper_bounds=None, c_attn=0.0):
    """query [B*K, D], context [B, S, D] -> (attn_out [B*K, D], attn [B*K, S]).

    Parity: GlobalAttention.forward (:84-177): -inf pad mask before the
    transform; dotprod concatenates [ctx; q] -> linear_out -> tanh.

    K > 1 (beam search with unexpanded encoder context,
    ops/beam_search ctx_no_expand): the context/mask are [B, ...] shared
    across beams and read once per sentence — a 15x traffic saving at the
    reference's beam width.
    """
    bq = query.shape[0]
    bm = context.shape[0]
    k = bq // bm
    if attn_type == "dotprod":
        q = jnp.dot(query, p["linear_in"]["w"],
                    preferred_element_type=jnp.float32).astype(query.dtype)
        scores = jnp.einsum("bsd,bkd->bks", context, q.reshape(bm, k, -1))
    else:
        wq = jnp.dot(query, p["linear_query"]["w"],
                     preferred_element_type=jnp.float32).reshape(bm, k, -1)
        uh = jnp.dot(context, p["linear_context"]["w"],
                     preferred_element_type=jnp.float32)
        wquh = jnp.tanh(uh[:, None, :, :] + wq[:, :, None, :])
        scores = jnp.dot(wquh, p["v"]["w"],
                         preferred_element_type=jnp.float32)[..., 0]
    scores = scores.reshape(bq, -1).astype(jnp.float32)
    if c_attn != 0.0 and upper_bounds is not None and "constrained" in attn_transform:
        ub = upper_bounds.at[:, -1].set(0.0)  # sink excluded (ref :160-165)
        scores = scores + c_attn * ub
    if mask is not None and mask.shape[0] != bq:
        mask = jnp.repeat(mask, k, axis=0)
    transform = TRANSFORMS[attn_transform]
    attn = transform(scores, mask=mask, upper_bounds=upper_bounds)
    weighted = jnp.einsum("bks,bsd->bkd",
                          attn.reshape(bm, k, -1).astype(context.dtype),
                          context).reshape(bq, -1)
    if attn_type == "dotprod":
        cat = jnp.concatenate([weighted, query], axis=-1)
        out = jnp.tanh(jnp.dot(cat, p["linear_out"]["w"],
                               preferred_element_type=jnp.float32)).astype(query.dtype)
    else:
        out = weighted
    return out, attn


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NMTDecoder:
    vocab_size: int
    word_vec_size: int = 512
    rnn_size: int = 512
    layers: int = 1
    input_feed: int = 1
    dropout: float = 0.3
    attention_type: str = "dotprod"
    attn_transform: str = "softmax"
    c_attn: float = 0.0
    fertility: Optional[float] = None
    coverage_attn: bool = False
    context_gate: Optional[str] = None
    position_encoding: bool = False
    copy_attn: bool = False
    # The reference initializes linear_cover but NEVER passes coverage into
    # GlobalAttention.forward at any call site (NMT_Models.py:241, fork
    # Models.py:503 — the coverage kwarg is dead at runtime; its
    # `if coverage:` guard would even raise on a multi-element tensor), so
    # executed-reference semantics accumulate coverage without feeding it
    # back. coverage_feed=True opts into the Tu et al. feedback the module
    # was clearly written for (tanh(ctx + linear_cover(cov))).
    coverage_feed: bool = False

    @property
    def rnn_input_size(self) -> int:
        return self.word_vec_size + (self.rnn_size if self.input_feed else 0)

    def init_params(self, rng) -> dict:
        ks = _rngs(rng, 5)
        p = {
            "embeddings": embeddings_init(ks[0], self.vocab_size, self.word_vec_size),
            "rnn": rnn.init_stacked_lstm(ks[1], self.layers,
                                         self.rnn_input_size, self.rnn_size),
            "attn": global_attention_init(ks[2], self.rnn_size, self.attention_type),
        }
        if self.context_gate is not None:
            # the gate consumes the INPUT-FED embedding (see step) — its
            # width is wv+rnn under input feeding, matching the reference's
            # runtime shapes (NMT_Models.py:237-245)
            emb_w = self.word_vec_size + (self.rnn_size if self.input_feed
                                          else 0)
            in_sz = emb_w + self.rnn_size + self.rnn_size
            p["gate"] = {
                "gate": linear_init(ks[3], in_sz, self.rnn_size),
                "source_proj": linear_init(ks[4], self.rnn_size, self.rnn_size),
                "target_proj": linear_init(
                    jax.random.fold_in(ks[4], 1),
                    emb_w + self.rnn_size, self.rnn_size),
            }
        if self.coverage_attn:
            p["linear_cover"] = {"w": linear_init(
                jax.random.fold_in(ks[3], 2), 1, self.rnn_size)["w"]}
        if self.copy_attn:
            # separate copy attention (Decoder.__init__ :178-181)
            p["copy_attn"] = global_attention_init(
                jax.random.fold_in(ks[3], 3), self.rnn_size,
                self.attention_type)
        return p

    def init_state(self, enc_hidden, context, upper_bounds_init=None) -> dict:
        """RNNDecoderState parity (:422-486): hidden from encoder, zero
        input feed, fertility upper bounds reset per sequence.

        upper_bounds_init [B, S]: per-position fertility budgets from the
        predicted-fertility head or a guided-alignment table (fork
        Models.py:455-470 max_word_coverage sources) — replaces the
        constant -fertility fill; the <SINK> pin applies either way."""
        h, c = enc_hidden  # [L, B, rnn]
        b = h.shape[1]
        s = context.shape[1]
        state = {
            "h": jnp.moveaxis(h, 0, 1),                   # [B, L, H] batch-major
            "c": jnp.moveaxis(c, 0, 1),
            "input_feed": jnp.zeros((b, self.rnn_size), context.dtype),
            "attn": jnp.zeros((b, s), jnp.float32),
            "t": jnp.zeros((b,), jnp.int32),              # step counter (pos enc)
        }
        if "constrained" in self.attn_transform:
            if upper_bounds_init is not None:
                ub = upper_bounds_init.astype(jnp.float32)
            else:
                fert = self.fertility if self.fertility is not None else 2.0
                ub = jnp.full((b, s), fert, jnp.float32)
            ub = ub.at[:, -1].set(100.0)  # <SINK> absorbs residual (:236-238)
            state["upper_bounds"] = ub
        if self.coverage_attn:
            state["coverage"] = jnp.zeros((b, s), jnp.float32)
        if self.copy_attn:
            state["copy_attn"] = jnp.zeros((b, s), jnp.float32)
        return state

    def step(self, params, context, state, it, *, src_mask=None,
             training=False, rng=None, pos=None):
        """One input-feed decode step. it: [B] token ids.
        Returns (output [B, rnn], attn [B, S], new state)."""
        r = _rngs(rng, 3)
        if pos is None:
            pos = state["t"]  # per-row position (rows may be time-staggered)
        emb = embed_tokens(params["embeddings"], it,
                           position_encoding=self.position_encoding,
                           pos_offset=pos, dropout=self.dropout,
                           training=training, rng=r[0])
        if self.input_feed:
            emb_in = jnp.concatenate([emb, state["input_feed"]], axis=-1)
        else:
            emb_in = emb
        rnn_out, hs, cs = rnn.stacked_lstm_step(
            params["rnn"], emb_in,
            jnp.moveaxis(state["h"], 1, 0), jnp.moveaxis(state["c"], 1, 0),
            dropout_rng=r[1] if training else None, dropout=self.dropout)
        ctx_in = context
        if self.coverage_attn and self.coverage_feed:
            cov = state["coverage"]
            ctx_in = jnp.tanh(context + jnp.dot(
                cov[..., None], params["linear_cover"]["w"],
                preferred_element_type=jnp.float32).astype(context.dtype))
        ub = state.get("upper_bounds")
        if ub is not None:
            # the reference re-pins the <SINK> bound to 100 EVERY step
            # before attention (NMT_Models.py:234, fork Models.py:493) —
            # the post-step decrement on the sink column never survives
            ub = ub.at[:, -1].set(100.0)
        attn_out, attn = global_attention_apply(
            params["attn"], rnn_out, ctx_in,
            attn_type=self.attention_type, attn_transform=self.attn_transform,
            mask=src_mask, upper_bounds=ub,
            c_attn=self.c_attn)
        if self.context_gate is not None:
            # the reference gates on the INPUT-FED embedding: emb_t is
            # [emb; prev output] by the time ContextGate sees it
            # (NMT_Models.py:237-245 — prev_emb = emb_t after the
            # input-feed concat). Exec-source parity (round 5) exposed the
            # plain-emb variant as a divergence; note the reference gate
            # path only RUNS when word_vec_size == rnn_size (the factory
            # declares wv-sized embeddings but receives the wv+rnn-sized
            # emb_t — Gate.py:32 vs the call at :245).
            g = params["gate"]
            zin = jnp.concatenate([emb_in, rnn_out, attn_out], axis=-1)
            z = jax.nn.sigmoid(linear(g["gate"], zin).astype(jnp.float32)).astype(emb.dtype)
            src_p = linear(g["source_proj"], attn_out)
            tgt_p = linear(g["target_proj"], jnp.concatenate([emb_in, rnn_out], -1))
            if self.context_gate == "source":
                out = jnp.tanh(tgt_p + z * src_p)
            elif self.context_gate == "target":
                out = jnp.tanh(z * tgt_p + src_p)
            else:
                out = jnp.tanh((1.0 - z) * tgt_p + z * src_p)
            out = _dropout(r[2], out, self.dropout, training)
        else:
            out = _dropout(r[2], attn_out, self.dropout, training)
        new_state = dict(state)
        new_state["h"] = jnp.moveaxis(hs, 0, 1)
        new_state["c"] = jnp.moveaxis(cs, 0, 1)
        new_state["input_feed"] = out if self.input_feed else state["input_feed"]
        new_state["attn"] = attn
        new_state["t"] = state["t"] + 1
        if self.copy_attn:
            # COPY stage (Decoder.forward :255-258): separate attention
            # from the attentional output over the raw context
            _, cp = global_attention_apply(
                params["copy_attn"], out, context,
                attn_type=self.attention_type, mask=src_mask)
            new_state["copy_attn"] = cp
        if ub is not None:
            new_state["upper_bounds"] = ub - attn  # (NMT_Models.py:243)
        if self.coverage_attn:
            new_state["coverage"] = state["coverage"] + attn
        return out, attn, new_state


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NMTModel:
    src_vocab_size: int
    tgt_vocab_size: int
    word_vec_size: int = 512
    rnn_size: int = 512
    layers: int = 1
    brnn: bool = True
    input_feed: int = 1
    dropout: float = 0.3
    attention_type: str = "dotprod"
    attn_transform: str = "softmax"
    c_attn: float = 0.0
    fertility: Optional[float] = None
    coverage_attn: bool = False
    coverage_feed: bool = False  # see NMTDecoder.coverage_feed
    context_gate: Optional[str] = None
    position_encoding: bool = False
    share_decoder_embeddings: bool = False
    copy_attn: bool = False
    max_decode_len: int = 100   # translateBatch cap (NMT_Models.py:348)
    beam_size: int = 15         # NMT_Models.py:323
    src_emb_mlp: bool = False   # main-repo encoder-embeddings MLP (see
    # NMTEncoder.emb_mlp — a py2 mutable-default accident upstream)
    src_feature_sizes: tuple = ()   # `word￨feat` source-feature vocab
    # sizes (fork Models.py:110-125; decoder never takes features, :322)
    feature_vec_size: int = 100
    predict_fertility: bool = False  # see NMTEncoder.predict_fertility;
    # effective with the constrained attn transforms (Models.py:455-462)
    remat: bool = False         # rematerialize decoder steps (the TPU-native
    # answer to the reference's sharded MemoryEfficientLoss,
    # onmt/Loss.py:100-213: trade recompute for activation memory)
    truncated_decoder: int = 0  # truncated BPTT segment length (fork
    # train.py:262-270 `-truncated_decoder`: batch.truncate + detached
    # decoder state between segments, gradients accumulated across them —
    # here one scan with the carry stop-gradiented at segment boundaries,
    # the same gradient semantics without leaving the compiled loop)

    @property
    def encoder(self) -> NMTEncoder:
        return NMTEncoder(self.src_vocab_size, self.word_vec_size, self.rnn_size,
                          self.layers, self.brnn, self.dropout,
                          self.position_encoding, emb_mlp=self.src_emb_mlp,
                          feature_sizes=tuple(self.src_feature_sizes),
                          feature_vec_size=self.feature_vec_size,
                          predict_fertility=self.predict_fertility)

    @property
    def decoder(self) -> NMTDecoder:
        return NMTDecoder(self.tgt_vocab_size, self.word_vec_size, self.rnn_size,
                          self.layers, self.input_feed, self.dropout,
                          self.attention_type, self.attn_transform, self.c_attn,
                          self.fertility, self.coverage_attn, self.context_gate,
                          self.position_encoding, self.copy_attn,
                          coverage_feed=self.coverage_feed)

    @classmethod
    def from_config(cls, cfg) -> "NMTModel":
        return cls(
            src_vocab_size=cfg.nmt_src_vocab_size,
            tgt_vocab_size=cfg.nmt_tgt_vocab_size,
            word_vec_size=cfg.word_vec_size, rnn_size=cfg.rnn_size,
            layers=cfg.layers, brnn=cfg.brnn, input_feed=cfg.input_feed,
            dropout=cfg.dropout, attention_type=cfg.attention_type,
            attn_transform=cfg.attn_transform, c_attn=cfg.c_attn,
            fertility=cfg.fertility, coverage_attn=cfg.coverage_attn,
            coverage_feed=getattr(cfg, "coverage_feed", False),
            context_gate=cfg.context_gate,
            position_encoding=cfg.position_encoding,
            share_decoder_embeddings=cfg.share_decoder_embeddings,
            copy_attn=cfg.copy_attn,
            src_feature_sizes=tuple(
                getattr(cfg, "nmt_src_feature_sizes", ()) or ()),
            feature_vec_size=getattr(cfg, "feature_vec_size", 100),
            predict_fertility=getattr(cfg, "predict_fertility", False),
            truncated_decoder=getattr(cfg, "truncated_decoder", 0),
        )

    @staticmethod
    def load_pretrained_embeddings(params, *, enc_path=None, dec_path=None):
        """Overwrite the word LUTs with pretrained tables (fork
        train.py:442-443 load_pretrained_vectors; Models.py:136-139 —
        there a torch.load'd tensor, here .npy or .npz with an
        `embedding` array). Shape must match [vocab, word_vec]."""
        import numpy as _np

        def _load(path):
            blob = _np.load(path)
            arr = blob["embedding"] if hasattr(blob, "files") else blob
            return jnp.asarray(_np.asarray(arr, _np.float32))

        for path, side in ((enc_path, "encoder"), (dec_path, "decoder")):
            if not path:
                continue
            table = _load(path)
            cur = params[side]["embeddings"]["word_lut"]
            assert table.shape == cur.shape, (
                f"{side} pretrained embeddings {table.shape} vs {cur.shape}")
            params[side]["embeddings"]["word_lut"] = table.astype(cur.dtype)
        return params

    def init_params(self, rng) -> dict:
        k1, k2, k3 = jax.random.split(rng, 3)
        p = {
            "encoder": self.encoder.init_params(k1),
            "decoder": self.decoder.init_params(k2),
        }
        if not self.share_decoder_embeddings:
            p["generator"] = linear_init(k3, self.rnn_size, self.tgt_vocab_size)
        else:
            p["generator"] = {"b": jnp.zeros((self.tgt_vocab_size,))}
        if self.copy_attn:
            # CopyGenerator's copy gate (onmt/modules/CopyGenerator.py)
            p["copy_gate"] = linear_init(jax.random.fold_in(k3, 1),
                                         self.rnn_size, 1)
        return p

    def copy_generator_logprobs(self, params, outputs, copy_attns, src_ids,
                                src2tgt):
        """NORMALIZED collapsed copy mixing — this framework's own mode
        (same CopyGenerator gate structure, onmt/modules/CopyGenerator.py):

            p(w) = (1 - p_copy) * softmax(Wh)[w]
                 + p_copy * sum_j attn_j * [src2tgt[src_j] == w]

        src2tgt: [src_vocab] int map (Dict.align). Unmapped copy mass
        collapses onto the mapped-to id (UNK if the caller maps unmapped
        words there), keeping p a true distribution. For the reference's
        exact decode-time scoring — UNK/PAD logits masked, unmapped copy
        mass DROPPED, log of the sub-normalized result — use
        `copy_generator_fold_logprobs` (exec-pinned).
        """
        logits = self.generator_logits(params, outputs)
        p_vocab = jax.nn.softmax(logits, axis=-1)
        p_copy = jax.nn.sigmoid(
            linear(params["copy_gate"], outputs).astype(jnp.float32))
        tgt_of_src = jnp.take(src2tgt, src_ids, axis=0)      # [B, S]
        if copy_attns.ndim == 3:                              # [B, T, S]
            one_hot = jax.nn.one_hot(tgt_of_src, self.tgt_vocab_size,
                                     dtype=jnp.float32)       # [B, S, V]
            copy_dist = jnp.einsum("bts,bsv->btv", copy_attns, one_hot)
        else:                                                 # [B, S]
            one_hot = jax.nn.one_hot(tgt_of_src, self.tgt_vocab_size,
                                     dtype=jnp.float32)
            copy_dist = jnp.einsum("bs,bsv->bv", copy_attns, one_hot)
        p = (1.0 - p_copy) * p_vocab + p_copy * copy_dist
        return jnp.log(jnp.maximum(p, 1e-20))

    def copy_generator_fold_logprobs(self, params, outputs, copy_attns,
                                     src_ids, src2tgt):
        """The reference's own DECODE-time CopyGenerator scoring, exec-parity
        form (onmt/modules/CopyGenerator.py:36-48 + the beam fold in
        onmt/Translator.py:207-226 == misc/nmt_translator.py:124-144):

            p_vocab = softmax(logits with UNK and PAD pinned to -inf)
            out     = (1 - p_copy) * p_vocab
            out[align[src_j]] += p_copy * attn_j    for align[src_j] != PAD
            score   = log(out)        # UNNORMALIZED

        Copy mass on UNMAPPED (PAD-aligned) source words is DROPPED, not
        redistributed — the reference beam ranks hypotheses by the log of a
        sub-normalized distribution. (Its fold loop reads `words[0, c]`, so
        it is only correct at batchSize=1, the per-sentence shape its
        translate CLIs always feed; this vectorized form folds each row
        through its own source.) Exec-pinned against the fork's own
        Translator.translateBatch in tests/test_ref_nmt_source_parity.py.

        Contrast `copy_generator_logprobs` (normalized collapse onto the
        align map) and `copy_generator_extended_logprobs` (extended dynamic
        vocab) — those are this framework's own modes.

        outputs [B(,T),rnn]; copy_attns [B(,T),S]; src_ids [B,S];
        src2tgt [src_vocab] (Dict.align map, unmapped -> PAD).
        """
        logits = self.generator_logits(params, outputs)
        neg = jnp.asarray(-jnp.inf, logits.dtype)
        logits = logits.at[..., C.UNK].set(neg).at[..., C.PAD].set(neg)
        p_vocab = jax.nn.softmax(logits, axis=-1)
        p_copy = jax.nn.sigmoid(
            linear(params["copy_gate"], outputs).astype(jnp.float32))
        tgt_of_src = jnp.take(jnp.asarray(src2tgt), src_ids, axis=0)  # [B, S]
        oh = (jax.nn.one_hot(tgt_of_src, self.tgt_vocab_size,
                             dtype=jnp.float32)
              * (tgt_of_src != C.PAD)[..., None])
        attn = copy_attns.astype(jnp.float32)
        if copy_attns.ndim == 3:                               # [B, T, S]
            fold = jnp.einsum("bts,bsv->btv", attn, oh)
        else:                                                  # [B, S]
            fold = jnp.einsum("bs,bsv->bv", attn, oh)
        p = (1.0 - p_copy) * p_vocab + p_copy * fold
        return jnp.log(jnp.maximum(p, 1e-20))

    def copy_train_loss(self, params, outputs, copy_attns, tgt_ids,
                        align_mask, *, eps=1e-12):
        """The reference's EXACT copy training criterion, exec-parity form
        (CopyGenerator.forward :36-48 + CopyCriterion :64-70, driven by
        MemoryEfficientLoss.compute_copy_loss, onmt/Loss.py:143-147):

            out_prob = (1 - g) * softmax(logits with UNK/PAD at -inf)
            copies   = (g * attn * align).sum(-1) + eps
            loss     = -sum_nonpad log(out_prob[targ] + copies + eps)

        n_correct scores argmax over out_prob (the fork's score() reads
        scores_t BEFORE copy folding, Loss.py:129-137). align_mask
        [B, T, S]: 1 where the gold token at step t is a copy of source
        position j (batch.alignment). Returns (summed loss, NMTStats).
        Exec-pinned vs the fork's own MemoryEfficientLoss in
        tests/test_ref_fork_loss_parity.py.

        (This is the reference's collapsed criterion; the framework's own
        training mode is the extended-dynamic-vocab pair
        extended_copy_targets + copy_generator_extended_logprobs.)
        """
        from ..losses.criterion import NMTStats

        logits = self.generator_logits(params, outputs)
        neg = jnp.asarray(-jnp.inf, logits.dtype)
        logits = logits.at[..., C.UNK].set(neg).at[..., C.PAD].set(neg)
        p_vocab = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        g = jax.nn.sigmoid(
            linear(params["copy_gate"], outputs).astype(jnp.float32))
        out_prob = (1.0 - g) * p_vocab
        tg = tgt_ids.astype(jnp.int32)
        p_targ = jnp.take_along_axis(out_prob, tg[..., None], axis=-1)[..., 0]
        copies = jnp.sum(g * copy_attns.astype(jnp.float32)
                         * align_mask.astype(jnp.float32), axis=-1) + eps
        non_pad = (tg != C.PAD).astype(jnp.float32)
        tok = jnp.log(p_targ + copies + eps) * non_pad
        loss = -jnp.sum(tok)
        pred = jnp.argmax(out_prob, axis=-1)
        stats = NMTStats(loss, jnp.sum(non_pad),
                         jnp.sum((pred == tg).astype(jnp.float32) * non_pad))
        return loss, stats

    @staticmethod
    def src_first_occurrence(src_ids):
        """c[b, j] = first position i with src[b, i] == src[b, j].

        OpenNMT builds a per-batch dynamic vocab of source TYPES (src_map,
        onmt/IO.py) so duplicate source tokens share one extended slot; with
        static shapes that becomes position-indexed slots canonicalized to
        the first occurrence."""
        S = src_ids.shape[1]
        eq = src_ids[:, :, None] == src_ids[:, None, :]          # [B, j, i]
        return jnp.min(jnp.where(eq, jnp.arange(S)[None, None, :], S), axis=-1)

    def copy_generator_extended_logprobs(self, params, outputs, copy_attns,
                                         src_ids, src2tgt):
        """Extended-dynamic-vocab CopyGenerator (parity:
        onmt/modules/CopyGenerator.py + the Translator's collapseCopyScores):
        log p over [tgt_vocab + S]. Copy mass for source words INSIDE the
        target vocab folds onto the target word; mass for out-of-vocab
        source words lands on extended slot V + first_occurrence(j), so the
        decoder can emit an exact copy of an unmapped source word instead of
        collapsing it to UNK. Static shapes: the dynamic vocab is
        position-indexed per row, sized by the padded source length.

        outputs [B(,T),rnn]; copy_attns [B(,T),S]; src_ids [B,S];
        src2tgt [src_vocab] (Dict.align map, unmapped -> UNK).
        """
        V = self.tgt_vocab_size
        squeeze = copy_attns.ndim == 2
        if squeeze:
            outputs = outputs[:, None, :]
            copy_attns = copy_attns[:, None, :]
        logits = self.generator_logits(params, outputs)
        p_vocab = jax.nn.softmax(logits, axis=-1)                # [B, T, V]
        p_copy = jax.nn.sigmoid(
            linear(params["copy_gate"], outputs).astype(jnp.float32))
        tgt_of_src = jnp.take(src2tgt, src_ids, axis=0)          # [B, S]
        live = src_ids != C.PAD
        # unmapped markers: UNK (explicit) or PAD (Dict.align default).
        # PAD source positions fold onto tgt PAD (OpenNMT's dynamic vocab
        # maps <blank> to <blank>), conserving probability mass even when
        # the attention leaks onto pads.
        in_vocab = ((tgt_of_src != C.UNK) & (tgt_of_src != C.PAD)) | ~live
        tgt_fold = jnp.where(live, tgt_of_src, C.PAD)
        attn = copy_attns.astype(jnp.float32)
        oh_vocab = (jax.nn.one_hot(tgt_fold, V, dtype=jnp.float32)
                    * in_vocab[..., None])
        copy_to_vocab = jnp.einsum("bts,bsv->btv", attn, oh_vocab)
        first = self.src_first_occurrence(src_ids)               # [B, S]
        S = src_ids.shape[1]
        oh_ext = (jax.nn.one_hot(first, S, dtype=jnp.float32)
                  * (~in_vocab)[..., None])
        copy_to_ext = jnp.einsum("bts,bse->bte", attn, oh_ext)
        p = jnp.concatenate([(1.0 - p_copy) * p_vocab + p_copy * copy_to_vocab,
                             p_copy * copy_to_ext], axis=-1)
        lp = jnp.log(jnp.maximum(p, 1e-20))
        return lp[:, 0] if squeeze else lp

    def extended_copy_targets(self, tgt_ids, alignment, src_ids):
        """Targets in the extended vocab for the forced-copy criterion
        (CopyGeneratorCriterion semantics): where the gold token is UNK and
        `alignment` names a source position, the target becomes
        V + first_occurrence(position). alignment [B, T]: -1 = no copy."""
        V = self.tgt_vocab_size
        first = self.src_first_occurrence(src_ids)
        pos = jnp.clip(alignment, 0, src_ids.shape[1] - 1)
        ext = V + jnp.take_along_axis(first, pos, axis=1)
        use = (tgt_ids == C.UNK) & (alignment >= 0)
        return jnp.where(use, ext, tgt_ids)

    def resolve_extended(self, seq):
        """Split decoded extended-vocab ids: returns (tgt_seq, copy_pos)
        where extended ids become UNK in tgt_seq and copy_pos holds the
        source POSITION to copy the surface form from (-1 = normal token).
        Exact replacement — supersedes the attention-argmax heuristic for
        out-of-vocab copies."""
        V = self.tgt_vocab_size
        is_ext = seq >= V
        return (jnp.where(is_ext, C.UNK, seq),
                jnp.where(is_ext, seq - V, -1))

    def gold_scores(self, params, src_ids, src_lengths, tgt_ids, *,
                    src_feats=None):
        """Per-sentence log-likelihood of gold targets (the fork
        Translator.translateBatch step (2), onmt/Translator.py:152-170:
        per-step gathered log-probs with PAD positions zeroed, summed).

        The reference's own gold scoring cannot execute: the fork's block
        reads `upper_bounds` before any assignment (Translator.py:159 —
        NameError the moment `-tgt` is passed with a live model), and the
        main repo's translateBatch/eval_utils leave goldScores at the
        zeros they initialize (NMT_Models.py:334-335, eval_utils.py:111-113).
        This implements the semantics the fork's `translate.py -tgt`
        advertises (GOLD SCORE / GOLD PPL). Copy-attention gold scoring is
        likewise broken upstream (the one-arg `generator.forward(dec_t)`
        call cannot run a CopyGenerator); here the std generator path is
        always used.

        tgt_ids [B, T]: BOS ... EOS, PAD-padded. Returns [B] f32.
        """
        outs = self.forward(params, src_ids, src_lengths, tgt_ids,
                            src_feats=src_feats)[0]
        lp = jax.nn.log_softmax(
            self.generator_logits(params, outs), axis=-1)   # [B, T-1, V]
        gold = tgt_ids[:, 1:]
        tok = jnp.take_along_axis(lp, gold[..., None].astype(jnp.int32),
                                  axis=-1)[..., 0]
        return jnp.sum(jnp.where(gold != C.PAD, tok, 0.0), axis=-1)

    def generator_logits(self, params, output):
        if self.share_decoder_embeddings:
            w = params["decoder"]["embeddings"]["word_lut"]
            return (jnp.dot(output, w.T, preferred_element_type=jnp.float32)
                    + params["generator"]["b"])
        return linear(params["generator"], output).astype(jnp.float32)

    @staticmethod
    def src_embedding(params):
        """Source word table (Weight_Trans coupling point)."""
        return params["encoder"]["embeddings"]["word_lut"]

    @staticmethod
    def tgt_embedding(params):
        """Target word table (Weight_Trans_y coupling point)."""
        return params["decoder"]["embeddings"]["word_lut"]

    # ---- training forward --------------------------------------------------
    def forward(self, params, src_ids, src_lengths, tgt_ids, *,
                training=False, rng=None, src_feats=None,
                src_fertilities=None):
        """src_ids [B, S]; tgt_ids [B, T] incl. BOS...EOS. Returns decoder
        outputs [B, T-1, rnn] for targets tgt_ids[:, 1:] (parity:
        NMTModel.forward, :414-420 — tgt fed excluding last).

        src_fertilities [B, S]: guided per-position fertility budgets
        (utils/fertility.py alignment tables, fork Models.py:463-470) —
        overrides the predicted/constant upper-bound init."""
        r = _rngs(rng, 2)
        enc = self.encoder.apply(params["encoder"], src_ids,
                                 src_lengths, training=training,
                                 rng=r[0], src_feats=src_feats,
                                 with_fertility=self.predict_fertility
                                 and src_fertilities is None)
        context, enc_hidden = enc[0], enc[1]
        ub0 = src_fertilities if src_fertilities is not None else (
            enc[2] if len(enc) == 3 else None)
        state0 = self.decoder.init_state(enc_hidden, context,
                                         upper_bounds_init=ub0)
        dec = self.decoder
        n_steps = tgt_ids.shape[1] - 1
        step_rngs = (jax.random.split(r[1], n_steps) if r[1] is not None
                     else jnp.zeros((n_steps, 2), jnp.uint32))

        trunc = self.truncated_decoder

        def body(state, inp):
            tok, srng, idx = inp
            srng = srng if training and rng is not None else None
            if trunc:
                # segment boundary: detach the carry (fork train.py:262-270
                # truncated-BPTT semantics — no gradient across segments)
                cut = jnp.logical_and(idx > 0, idx % trunc == 0)
                state = jax.tree.map(
                    lambda x: jnp.where(cut, jax.lax.stop_gradient(x), x),
                    state)
            out, attn, state = dec.step(params["decoder"], context, state, tok,
                                        training=training, rng=srng)
            extra = state["copy_attn"] if self.copy_attn else attn
            return state, (out, attn, extra)

        if self.remat:
            body = jax.checkpoint(body)
        _, (outs, attns, extras) = jax.lax.scan(
            body, state0,
            (tgt_ids[:, :-1].T, step_rngs, jnp.arange(n_steps)))
        if self.copy_attn:
            return jnp.moveaxis(outs, 0, 1), (jnp.moveaxis(attns, 0, 1),
                                              jnp.moveaxis(extras, 0, 1))
        return jnp.moveaxis(outs, 0, 1), jnp.moveaxis(attns, 0, 1)

    # ---- batched beam translate ---------------------------------------------
    def translate_batch(self, params, src_ids, src_lengths, *,
                        beam_size: Optional[int] = None,
                        n_best: int = 1, max_len: Optional[int] = None,
                        src2tgt=None, src_feats=None, src_fertilities=None,
                        copy_mode: str = "extended"):
        """Beam-translate a batch (parity: translateBatch :322-395).

        Returns BeamResult with seq [B, beam, T] (BOS excluded, EOS included,
        PAD after) and aux = per-step source-attention argmax for
        UNK replacement (buildTargetTokens parity, :312-320).

        With copy_attn and a `src2tgt` align map, `copy_mode` selects the
        scoring: "extended" (default) runs the beam over the EXTENDED
        dynamic vocab (copy_generator_extended_logprobs) — decoded ids
        >= tgt_vocab_size are exact copies of source positions, split them
        with `resolve_extended`; "fold" reproduces the reference's own
        decode-time scoring (copy_generator_fold_logprobs: copy mass folded
        onto align-mapped vocab ids, exec-pinned vs the fork's
        Translator.translateBatch).
        """
        from ..ops.beam_search import onmt_beam_search

        beam_size = beam_size or self.beam_size
        max_len = max_len or self.max_decode_len
        enc = self.encoder.apply(params["encoder"], src_ids, src_lengths,
                                 src_feats=src_feats,
                                 with_fertility=self.predict_fertility
                                 and src_fertilities is None)
        context, enc_hidden = enc[0], enc[1]
        ub0 = src_fertilities if src_fertilities is not None else (
            enc[2] if len(enc) == 3 else None)
        state0 = self.decoder.init_state(enc_hidden, context,
                                         upper_bounds_init=ub0)
        s = src_ids.shape[1]
        src_mask = (jnp.arange(s)[None, :] < src_lengths[:, None]).astype(jnp.float32)
        ctx = {"context": context, "src_mask": src_mask}
        dec = self.decoder
        assert copy_mode in ("extended", "fold"), copy_mode
        with_copy = self.copy_attn and src2tgt is not None
        extended = with_copy and copy_mode == "extended"
        if with_copy:
            ctx["src_ids"] = src_ids  # expanded with beams (cheap ints)
        src2tgt_c = None if src2tgt is None else jnp.asarray(src2tgt)

        def step_fn(p, c, state, it):
            out, attn, state = dec.step(p["decoder"], c["context"], state, it,
                                        src_mask=c["src_mask"])
            if extended:
                return self.copy_generator_extended_logprobs(
                    p, out, state["copy_attn"], c["src_ids"], src2tgt_c), state
            if with_copy:  # copy_mode == "fold": reference decode scoring
                return self.copy_generator_fold_logprobs(
                    p, out, state["copy_attn"], c["src_ids"], src2tgt_c), state
            logits = self.generator_logits(p, out)
            return jax.nn.log_softmax(logits, axis=-1), state

        # At beam 15 the encoder context can stay unexpanded across beams
        # (read once per sentence; global_attention_apply is K-aware) —
        # kept opt-out after A/B measurements favored expansion at small
        # beams; coverage FEEDBACK requires expansion (per-beam context
        # edits) — plain coverage_attn accumulation does not touch context.
        needs_expand = self.coverage_attn and self.coverage_feed
        no_expand = () if needs_expand else ("context", "src_mask")
        # onmt semantics (NOT the caption dead-slot beam): EOS'd rows keep
        # extending, a sentence stops when EOS tops its beam, hypotheses are
        # truncated at the first EOS at read-out (onmt/Beam.py:50-88;
        # token-identity vs torch: tests/test_beam_convert_parity.py)
        return onmt_beam_search(
            step_fn, params, ctx, state0,
            beam_size=beam_size, seq_length=max_len,
            bos_token=C.BOS, eos_token=C.EOS, ctx_no_expand=no_expand,
            record_aux_from_state=lambda st: jnp.argmax(st["attn"], axis=-1),
        )
