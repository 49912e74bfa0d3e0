"""Transformer caption decoder over attention features.

Parity: reference `models/TransformerModel.py` — an "Attention is All You
Need" stack with N=`num_layers` layers, d_model=`input_encoding_size`,
d_ff=`rnn_size`, h=8 heads, dropout 0.1 (:270-291); att features embedded by
the AttModel-style `att_embed` then passed through a transformer encoder;
pre-norm sublayer connections; embedding scaled by sqrt(d_model) + sinusoid
positional encoding; target mask = padding mask & subsequent mask
(:169-173, :366-389).

TPU-native differences:
- teacher forcing runs as ONE parallel pass with a causal mask (the
  reference does too — its per-step loop is only for decoding);
- incremental decode keeps a fixed-size per-layer K/V cache written at
  position t (`lax.scan`-safe static shapes), instead of re-running the
  whole prefix on a grown `ys` buffer (reference :436-446). The reference's
  self-check asserting incremental == parallel decode (:521-523) is
  reproduced in tests/test_transformer.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .base import CaptionDecoder, Features, dropout, linear, linear_init

DROPOUT = 0.1  # reference make_model default


def _rngs(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def positional_encoding(max_len: int, d_model: int) -> jnp.ndarray:
    pos = jnp.arange(max_len)[:, None].astype(jnp.float32)
    div = jnp.exp(jnp.arange(0, d_model, 2).astype(jnp.float32)
                  * -(math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


def layer_norm_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,)), "offset": jnp.zeros((dim,))}


# Fused training LayerNorm (ops/ln_train.py): forward stats + backward
# (which XLA splits into 3-4 full-tensor-re-reading fusions per norm,
# ~7 ms of the 25 ms batch-50 XE step) as ONE Pallas program each way with
# a custom VJP. Training-only: inference LN is already inside the decode
# megakernels or fused by XLA into neighbors.
TRAIN_LN_KERNEL = True


def layer_norm(p, x, eps: float = 1e-6, *, training: bool = False):
    """Reference formula exactly (TransformerModel.py:96-105):
    a_2 * (x - mean) / (std + eps) + b_2 with torch's UNBIASED std (n-1
    divisor, eps OUTSIDE the sqrt) — required for converted-checkpoint
    token identity (tests/test_beam_convert_parity.py)."""
    if (TRAIN_LN_KERNEL and training
            and jax.default_backend() == "tpu"):
        from ..ops.ln_train import fused_layer_norm, ln_kernel_ok

        if ln_kernel_ok(x.shape, x.shape[-1]):
            # native [B, T, d] layout in and out — a flatten-to-rows wrapper
            # was a physical relayout here (196 % 8 != 0), see ln_train.py
            return fused_layer_norm(x, p["scale"], p["offset"], eps)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    n = x32.shape[-1]
    var = jnp.sum(jnp.square(x32 - mean), axis=-1, keepdims=True) / (n - 1)
    out = (x32 - mean) / (jnp.sqrt(var) + eps)
    return (out * p["scale"] + p["offset"]).astype(x.dtype)


def mha_init(rng, d_model: int) -> dict:
    ks = jax.random.split(rng, 4)
    return {k: linear_init(ks[i], d_model, d_model)
            for i, k in enumerate(("q", "k", "v", "o"))}


def _split_heads(x, n_heads):
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


# remat the attention inner under autodiff: recompute the [B,H,T,S] f32
# scores/softmax in the backward instead of saving them as residuals.
# A/B'd OFF: unlike the LSTM family's additive attention (elementwise
# tanh scores, where the same trick bought 65k->101k XE tokens/s,
# models/att.py), the transformer's scores are MXU matmuls — recompute
# costs more than the residual traffic (XE on v5e, 6L-512 batch 50:
# 21.2k remat vs 22.4k saved-residual tokens/s). Kept as a flag: it is
# also a memory knob for long-sequence configs.
REMAT_ATTENTION = False

# Fused training attention (ops/mha_train.py): QK^T/scale/mask/softmax/
# dropout/AV as ONE Pallas program per (batch, head-pair) block with a
# custom VJP that regenerates the dropout mask from its seed instead of
# saving [B, h, T, S] residuals. Motivation + A/B: BASELINE.md transformer
# training floor (the xplane showed ~1/3 of the 36 ms XE step in 5-7x-over-
# floor softmax/mask/dropout chains over [50, 8, 196, 196] f32).
TRAIN_MHA_KERNEL = True


def mha_apply(p, q_in, k, v, mask, n_heads: int, *, training=False, rng=None):
    """k, v: already-projected [B, S, d]. mask: [B, 1|T, S] bool/0-1 or None."""
    d = q_in.shape[-1]
    if (TRAIN_MHA_KERNEL and training and rng is not None
            and not REMAT_ATTENTION and jax.default_backend() == "tpu"):
        from ..ops.mha_train import fused_mha_train, mha_kernel_ok

        if mha_kernel_ok(n_heads, d, q_in.shape[1], k.shape[1]):
            if mask is not None:
                maskadd = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)
            else:
                maskadd = jnp.zeros((q_in.shape[0], 1, k.shape[1]),
                                    jnp.float32)
            seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1,
                                      dtype=jnp.int32)
            out = fused_mha_train(linear(p["q"], q_in), k, v, maskadd,
                                  seed, n_heads, DROPOUT)
            return linear(p["o"], out)

    def core(pq, po, q_in_, k_, v_, mask_, rng_):
        q = _split_heads(linear(pq, q_in_), n_heads)
        kh = _split_heads(k_, n_heads)
        vh = _split_heads(v_, n_heads)
        scores = jnp.einsum("bthd,bshd->bhts", q, kh) / math.sqrt(d // n_heads)
        scores = scores.astype(jnp.float32)
        if mask_ is not None:
            scores = jnp.where(mask_[:, None, :, :], scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = dropout(rng_, attn, DROPOUT, training)
        out = jnp.einsum("bhts,bshd->bthd", attn.astype(q_in_.dtype), vh)
        return linear(po, out.reshape(q_in_.shape[0], q_in_.shape[1], d))

    if REMAT_ATTENTION:
        core = jax.checkpoint(core)
    return core(p["q"], p["o"], q_in, k, v, mask, rng)


# Fused whole-layer training kernel (ops/layer_train.py): each ENCODER
# layer's LN1/packed-QKV/attention/O/residual/LN2/FFN/residual — forward and
# backward — runs as one Pallas program per batch element instead of ~20 XLA
# ops (fwd) + ~25 (bwd). Subsumes TRAIN_MHA_KERNEL and TRAIN_LN_KERNEL for
# the layers it covers. A/B + motivation: BASELINE.md round-4 transformer
# training section (encoder) + round-5 decoder A/B.
TRAIN_LAYER_KERNEL = True
# The DECODER fused layer was A/B'd on v5e (tools/perf/ab_dec_layer.py,
# round 5) and REJECTED: protocol XE batch 50 41,159 tokens/s with it off
# vs 39,756 on; batch 400 51,849 vs 49,944. Unlike the encoder (T=196
# rows), the caption decoder's 17-token rows leave the MXU starved inside
# the one-element-per-program kernel while XLA batches the same matmuls
# across B — the per-op overheads the kernel removes are smaller than the
# batching it gives up. Kept OFF by default, parity+grad-tested
# (tests/test_layer_train.py) for re-A/B on other shapes/compilers.
TRAIN_DEC_LAYER_KERNEL = False


def enc_layer_apply(lp, x, src_mask, n_heads: int, *, training=False,
                    rngs=None):
    """One pre-norm encoder layer (self-attn + FFN sublayers, each with
    residual dropout). Routes to the fused whole-layer kernel under
    training on TPU; falls back to the per-sublayer path. rngs is the
    caller's presplit 4-key slice, consumed directly by the fallback —
    the same stream as the round-3 per-sublayer loop (ADVICE r4) — with
    rngs[0] seeding the fused kernel's hash stream (unchanged from the
    round-4 routing, which derived the seed from the first key)."""
    rng = rngs[0] if rngs is not None else None
    if (TRAIN_LAYER_KERNEL and training and rng is not None
            and jax.default_backend() == "tpu"):
        from ..ops.layer_train import enc_layer_kernel_ok, fused_enc_layer

        d = x.shape[-1]
        f = lp["ffn"]["w1"]["w"].shape[1]
        if enc_layer_kernel_ok(n_heads, d, f, x.shape[1]):
            sp = lp["self"]
            wqkv = jnp.concatenate([sp["q"]["w"], sp["k"]["w"],
                                    sp["v"]["w"]], axis=1)
            bqkv = jnp.concatenate([sp["q"]["b"], sp["k"]["b"],
                                    sp["v"]["b"]])
            if src_mask is not None:
                maskadd = jnp.where(src_mask, 0.0, -1e9).astype(jnp.float32)
            else:
                maskadd = jnp.zeros((x.shape[0], 1, x.shape[1]), jnp.float32)
            seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1,
                                      dtype=jnp.int32)
            return fused_enc_layer(
                x, maskadd, seed, wqkv, bqkv, sp["o"]["w"], sp["o"]["b"],
                lp["ffn"]["w1"]["w"], lp["ffn"]["w1"]["b"],
                lp["ffn"]["w2"]["w"], lp["ffn"]["w2"]["b"],
                lp["n1"]["scale"], lp["n1"]["offset"],
                lp["n2"]["scale"], lp["n2"]["offset"],
                n_heads, DROPOUT)
    r = rngs if rngs is not None else [None] * 4
    y = layer_norm(lp["n1"], x, training=training)
    k = linear(lp["self"]["k"], y)
    v = linear(lp["self"]["v"], y)
    x = x + dropout(r[0], mha_apply(lp["self"], y, k, v, src_mask,
                                    n_heads, training=training,
                                    rng=r[1]),
                    DROPOUT, training)
    y = layer_norm(lp["n2"], x, training=training)
    x = x + dropout(r[2], ffn_apply(lp["ffn"], y, training=training,
                                    rng=r[3]),
                    DROPOUT, training)
    return x


def dec_layer_apply(lp, x, mk, mv, tgt_mask, src_mask, n_heads: int, *,
                    training=False, rngs=None):
    """One pre-norm decoder layer (self-attn + cross-attn + FFN sublayers,
    each with residual dropout). mk/mv are the memory K/V projections,
    computed OUTSIDE (their batched matmuls already run at floor in XLA and
    d(memory)/dW_src flow through ordinary autodiff). Routes to the fused
    whole-layer kernel under training on TPU; falls back to the
    per-sublayer path (identical rng consumption to the round-3 loop)."""
    if (TRAIN_LAYER_KERNEL and TRAIN_DEC_LAYER_KERNEL and training
            and rngs is not None
            and rngs[0] is not None and jax.default_backend() == "tpu"):
        from ..ops.layer_train import dec_layer_kernel_ok, fused_dec_layer

        d = x.shape[-1]
        f = lp["ffn"]["w1"]["w"].shape[1]
        if dec_layer_kernel_ok(n_heads, d, f, x.shape[1], mk.shape[1]):
            sp = lp["self"]
            wqkv = jnp.concatenate([sp["q"]["w"], sp["k"]["w"],
                                    sp["v"]["w"]], axis=1)
            bqkv = jnp.concatenate([sp["q"]["b"], sp["k"]["b"],
                                    sp["v"]["b"]])
            tm = jnp.where(tgt_mask, 0.0, -1e9).astype(jnp.float32)
            if src_mask is not None:
                sm = jnp.where(src_mask, 0.0, -1e9).astype(jnp.float32)
            else:
                sm = jnp.zeros((x.shape[0], 1, mk.shape[1]), jnp.float32)
            seed = jax.random.randint(rngs[0], (1,), 0, 2 ** 31 - 1,
                                      dtype=jnp.int32)
            seeds = jnp.concatenate([seed, seed ^ 0x55555555])
            return fused_dec_layer(
                x, mk, mv, tm, sm, seeds, wqkv, bqkv,
                sp["o"]["w"], sp["o"]["b"],
                lp["src"]["q"]["w"], lp["src"]["q"]["b"],
                lp["src"]["o"]["w"], lp["src"]["o"]["b"],
                lp["ffn"]["w1"]["w"], lp["ffn"]["w1"]["b"],
                lp["ffn"]["w2"]["w"], lp["ffn"]["w2"]["b"],
                lp["n1"]["scale"], lp["n1"]["offset"],
                lp["n2"]["scale"], lp["n2"]["offset"],
                lp["n3"]["scale"], lp["n3"]["offset"],
                n_heads, DROPOUT)
    r = rngs if rngs is not None else [None] * 6
    y = layer_norm(lp["n1"], x, training=training)
    k = linear(lp["self"]["k"], y)
    v = linear(lp["self"]["v"], y)
    x = x + dropout(r[0], mha_apply(lp["self"], y, k, v, tgt_mask,
                                    n_heads, training=training,
                                    rng=r[1]), DROPOUT, training)
    y = layer_norm(lp["n2"], x, training=training)
    x = x + dropout(r[2], mha_apply(lp["src"], y, mk, mv, src_mask,
                                    n_heads, training=training,
                                    rng=r[3]), DROPOUT, training)
    y = layer_norm(lp["n3"], x, training=training)
    x = x + dropout(r[4],
                    ffn_apply(lp["ffn"], y, training=training, rng=r[5]),
                    DROPOUT, training)
    return x


def ffn_init(rng, d_model: int, d_ff: int) -> dict:
    k1, k2 = jax.random.split(rng)
    return {"w1": linear_init(k1, d_model, d_ff), "w2": linear_init(k2, d_ff, d_model)}


def ffn_apply(p, x, *, training=False, rng=None):
    h = jax.nn.relu(linear(p["w1"], x))
    h = dropout(rng, h, DROPOUT, training)
    return linear(p["w2"], h)


def cross_attend_shared(p, y, ck, cv, src_mask, n_heads: int):
    """Cross-attention where the [B*K, 1, d] beam queries read UNEXPANDED
    [B, S, d] encoder K/V: beams of one image share the memory so each
    decode step streams it from HBM once per image instead of once per beam
    (same trick as the NMT transformer beam, nmt_transformer.py step_fn)."""
    bsz, _, d = y.shape
    bm, S = ck.shape[0], ck.shape[1]
    kb = bsz // bm
    dh = d // n_heads
    q = linear(p["q"], y)                                 # [B*K, 1, d]
    qh = q.reshape(bm, kb, n_heads, dh)
    kh = ck.reshape(bm, S, n_heads, dh)
    scores = jnp.einsum("bkhd,bshd->bhks", qh, kh) / math.sqrt(dh)
    scores = scores.astype(jnp.float32)
    if src_mask is not None:
        scores = jnp.where(src_mask[:, None, :, :], scores, -1e9)
    w = jax.nn.softmax(scores, axis=-1).astype(y.dtype)
    vh = cv.reshape(bm, S, n_heads, dh)
    out = jnp.einsum("bhks,bshd->bkhd", w, vh).reshape(bsz, 1, d)
    return linear(p["o"], out)


# Beam decode keeps cross-attention K/V and src_mask at [B, ...] (shared by
# the K beams of each image) instead of expanding to [B*K, ...]. A/B on v5e
# (6-layer d512 bf16, batch 50, 196 att slots, beam 5): shared 51.9 ms vs
# expanded 61.1 ms median — 1.18x, so sharing is the default. CPU f32 beam
# outputs are token- and score-identical either way (test_transformer.py).
CROSS_KV_SHARE = True

# Fused whole-layer decode kernel (ops/transformer_decode.py): each decoder
# layer's step — LN/packed-QKV/cache-write/self-attn/cross-attn/FFN — runs
# as ONE Pallas program instead of ~16 XLA ops, collapsing the ~100-small-op
# per-step spread that made transformer decode the per-family outlier
# (round-2 STATUS: ~4x above its HBM floor). Requires CROSS_KV_SHARE
# layouts; numerics parity-tested in interpret mode
# (test_transformer.py::test_layer_kernel_matches_xla_step). v5e A/B
# (tools/perf/prof_decode_configs.py transformer5): see BASELINE.md.
LAYER_KERNEL = True

# Whole-stack decode kernel: ONE Pallas program runs all L fused layers per
# step (grid (L, B/bi), weights DMA-streamed HBM->VMEM once per layer, the
# residual stream carried in the VMEM output buffer across grid steps) —
# collapsing L kernel launches + their inter-op scheduling gaps (~50 µs per
# layer per step measured on v5e, tools/perf/ab_tfd_kernel.py) into one.
# Falls back to the per-layer kernel when False.
STACK_KERNEL = True


def _use_layer_kernel(training: bool, seq_length: int = 16) -> bool:
    # seq_length % 16: the kernels' [rows, T, d] -> [bi, kb*T, d] cache
    # reshape (MXU self-attention) is layout-preserving only when T is a
    # multiple of the bf16 sublane tile (16; covers f32's 8 too) — other
    # lengths fall back to the XLA step path
    return (LAYER_KERNEL and CROSS_KV_SHARE and not training
            and seq_length % 16 == 0
            and jax.default_backend() == "tpu")


@dataclasses.dataclass(frozen=True)
class TransformerModel(CaptionDecoder):
    att_feat_size: int = 2048
    att_hid_size: int = 512
    use_bn: int = 0
    logit_layers: int = 1
    num_heads: int = 8

    @property
    def beam_ctx_no_expand(self) -> tuple:
        # Unlike the LSTM-attention family (whose K-unrolled fused kernel
        # lost the A/B, att.py beam_ctx_no_expand), the transformer's cross
        # K/V is num_layers× larger and read by a plain MXU einsum, so
        # sharing it across beams wins; gated by CROSS_KV_SHARE. "wpack"
        # (fused-layer kernel weights) is beam-invariant by definition.
        return (("cross", "src_mask", "wpack", "wstack", "cross_k",
                 "cross_v") if CROSS_KV_SHARE else ())

    @property
    def d_model(self) -> int:
        return self.input_encoding_size

    @property
    def d_ff(self) -> int:
        return self.rnn_size

    def init_params(self, rng) -> dict:
        N = self.num_layers
        d = self.d_model
        ks = _rngs(rng, 4 + 4 * N + 6 * N)
        i = iter(range(len(ks)))
        p = {
            "att_embed": linear_init(ks[next(i)], self.att_feat_size, d),
        }
        # use_bn: BatchNorm around att_embed exactly like the LSTM family
        # (reference TransformerModel.py:321-326 shares AttModel's
        # Sequential(BN?, Linear, ReLU, Dropout, BN?) construction)
        if self.use_bn:
            p["bn0"] = {"scale": jnp.ones((self.att_feat_size,)),
                        "offset": jnp.zeros((self.att_feat_size,)),
                        "mean": jnp.zeros((self.att_feat_size,)),
                        "var": jnp.ones((self.att_feat_size,))}
        if self.use_bn == 2:
            p["bn1"] = {"scale": jnp.ones((d,)), "offset": jnp.zeros((d,)),
                        "mean": jnp.zeros((d,)), "var": jnp.ones((d,))}
        p.update({
            "tgt_embed": jax.random.normal(ks[next(i)], (self.vocab_size + 1, d)) * (d ** -0.5),
            "generator": linear_init(ks[next(i)], d, self.vocab_size + 1),
            "enc_norm": layer_norm_init(d),
            "dec_norm": layer_norm_init(d),
            "enc": [],
            "dec": [],
        })
        for _ in range(N):
            p["enc"].append({
                "self": mha_init(ks[next(i)], d),
                "ffn": ffn_init(ks[next(i)], d, self.d_ff),
                "n1": layer_norm_init(d), "n2": layer_norm_init(d),
            })
        for _ in range(N):
            p["dec"].append({
                "self": mha_init(ks[next(i)], d),
                "src": mha_init(ks[next(i)], d),
                "ffn": ffn_init(ks[next(i)], d, self.d_ff),
                "n1": layer_norm_init(d), "n2": layer_norm_init(d),
                "n3": layer_norm_init(d),
            })
        return p

    # ---- encoder ----
    def encode(self, params, feats: Features, *, training=False, rng=None,
               aux_out=None):
        from .att import _batch_norm

        r = _rngs(rng, 1 + 4 * self.num_layers)
        att = feats.att_feats
        if self.use_bn:
            att = _batch_norm(params["bn0"], att, training,
                              mask=feats.att_masks, aux_out=aux_out,
                              key="bn0")
        x = dropout(r[0], jax.nn.relu(linear(params["att_embed"], att)),
                    self.drop_prob_lm, training)
        if self.use_bn == 2:
            x = _batch_norm(params["bn1"], x, training,
                            mask=feats.att_masks, aux_out=aux_out, key="bn1")
        src_mask = None
        if feats.att_masks is not None:
            src_mask = feats.att_masks[:, None, :] > 0  # [B, 1, N]
        ri = 1
        for lp in params["enc"]:
            # whole layer (self-attn + FFN sublayers, each with its residual
            # dropout, plus the FFN-internal dropout — reference
            # PositionwiseFeedForward w1->relu->dropout->w2); routed to the
            # fused whole-layer kernel under training on TPU
            x = enc_layer_apply(lp, x, src_mask, self.num_heads,
                                training=training,
                                rngs=r[ri:ri + 4] if rng is not None
                                else None)
            ri += 4
        return layer_norm(params["enc_norm"], x,
                          training=training), src_mask

    # ---- parallel teacher forcing ----
    def forward(self, params, feats: Features, seq, *, training: bool = False,
                rng: Optional[jax.Array] = None, ss_prob: float = 0.0,
                ss_enabled: bool = True, aux_out=None):
        """Full parallel decode with causal+pad mask. ss_prob is accepted for
        interface parity but ignored (the reference transformer path never
        uses scheduled sampling either)."""
        del ss_prob
        r = _rngs(rng, 2 + 6 * self.num_layers)
        memory, src_mask = self.encode(params, feats, training=training,
                                       rng=r[0], aux_out=aux_out)
        seq_in = seq[:, :-1]
        b, t = seq_in.shape
        d = self.d_model
        x = params["tgt_embed"][seq_in] * math.sqrt(d)
        x = x + positional_encoding(t, d)[None].astype(x.dtype)
        x = dropout(r[1], x, DROPOUT, training)
        # pad mask: position 0 (BOS slot, id 0) always allowed (ref :169-173)
        pad_ok = jnp.logical_or(seq_in > 0,
                                jnp.arange(t)[None, :] == 0)       # [B, T]
        causal = jnp.tril(jnp.ones((t, t), bool))
        tgt_mask = jnp.logical_and(pad_ok[:, None, :], causal[None])  # [B, T, T]
        ri = 2
        for lp in params["dec"]:
            mk = linear(lp["src"]["k"], memory)
            mv = linear(lp["src"]["v"], memory)
            x = dec_layer_apply(lp, x, mk, mv, tgt_mask, src_mask,
                                self.num_heads, training=training,
                                rngs=r[ri:ri + 6] if rng is not None
                                else None)
            ri += 6
        x = layer_norm(params["dec_norm"], x, training=training)
        logits = linear(params["generator"], x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # ---- incremental decode with fixed K/V cache ----
    def make_decoder(self, params, feats: Features, *, training: bool = False,
                     rng: Optional[jax.Array] = None) -> Tuple[Any, Any]:
        memory, src_mask = self.encode(params, feats, training=training, rng=rng)
        # precompute cross-attention K/V once per sequence
        cross = [{"k": linear(lp["src"]["k"], memory),
                  "v": linear(lp["src"]["v"], memory)} for lp in params["dec"]]
        ctx = {"cross": cross,
               "src_mask": (src_mask if src_mask is not None else None)}
        b = feats.att_feats.shape[0]
        T = self.seq_length
        if _use_layer_kernel(training, self.seq_length):
            if STACK_KERNEL:
                # whole-stack path: ONE Pallas program per decode step for
                # all L layers. Caches are one [b, L, T, d] state leaf — row
                # axis leading keeps beam search's axis-0 reorder and the
                # kernel's in-place aliasing working (the kernel blocks the
                # middle layer axis, so no per-layer slice copies occur).
                from ..ops.transformer_decode import pack_stack_weights

                ctx["wstack"] = pack_stack_weights(params["dec"])
                ctx["cross_k"] = jnp.stack([c["k"] for c in cross])
                ctx["cross_v"] = jnp.stack([c["v"] for c in cross])
                del ctx["cross"]
                L = self.num_layers
                cache = {
                    "t": jnp.zeros((b,), jnp.int32),
                    "k_all": jnp.zeros((b, L, T, self.d_model), memory.dtype),
                    "v_all": jnp.zeros((b, L, T, self.d_model), memory.dtype),
                }
                return ctx, cache
            # fused-layer path: per-layer cache entries (aliased in place by
            # the kernel — a packed [b, L, T, d] layout would force 4 MB
            # slice/update copies per layer per step) + packed weights in
            # ctx (beam-invariant, listed in beam_ctx_no_expand)
            from ..ops.transformer_decode import pack_layer_weights

            ctx["wpack"] = [pack_layer_weights(lp) for lp in params["dec"]]
            cache = {"t": jnp.zeros((b,), jnp.int32)}
            for li in range(self.num_layers):
                cache[f"k{li}"] = jnp.zeros((b, T, self.d_model), memory.dtype)
                cache[f"v{li}"] = jnp.zeros((b, T, self.d_model), memory.dtype)
            return ctx, cache
        cache = {
            "k": jnp.zeros((b, self.num_layers, T, self.d_model), memory.dtype),
            "v": jnp.zeros((b, self.num_layers, T, self.d_model), memory.dtype),
            "t": jnp.zeros((b,), jnp.int32),
        }
        return ctx, cache

    def step(self, params, ctx, state, it, *, training: bool = False,
             rng: Optional[jax.Array] = None):
        d = self.d_model
        T = self.seq_length
        b = it.shape[0]
        if "wstack" in ctx and "k" not in state:
            # fused whole-stack kernel path (ops/transformer_decode.py):
            # all L layers in one Pallas program per step
            from ..ops.transformer_decode import decoder_stack_step

            t = state["t"]
            x = params["tgt_embed"][it] * math.sqrt(d)
            x = x + positional_encoding(T, d)[t].astype(x.dtype)
            x, k_all, v_all = decoder_stack_step(
                x, t, ctx["cross_k"], ctx["cross_v"], ctx["src_mask"],
                state["k_all"], state["v_all"], ctx["wstack"],
                n_heads=self.num_heads)
            new_state = {"t": t + 1, "k_all": k_all, "v_all": v_all}
            x = layer_norm(params["dec_norm"], x[:, None, :])[:, 0]
            logits = linear(params["generator"], x)
            return (jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
                    new_state)
        if "wpack" in ctx and "k" not in state:
            # fused whole-layer kernel path (ops/transformer_decode.py)
            from ..ops.transformer_decode import decoder_layer_step

            t = state["t"]
            x = params["tgt_embed"][it] * math.sqrt(d)
            x = x + positional_encoding(T, d)[t].astype(x.dtype)
            new_state = {"t": t + 1}
            for li in range(self.num_layers):
                x, k_li, v_li = decoder_layer_step(
                    x, t, ctx["cross"][li]["k"], ctx["cross"][li]["v"],
                    ctx["src_mask"], state[f"k{li}"], state[f"v{li}"],
                    ctx["wpack"][li], n_heads=self.num_heads)
                new_state[f"k{li}"] = k_li
                new_state[f"v{li}"] = v_li
            x = layer_norm(params["dec_norm"], x[:, None, :])[:, 0]
            logits = linear(params["generator"], x)
            return (jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
                    new_state)
        # per-row position: under diverse beam search (group_size > 1) groups
        # are time-staggered, so each row carries its own t (ADVICE r1 —
        # row 0's t would give groups g > 0 the wrong positional encoding
        # and K/V write slot)
        t = state["t"]  # [B]
        x = params["tgt_embed"][it] * math.sqrt(d)
        x = x + positional_encoding(T, d)[t].astype(x.dtype)
        x = x[:, None, :]  # [B, 1, d]
        new_k, new_v = state["k"], state["v"]
        pos_ok = (jnp.arange(T)[None, :] <= t[:, None])[:, None, :]  # [B,1,T]
        for li, lp in enumerate(params["dec"]):
            y = layer_norm(lp["n1"], x)
            k_t = linear(lp["self"]["k"], y)[:, 0]
            v_t = linear(lp["self"]["v"], y)[:, 0]
            write = (jnp.arange(T)[None, :] == t[:, None])[:, :, None]
            new_k = new_k.at[:, li].set(jnp.where(write, k_t[:, None, :], new_k[:, li]))
            new_v = new_v.at[:, li].set(jnp.where(write, v_t[:, None, :], new_v[:, li]))
            x = x + mha_apply(lp["self"], y, new_k[:, li], new_v[:, li],
                              jnp.broadcast_to(pos_ok, (b, 1, T)), self.num_heads)
            y = layer_norm(lp["n2"], x)
            ck, cv = ctx["cross"][li]["k"], ctx["cross"][li]["v"]
            if b != ck.shape[0]:
                # unexpanded beam memory: [B*K] queries vs [B] cross K/V
                x = x + cross_attend_shared(lp["src"], y, ck, cv,
                                            ctx["src_mask"], self.num_heads)
            else:
                x = x + mha_apply(lp["src"], y, ck, cv, ctx["src_mask"],
                                  self.num_heads)
            y = layer_norm(lp["n3"], x)
            x = x + ffn_apply(lp["ffn"], y)
        x = layer_norm(params["dec_norm"], x)
        logits = linear(params["generator"], x[:, 0])
        state = {"k": new_k, "v": new_v, "t": state["t"] + 1}
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), state
