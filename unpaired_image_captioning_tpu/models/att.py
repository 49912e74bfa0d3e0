"""Attention-LSTM caption decoder family.

Behavioral parity with the reference `models/AttModel.py` (file-wide):

- `AttModel` base: word embedding with ReLU+dropout (:74-76), `fc_embed` /
  `att_embed` MLPs with optional BatchNorm (``use_bn``, :79-84), attention
  memory pre-projected once per sequence (`ctx2att`, :115), additive
  attention with softmax -> mask -> renormalize (:529-558);
- cores: `TopDownCore` (:421-446), `Att2in2Core` (:561-601), `Att2inCore`
  (:604-608), `Att2all2Core` (:617-654), `AdaAtt_lstm`+`AdaAtt_attention`
  visual-sentinel (:256-418), `StackAttCore` (:458-486), `DenseAttCore`
  (:489-526), `ShowAttendTellCore` (OldModel.py:182-231);
- model wrappers with their quirks: Att2in2/Att2all2 use raw fc feats
  (fc_embed = identity, :673-686), Att2in uses a bare embedding and attends
  over raw att feats (:703-722), TopDown forces 2 layers, Stack/Dense 3.

TPU-native differences: per-timestep Python loops are `lax.scan`
(base.forward); variable-length att grids use masks instead of
pack_padded_sequence (AttModel.py:30-53); `use_bn` BatchNorm carries FULL
torch semantics — batch statistics in training, momentum-tracked running
stats applied at inference (`_batch_norm` below, `apply_bn_updates`), plus
`calibrate_batch_norm` to (re)estimate running stats for converted
checkpoints that lack them. States are batch-major `(h[B,L,H], c[B,L,H])`
so the vectorized beam search can reorder them along axis 0.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import rnn
from ..ops.masking import masked_softmax
from .base import (CaptionDecoder, Features, dropout, embedding_init, linear,
                   linear_init)


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def attention_init(rng, rnn_size: int, att_hid_size: int) -> dict:
    k1, k2 = jax.random.split(rng)
    return {
        "h2att": linear_init(k1, rnn_size, att_hid_size),
        "alpha_net": linear_init(k2, att_hid_size, 1),
    }


def attention_apply(p, h, att_emb, p_att, att_masks, training: bool = False):
    """Additive attention (parity: AttModel.py:529-558).

    h: [B*K, H] queries; att_emb: [B, N, D]; p_att: [B, N, A]; att_masks:
    [B, N] or None. When K > 1 (beam search with unexpanded memory —
    ops/beam_search ctx_no_expand) the memory is read once per image and
    broadcast over the K beams. Softmax over N, then multiplicative mask +
    renormalize (NOT -inf mask).

    Routing (v5e-measured, see TRAIN_KERNEL/SINGLE_KERNEL): every path
    runs the XLA einsum — forward-only XLA fusion beats the Pallas
    kernels (80 vs 105 us), and the jax.checkpoint wrap below gives the
    differentiated path the same recompute-instead-of-residual structure
    that previously made the kernel's custom VJP the training winner
    (XE step: XLA-no-remat 65k, kernel 92k, XLA+remat 101k tokens/s).
    """
    att_h = linear(p["h2att"], h)                                   # [BK,A]
    bq = h.shape[0]
    bm = p_att.shape[0]
    if bq != bm:
        # K-beam unexpanded path: v5e microbench at B=50/K=3/N=196/A=512
        # (sequential-dependency sweep, per invocation): XLA einsum 80 us,
        # Pallas vpu-reduce K-beam kernel 89 us, Pallas K-unrolled kernel
        # 198 us, expanded production kernel 138-186 us. XLA's own fusion
        # of tanh into the reducing einsum wins — keep the kernel opt-in.
        k = bq // bm
        att_hk = att_h.reshape(bm, k, -1)
        if BEAMS_KERNEL and jax.default_backend() == "tpu":
            from ..ops.attention import fused_additive_attention_beams

            mask = (att_masks if att_masks is not None
                    else jnp.ones(p_att.shape[:2], jnp.float32))
            out = fused_additive_attention_beams(
                p_att, att_hk, p["alpha_net"]["w"], mask, att_emb)
            return out.reshape(bq, -1)
        dot = jnp.tanh(p_att[:, None, :, :].astype(jnp.float32)
                       + att_hk[:, :, None, :].astype(jnp.float32))  # [B,K,N,A]
        scores = linear(p["alpha_net"], dot)[..., 0]                  # [B,K,N]
        mask = att_masks[:, None, :] if att_masks is not None else None
        weight = masked_softmax(scores.astype(jnp.float32), mask)
        out = jnp.einsum("bkn,bnd->bkd", weight.astype(att_emb.dtype), att_emb)
        return out.reshape(bq, -1)
    use_kernel = TRAIN_KERNEL if training else SINGLE_KERNEL
    if use_kernel and jax.default_backend() == "tpu":
        from ..ops.attention import fused_additive_attention

        mask = (att_masks if att_masks is not None
                else jnp.ones(p_att.shape[:2], jnp.float32))
        return fused_additive_attention(p_att, att_h, p["alpha_net"]["w"],
                                        mask, att_emb)

    # jax.checkpoint: free in forward-only decode, and if this path IS
    # differentiated anyway (the SCST logprob recompute runs with
    # training=False so dropout matches the sampled distribution, yet
    # takes gradients) the [B,N,A] f32 tanh intermediate is recomputed in
    # the backward instead of being saved as a residual — the same
    # residual-traffic problem the TRAIN_KERNEL route avoids.
    @jax.checkpoint
    def _attend(alpha_p, p_att_, att_h_, mask_, emb_):
        dot = jnp.tanh(p_att_.astype(jnp.float32)
                       + att_h_.astype(jnp.float32)[:, None, :])    # [B,N,A]
        scores = linear(alpha_p, dot)[..., 0]                       # [B,N]
        weight = masked_softmax(scores.astype(jnp.float32), mask_)  # [B,N]
        return jnp.einsum("bn,bnd->bd", weight.astype(emb_.dtype), emb_)

    return _attend(p["alpha_net"], p_att, att_h, att_masks, att_emb)


def _mlp_embed_init(rng, in_dim, out_dim):
    return linear_init(rng, in_dim, out_dim)


def _mlp_embed(p, x, rate, training, rng):
    return dropout(rng, jax.nn.relu(linear(p, x)), rate, training)


BN_MOMENTUM = 0.1  # torch nn.BatchNorm1d default


def _masked_mean_var(x, mask):
    """Per-feature mean/biased-var over REAL rows only. The reference feeds
    BN through pack_wrapper (AttModel.py:44-53), so padded att slots never
    contribute to batch statistics; with fixed shapes that becomes a
    mask-weighted moment computation."""
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    if mask is None:
        n = jnp.float32(flat.shape[0])
        mean = jnp.mean(flat, axis=0)
        var = jnp.mean(jnp.square(flat - mean), axis=0)
    else:
        m = (mask.reshape(-1, 1) > 0).astype(jnp.float32)
        n = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(flat * m, axis=0) / n
        var = jnp.sum(jnp.square(flat - mean) * m, axis=0) / n
    return mean, var, n


def _batch_norm(p, x, training: bool = True, *, mask=None, aux_out=None,
                key=None):
    """BatchNorm: batch statistics in training; stored running statistics in
    eval (torch semantics). In training, when `aux_out` is provided, the
    detached batch moments are stashed under `key` as (mean, unbiased_var)
    so the trainer can momentum-track the running stats exactly like torch
    (running_var uses the UNBIASED batch variance; normalization uses the
    biased one). Fresh params hold identity stats mean=0/var=1; converted
    checkpoints carry the torch stats; `calibrate_batch_norm` can also fill
    them from data post-hoc."""
    if training:
        mean, var, n = _masked_mean_var(x, mask)
        if aux_out is not None and key is not None:
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
            aux_out[key] = (jax.lax.stop_gradient(mean),
                            jax.lax.stop_gradient(unbiased))
    else:
        mean = p["mean"]
        var = p["var"]
    norm = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
    return (norm * p["scale"] + p["offset"]).astype(x.dtype)


def apply_bn_updates(params, bn_aux, momentum: float = BN_MOMENTUM):
    """Blend batch moments collected by the forward pass into the running
    stats: running = (1-m)*running + m*batch (torch BatchNorm1d update).
    `bn_aux` maps param key ("bn0"/"bn1") -> (mean, unbiased_var)."""
    params = dict(params)
    for k, (mean, var) in bn_aux.items():
        p = params[k]
        params[k] = dict(p,
                         mean=(1.0 - momentum) * p["mean"] + momentum * mean,
                         var=(1.0 - momentum) * p["var"] + momentum * var)
    return params


def calibrate_batch_norm(params, loader, *, split: str = "train",
                         n_batches: int = 16):
    """Fill the use_bn running statistics from data (BN calibration): the
    functional replacement for torch's momentum-tracked running stats.
    Returns params with bn0/bn1 mean+var set from `n_batches` batches."""
    import numpy as np

    if "bn0" not in params:
        return params
    feats0 = []
    for _ in range(n_batches):
        data = loader.get_batch(split)
        att = np.asarray(data["att_feats"], np.float32)
        masks = np.asarray(data["att_masks"]) > 0
        feats0.append(att[masks])
    flat = np.concatenate(feats0, axis=0)
    params = dict(params)
    params["bn0"] = dict(params["bn0"], mean=jnp.asarray(flat.mean(0)),
                         var=jnp.asarray(flat.var(0)))
    if "bn1" in params:
        # project calibration rows through bn0 + att_embed to get bn1 inputs
        x = _batch_norm(params["bn0"], jnp.asarray(flat), training=False)
        h = jax.nn.relu(linear(params["att_embed"], x)).astype(jnp.float32)
        params["bn1"] = dict(params["bn1"], mean=jnp.mean(h, 0),
                             var=jnp.var(h, 0))
    return params


def _rngs(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


# decode-path att1->lstm1->att2 step fusion (Stack/Dense cores). A/B on
# v5e at beam=3: fused [4645, 4299] vs unfused [4771, 4686] caps/s — the
# monolithic kernel's larger VMEM footprint pipelines worse than two lean
# attention kernels, so fusion defaults OFF; kept (tested) for future
# tuning on other shapes. (Only reachable with expanded beam memory; the
# default beam layout is now unexpanded — see beam_ctx_no_expand.)
STEP_FUSION = False

# K-beam attention kernel toggle: OFF — the XLA einsum on the unexpanded
# layout measures faster (see attention_apply); kernel kept for A/B.
BEAMS_KERNEL = False

# Single-query attention kernel at DECODE time: OFF — v5e microbench at
# B=50, N=196, A=D=512 (chained-invocation sweep): XLA 80 us vs Pallas
# 105 us. The Mosaic kernel materializes f32 intermediates between VPU
# passes and MXU calls; XLA fuses convert+add+tanh into the reducing
# matmul.
SINGLE_KERNEL = False

# Training-time kernel routing: OFF since the jax.checkpoint wrap below.
# History (XE step on v5e, denseatt batch 50): plain XLA autodiff saved
# the [B,N,A] f32 tanh intermediate as a residual (65k tokens/s) and the
# kernel's recompute-from-raw-inputs custom VJP won (91-92k); wrapping
# the XLA path in jax.checkpoint gives the same recompute structure AND
# XLA's better fusion — 101k tokens/s, so XLA is the route under
# training too. Kernels stay opt-in + parity-tested for re-A/B.
TRAIN_KERNEL = False


# ---------------------------------------------------------------------------
# base
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AttModel(CaptionDecoder):
    att_feat_size: int = 2048
    att_hid_size: int = 512
    use_bn: int = 0
    logit_layers: int = 1

    # ---- overridable structure knobs ----
    @property
    def eff_num_layers(self) -> int:
        return self.num_layers

    @property
    def fc_identity(self) -> bool:
        return False  # Att2in2/Att2all2 override: fc feats used raw

    @property
    def att_identity(self) -> bool:
        return False  # Att2in overrides: attend over raw att feats

    @property
    def embed_plain(self) -> bool:
        return False  # Att2in overrides: bare embedding (no relu/dropout)

    # ---- params ----
    def init_params(self, rng) -> dict:
        ks = _rngs(rng, 8)
        p = {
            "embed": embedding_init(ks[0], self.vocab_size + 1, self.input_encoding_size),
            "logit": self._logit_init(ks[1]),
            "core": self.core_init(ks[2]),
        }
        if not self.fc_identity:
            p["fc_embed"] = _mlp_embed_init(ks[3], self.fc_feat_size, self.rnn_size)
        if not self.att_identity:
            p["att_embed"] = _mlp_embed_init(ks[4], self.att_feat_size, self.rnn_size)
            if self.use_bn:
                p["bn0"] = {"scale": jnp.ones((self.att_feat_size,)),
                            "offset": jnp.zeros((self.att_feat_size,)),
                            "mean": jnp.zeros((self.att_feat_size,)),
                            "var": jnp.ones((self.att_feat_size,))}
            if self.use_bn == 2:
                p["bn1"] = {"scale": jnp.ones((self.rnn_size,)),
                            "offset": jnp.zeros((self.rnn_size,)),
                            "mean": jnp.zeros((self.rnn_size,)),
                            "var": jnp.ones((self.rnn_size,))}
        ctx_in = self.att_feat_size if self.att_identity else self.rnn_size
        p["ctx2att"] = linear_init(ks[5], ctx_in, self.att_hid_size)
        return p

    def _logit_init(self, rng):
        if self.logit_layers == 1:
            return [linear_init(rng, self.rnn_size, self.vocab_size + 1)]
        ks = _rngs(rng, self.logit_layers)
        layers = [linear_init(ks[i], self.rnn_size, self.rnn_size)
                  for i in range(self.logit_layers - 1)]
        layers.append(linear_init(ks[-1], self.rnn_size, self.vocab_size + 1))
        return layers

    def _logit(self, params, x, training, rng):
        layers = params["logit"]
        for p in layers[:-1]:
            rng, sub = (jax.random.split(rng) if rng is not None else (None, None))
            x = dropout(sub, jax.nn.relu(linear(p, x)), 0.5, training)
        return linear(layers[-1], x)

    def decode_ctx(self, ctx):
        # Decode-loop hoist (sample/sample_beam only): attention_apply
        # computes the additive score in f32, and a bf16 p_att forces a
        # [B, N, A] f32 convert INSIDE the decode while_loop every step
        # (xplane: 5.2 us/step at the bench shapes — the convert feeds both
        # of the family's attention fusions, so XLA materializes it rather
        # than fusing). Casting once here is exact (bf16→f32) and free
        # outside the loop. A per-call optimization_barrier variant to coax
        # two inline converts instead was A/B'd and LOST (beam-3 while 40.6
        # vs 39.0 ms/20, beam-5 75.2 vs 73.5). NOT applied in forward():
        # the teacher-forcing scan (incl. the SCST logprob recompute, which
        # runs training=False yet differentiates) is HBM-streaming-bound
        # and re-reads p_att every timestep, where bf16 halves the traffic
        # and remat'd XLA fuses the convert inline (BASELINE.md train
        # floor; hoisting there measured as an SCST regression).
        if "p_att" in ctx and ctx["p_att"].dtype == jnp.bfloat16:
            return {**ctx, "p_att": ctx["p_att"].astype(jnp.float32)}
        return ctx

    @property
    def beam_ctx_no_expand(self) -> tuple:
        # Beams of one image SHARE the attention memory (read once per
        # image per step instead of once per beam). The round-1 A/B that
        # kept expansion was per-dispatch (tunnel-RTT-dominated, ~23 ms
        # constant swamped the ~0.1 ms/step difference); the round-2
        # single-dispatch sweep + xplane trace shows the expanded kernels
        # were 63% of decode device time, and the unexpanded XLA einsum
        # runs the same attention in 80 us vs 138-186 us (attention_apply).
        return ("att", "p_att", "masks")

    # ---- decode interface ----
    def make_decoder(self, params, feats: Features, *, training: bool = False,
                     rng: Optional[jax.Array] = None,
                     aux_out: Optional[dict] = None) -> Tuple[Any, Any]:
        batch = feats.fc_feats.shape[0]
        r = _rngs(rng, 2)
        if self.fc_identity:
            fc_emb = feats.fc_feats
        else:
            fc_emb = _mlp_embed(params["fc_embed"], feats.fc_feats,
                                self.drop_prob_lm, training, r[0])
        att = feats.att_feats
        if self.att_identity:
            att_emb = att
        else:
            if self.use_bn:
                att = _batch_norm(params["bn0"], att, training,
                                  mask=feats.att_masks, aux_out=aux_out,
                                  key="bn0")
            att_emb = _mlp_embed(params["att_embed"], att,
                                 self.drop_prob_lm, training, r[1])
            if self.use_bn == 2:
                att_emb = _batch_norm(params["bn1"], att_emb, training,
                                      mask=feats.att_masks, aux_out=aux_out,
                                      key="bn1")
        p_att = linear(params["ctx2att"], att_emb)
        ctx = {"fc": fc_emb, "att": att_emb, "p_att": p_att,
               "masks": feats.att_masks}
        L = self.eff_num_layers
        h0 = jnp.zeros((batch, L, self.rnn_size), dtype=feats.fc_feats.dtype)
        return ctx, (h0, h0)

    def step(self, params, ctx, state, it, *, training: bool = False,
             rng: Optional[jax.Array] = None):
        r = _rngs(rng, 3)
        h, state = self._step_core_r(params, ctx, state, it, r, training)
        logits = self._logit(params, h, training, r[2])
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), state

    def _step_core_r(self, params, ctx, state, it, r, training):
        xt = params["embed"][it]
        if not self.embed_plain:
            xt = dropout(r[0], jax.nn.relu(xt), self.drop_prob_lm, training)
        return self.core_step(params["core"], xt, ctx, state,
                              training=training, rng=r[1])

    # split-head interface (base.py): head hoists out of forward's scan
    @property
    def has_split_head(self) -> bool:
        return True

    def step_core(self, params, ctx, state, it, *, training: bool = False,
                  rng: Optional[jax.Array] = None):
        return self._step_core_r(params, ctx, state, it, _rngs(rng, 3),
                                 training)

    def head(self, params, h, *, training: bool = False,
             rng: Optional[jax.Array] = None):
        logits = self._logit(params, h, training, rng)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # ---- to implement per family ----
    def core_init(self, rng):
        raise NotImplementedError

    def core_step(self, p, xt, ctx, state, *, training, rng):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# TopDown (bottom-up/top-down, Anderson et al.)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TopDownModel(AttModel):
    @property
    def eff_num_layers(self):
        return 2

    def core_init(self, rng):
        ks = _rngs(rng, 3)
        h = self.rnn_size
        return {
            "att_lstm": rnn.init_lstm_params(ks[0], self.input_encoding_size + 2 * h, h),
            "lang_lstm": rnn.init_lstm_params(ks[1], 2 * h, h),
            "attention": attention_init(ks[2], h, self.att_hid_size),
        }

    def core_step(self, p, xt, ctx, state, *, training, rng):
        # parity: TopDownCore.forward (AttModel.py:428-446)
        h, c = state
        prev_h_lang = h[:, 1]
        att_in = jnp.concatenate([prev_h_lang, ctx["fc"], xt], axis=-1)
        h_att, c_att = rnn.lstm_step(p["att_lstm"], att_in, h[:, 0], c[:, 0])
        att_res = attention_apply(p["attention"], h_att, ctx["att"],
                                  ctx["p_att"], ctx["masks"],
                                  training=training)
        lang_in = jnp.concatenate([att_res, h_att], axis=-1)
        h_lang, c_lang = rnn.lstm_step(p["lang_lstm"], lang_in, h[:, 1], c[:, 1])
        out = dropout(rng, h_lang, self.drop_prob_lm, training)
        return out, (jnp.stack([h_att, h_lang], axis=1),
                     jnp.stack([c_att, c_lang], axis=1))


# ---------------------------------------------------------------------------
# Att2in family (SCST paper)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Att2in2Model(AttModel):
    """Attention enters the cell gate; raw fc feats (unused by the core)."""

    @property
    def eff_num_layers(self):
        return 1

    @property
    def fc_identity(self):
        return True

    @property
    def _a2c_in(self):
        return self.rnn_size

    def core_init(self, rng):
        ks = _rngs(rng, 3)
        h = self.rnn_size
        return {
            # fused i2h+h2h 5H gates, maxout (parity: Att2in2Core :561-601)
            "cell": rnn.init_lstm_params(ks[0], self.input_encoding_size, h, maxout=True),
            "a2c": linear_init(ks[1], self._a2c_in, 2 * h),
            "attention": attention_init(ks[2], h, self.att_hid_size),
        }

    def core_step(self, p, xt, ctx, state, *, training, rng):
        h, c = state
        prev_h, prev_c = h[:, 0], c[:, 0]
        att_res = attention_apply(p["attention"], prev_h, ctx["att"],
                                  ctx["p_att"], ctx["masks"],
                                  training=training)
        hsz = self.rnn_size
        xh = jnp.concatenate([xt, prev_h], axis=-1)
        gates = jnp.dot(xh, p["cell"]["w"], preferred_element_type=jnp.float32)
        gates = gates + p["cell"]["b"].astype(jnp.float32)
        # attention added to the maxout (in_transform) chunks only
        a2c = linear(p["a2c"], att_res).astype(jnp.float32)
        gates = gates.at[..., 3 * hsz:].add(self._gate_add(a2c, hsz))
        sig = jax.nn.sigmoid(gates[..., : 3 * hsz])
        in_t = jnp.maximum(gates[..., 3 * hsz: 4 * hsz], gates[..., 4 * hsz: 5 * hsz])
        c_new = sig[..., hsz: 2 * hsz] * prev_c.astype(jnp.float32) + sig[..., :hsz] * in_t
        h_new = sig[..., 2 * hsz: 3 * hsz] * jnp.tanh(c_new)
        h_new = h_new.astype(prev_h.dtype)
        c_new = c_new.astype(prev_c.dtype)
        out = dropout(rng, h_new, self.drop_prob_lm, training)
        return out, (h_new[:, None, :], c_new[:, None, :])

    def _gate_add(self, a2c, hsz):
        return a2c  # added to the 2H maxout chunks


@dataclasses.dataclass(frozen=True)
class Att2inModel(Att2in2Model):
    """Original att2in: bare embedding, raw att feats, a2c from att_feat_size
    (parity: models/Att2inModel.py + AttModel.py:604-608, :703-722)."""

    @property
    def att_identity(self):
        return True

    @property
    def embed_plain(self):
        return True

    @property
    def _a2c_in(self):
        return self.att_feat_size


@dataclasses.dataclass(frozen=True)
class Att2all2Model(AttModel):
    """Attention added to ALL gates (parity: Att2all2Core :617-654)."""

    @property
    def eff_num_layers(self):
        return 1

    @property
    def fc_identity(self):
        return True

    def core_init(self, rng):
        ks = _rngs(rng, 3)
        h = self.rnn_size
        return {
            "cell": rnn.init_lstm_params(ks[0], self.input_encoding_size, h, maxout=True),
            "a2h": linear_init(ks[1], h, 5 * h),
            "attention": attention_init(ks[2], h, self.att_hid_size),
        }

    def core_step(self, p, xt, ctx, state, *, training, rng):
        h, c = state
        prev_h, prev_c = h[:, 0], c[:, 0]
        att_res = attention_apply(p["attention"], prev_h, ctx["att"],
                                  ctx["p_att"], ctx["masks"],
                                  training=training)
        hsz = self.rnn_size
        xh = jnp.concatenate([xt, prev_h], axis=-1)
        gates = jnp.dot(xh, p["cell"]["w"], preferred_element_type=jnp.float32)
        gates = gates + p["cell"]["b"].astype(jnp.float32)
        gates = gates + linear(p["a2h"], att_res).astype(jnp.float32)
        sig = jax.nn.sigmoid(gates[..., : 3 * hsz])
        in_t = jnp.maximum(gates[..., 3 * hsz: 4 * hsz], gates[..., 4 * hsz: 5 * hsz])
        c_new = sig[..., hsz: 2 * hsz] * prev_c.astype(jnp.float32) + sig[..., :hsz] * in_t
        h_new = sig[..., 2 * hsz: 3 * hsz] * jnp.tanh(c_new)
        h_new = h_new.astype(prev_h.dtype)
        c_new = c_new.astype(prev_c.dtype)
        out = dropout(rng, h_new, self.drop_prob_lm, training)
        return out, (h_new[:, None, :], c_new[:, None, :])


# ---------------------------------------------------------------------------
# AdaAtt (adaptive attention with visual sentinel)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AdaAttModel(AttModel):
    use_maxout: bool = False

    def __post_init__(self):
        # the sentinel (input_encoding_size-dim) is concatenated with the
        # rnn_size-dim att memory (reference AdaAtt_attention :383-386) —
        # the reference design implicitly requires these to be equal.
        assert self.input_encoding_size == self.rnn_size, (
            "adaatt requires input_encoding_size == rnn_size")

    # (inherits the unexpanded beam_ctx_no_expand: the sentinel attention
    # is k-aware — slot scores read the shared per-image memory, the
    # per-beam sentinel score concatenates in front; see core_step)

    def core_init(self, rng):
        L = self.num_layers
        h = self.rnn_size
        e = self.input_encoding_size
        g = 5 if self.use_maxout else 4
        ks = _rngs(rng, 2 * L + 12)
        p = {
            "w2h": linear_init(ks[0], e, g * h),
            "v2h": linear_init(ks[1], h, g * h),
            "h2h": [linear_init(ks[2 + i], h, g * h) for i in range(L)],
            "i2h": [linear_init(ks[2 + L + i], h, g * h) for i in range(L - 1)],
            "r_h2h": linear_init(ks[2 + 2 * L], h, h),
        }
        if L == 1:
            p["r_w2h"] = linear_init(ks[3 + 2 * L], e, h)
            p["r_v2h"] = linear_init(ks[4 + 2 * L], h, h)
        else:
            p["r_i2h"] = linear_init(ks[3 + 2 * L], h, h)
        # AdaAtt_attention (:344-406)
        p["fr_linear"] = linear_init(ks[5 + 2 * L], h, e)
        p["fr_embed"] = linear_init(ks[6 + 2 * L], e, self.att_hid_size)
        p["ho_linear"] = linear_init(ks[7 + 2 * L], h, e)
        p["ho_embed"] = linear_init(ks[8 + 2 * L], e, self.att_hid_size)
        p["alpha_net"] = linear_init(ks[9 + 2 * L], self.att_hid_size, 1)
        p["att2h"] = linear_init(ks[10 + 2 * L], h, h)
        return p

    def core_step(self, p, xt, ctx, state, *, training, rng):
        # parity: AdaAtt_lstm.forward (:289-341) + AdaAtt_attention (:375-406)
        L = self.num_layers
        hsz = self.rnn_size
        h, c = state
        r = _rngs(rng, L + 4)
        hs, cs = [], []
        fake_region = None
        x = xt
        for layer in range(L):
            prev_h, prev_c = h[:, layer], c[:, layer]
            if layer == 0:
                i2h = linear(p["w2h"], x) + linear(p["v2h"], ctx["fc"])
            else:
                x = dropout(r[layer], hs[-1], self.drop_prob_lm, training)
                i2h = linear(p["i2h"][layer - 1], x)
            gates = (i2h + linear(p["h2h"][layer], prev_h)).astype(jnp.float32)
            sig = jax.nn.sigmoid(gates[..., : 3 * hsz])
            if self.use_maxout:
                in_t = jnp.maximum(gates[..., 3 * hsz: 4 * hsz], gates[..., 4 * hsz: 5 * hsz])
            else:
                in_t = jnp.tanh(gates[..., 3 * hsz: 4 * hsz])
            c_new = sig[..., hsz: 2 * hsz] * prev_c.astype(jnp.float32) + sig[..., :hsz] * in_t
            tanh_c = jnp.tanh(c_new)
            h_new = sig[..., 2 * hsz: 3 * hsz] * tanh_c
            if layer == L - 1:
                if layer == 0:
                    ri = linear(p["r_w2h"], x) + linear(p["r_v2h"], ctx["fc"])
                else:
                    ri = linear(p["r_i2h"], x)
                n5 = (ri + linear(p["r_h2h"], prev_h)).astype(jnp.float32)
                fake_region = jax.nn.sigmoid(n5) * tanh_c
            hs.append(h_new.astype(xt.dtype))
            cs.append(c_new.astype(xt.dtype))
        top_h = dropout(r[L], hs[-1], self.drop_prob_lm, training)
        fake_region = dropout(r[L + 1], fake_region.astype(xt.dtype),
                              self.drop_prob_lm, training)

        # sentinel attention over [fake_region; att slots]
        fr = dropout(r[L + 2], jax.nn.relu(linear(p["fr_linear"], fake_region)),
                     self.drop_prob_lm, training)
        fr_embed = linear(p["fr_embed"], fr)
        ho = dropout(r[L + 3], jnp.tanh(linear(p["ho_linear"], top_h)),
                     self.drop_prob_lm, training)
        ho_embed = linear(p["ho_embed"], ho)
        # k-aware layout: the att memory/p_att/masks stay per-image [B, ...]
        # under beam search (beam_ctx_no_expand) while the sentinel
        # (fake region) and query are per-beam [B*K, ...]; slot scores read
        # the shared memory once per image, the sentinel score is computed
        # separately and concatenated in front (reference slot order,
        # AdaAtt_attention :383-397). k == 1 reproduces the expanded math.
        bm = ctx["att"].shape[0]
        k = ho.shape[0] // bm
        fr_k = fr.reshape(bm, k, -1)
        fr_ek = fr_embed.reshape(bm, k, -1)
        ho_ek = ho_embed.reshape(bm, k, -1)
        hA = jnp.tanh(ctx["p_att"][:, None, :, :] + ho_ek[:, :, None, :])
        slot_scores = linear(p["alpha_net"], hA)[..., 0]          # [B,K,N]
        sent_score = linear(p["alpha_net"],
                            jnp.tanh(fr_ek + ho_ek))[..., 0]      # [B,K]
        scores = jnp.concatenate([sent_score[..., None], slot_scores], -1)
        masks = ctx["masks"]
        if masks is not None:
            masks = jnp.concatenate([jnp.ones_like(masks[:, :1]), masks],
                                    axis=1)[:, None, :]           # [B,1,1+N]
        pi = masked_softmax(scores.astype(jnp.float32), masks)
        pid = pi.astype(ctx["att"].dtype)
        vis = (pid[..., :1] * fr_k
               + jnp.einsum("bkn,bnd->bkd", pid[..., 1:], ctx["att"]))
        atten_out = vis.reshape(ho.shape[0], -1) + ho
        out = jnp.tanh(linear(p["att2h"], atten_out))
        out = dropout(rng, out, self.drop_prob_lm, training)
        return out, (jnp.stack(hs, axis=1), jnp.stack(cs, axis=1))


@dataclasses.dataclass(frozen=True)
class AdaAttMOModel(AdaAttModel):
    use_maxout: bool = True


# ---------------------------------------------------------------------------
# StackAtt / DenseAtt (3-LSTM stacks)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class StackAttModel(AttModel):
    @property
    def eff_num_layers(self):
        return 3

    def core_init(self, rng):
        ks = _rngs(rng, 6)
        h = self.rnn_size
        e = self.input_encoding_size
        return {
            "lstm0": rnn.init_lstm_params(ks[0], e + h, h, maxout=True),
            "lstm1": rnn.init_lstm_params(ks[1], 2 * h, h, maxout=True),
            "lstm2": rnn.init_lstm_params(ks[2], 2 * h, h, maxout=True),
            "att1": attention_init(ks[3], h, self.att_hid_size),
            "att2": attention_init(ks[4], h, self.att_hid_size),
            "emb2": linear_init(ks[5], h, h),
        }

    def _stack(self, p, xt, ctx, state, *, training, rng):
        h, c = state
        r = _rngs(rng, 3)
        h0, c0 = rnn.lstm_step(p["lstm0"], jnp.concatenate([xt, ctx["fc"]], -1),
                               h[:, 0], c[:, 0], maxout=True)
        h0d = dropout(r[0], h0, self.drop_prob_lm, training)
        if self._can_fuse_stack(ctx, h0, training):
            # decode-path step fusion: att1 -> lstm1 -> att2 in ONE kernel,
            # attention memory read once per step (profiling showed the two
            # separate attention passes dominating beam decode)
            from ..ops.attention import fused_att_lstm_att

            q1 = linear(p["att1"]["h2att"], h0d)
            mask = (ctx["masks"] if ctx["masks"] is not None
                    else jnp.ones(ctx["p_att"].shape[:2], jnp.float32))
            h1, c1, att2 = fused_att_lstm_att(
                ctx["p_att"], ctx["att"], mask, q1, h0d, h[:, 1], c[:, 1],
                p["lstm1"]["w"], p["lstm1"]["b"], p["emb2"]["w"],
                p["emb2"]["b"], p["att2"]["h2att"]["w"],
                p["att2"]["h2att"]["b"], p["att1"]["alpha_net"]["w"],
                p["att2"]["alpha_net"]["w"])
            return (h0d, h1, att2, r[2],
                    (jnp.stack([h0, h1], 1), jnp.stack([c0, c1], 1)))
        att1 = attention_apply(p["att1"], h0d, ctx["att"], ctx["p_att"],
                               ctx["masks"], training=training)
        h1, c1 = rnn.lstm_step(p["lstm1"], jnp.concatenate([h0d, att1], -1),
                               h[:, 1], c[:, 1], maxout=True)
        h1d = dropout(r[1], h1, self.drop_prob_lm, training)
        att2 = attention_apply(p["att2"], h1d + linear(p["emb2"], att1),
                               ctx["att"], ctx["p_att"], ctx["masks"],
                               training=training)
        return (h0d, h1d, att2, r[2],
                (jnp.stack([h0, h1], 1), jnp.stack([c0, c1], 1)))

    def _can_fuse_stack(self, ctx, h0, training: bool) -> bool:
        # eval/decode only (dropout-free), expanded memory layout, aligned
        import unpaired_image_captioning_tpu.models.att as _att_mod

        return (_att_mod.STEP_FUSION and not training
                and jax.default_backend() == "tpu"
                and ctx["att"].shape[0] == h0.shape[0]
                and self.rnn_size % 128 == 0 and self.att_hid_size % 128 == 0)

    def core_step(self, p, xt, ctx, state, *, training, rng):
        # parity: StackAttCore.forward (:478-486)
        h0d, h1d, att2, r2, (h01, c01) = self._stack(p, xt, ctx, state,
                                                     training=training, rng=rng)
        h, c = state
        h2, c2 = rnn.lstm_step(p["lstm2"], jnp.concatenate([h1d, att2], -1),
                               h[:, 2], c[:, 2], maxout=True)
        out = dropout(r2, h2, self.drop_prob_lm, training)
        return out, (jnp.concatenate([h01, h2[:, None]], 1),
                     jnp.concatenate([c01, c2[:, None]], 1))


@dataclasses.dataclass(frozen=True)
class DenseAttModel(StackAttModel):
    def core_init(self, rng):
        rng, k1, k2 = jax.random.split(rng, 3)
        p = super().core_init(rng)
        h = self.rnn_size
        p["fusion1"] = linear_init(k1, 2 * h, h)
        p["fusion2"] = linear_init(k2, 3 * h, h)
        return p

    def core_step(self, p, xt, ctx, state, *, training, rng):
        # parity: DenseAttCore.forward (:518-526)
        h0d, h1d, att2, r2, (h01, c01) = self._stack(p, xt, ctx, state,
                                                     training=training, rng=rng)
        r2a, r2b, r2c = _rngs(r2, 3)
        h, c = state
        fused01 = dropout(r2a, jax.nn.relu(
            linear(p["fusion1"], jnp.concatenate([h0d, h1d], -1))),
            self.drop_prob_lm, training)
        h2, c2 = rnn.lstm_step(p["lstm2"], jnp.concatenate([fused01, att2], -1),
                               h[:, 2], c[:, 2], maxout=True)
        h2d = dropout(r2b, h2, self.drop_prob_lm, training)
        out = dropout(r2c, jax.nn.relu(
            linear(p["fusion2"], jnp.concatenate([h0d, h1d, h2d], -1))),
            self.drop_prob_lm, training)
        return out, (jnp.concatenate([h01, h2[:, None]], 1),
                     jnp.concatenate([c01, c2[:, None]], 1))


# ---------------------------------------------------------------------------
# ShowAttendTell (legacy OldModel family)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ShowAttendTellModel(AttModel):
    """Legacy show-attend-tell (parity: OldModel.py:182-231 + OldModel base):
    fc feats map to the initial hidden state; attention over RAW att feats;
    single nn.LSTM over [word; att_res]."""

    @property
    def att_identity(self):
        return True

    @property
    def embed_plain(self):
        return True

    def init_params(self, rng):
        p = super().init_params(rng)
        p["img_linear"] = linear_init(jax.random.fold_in(rng, 101),
                                      self.fc_feat_size,
                                      self.num_layers * self.rnn_size)
        return p

    def make_decoder(self, params, feats: Features, *, training=False, rng=None):
        ctx, _ = super().make_decoder(params, feats, training=training, rng=rng)
        # init_hidden from image (OldModel.py:48-53): h = c = linear(fc)
        img = linear(params["img_linear"], feats.fc_feats)
        img = img.reshape(feats.fc_feats.shape[0], self.num_layers, self.rnn_size)
        return ctx, (img, img)

    def core_init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "lstm": rnn.init_stacked_lstm(
                k1, self.num_layers,
                self.input_encoding_size + self.att_feat_size, self.rnn_size),
            "attention": attention_init(k2, self.rnn_size, self.att_hid_size),
        }

    def core_step(self, p, xt, ctx, state, *, training, rng):
        h, c = state
        att_res = attention_apply(p["attention"], h[:, -1], ctx["att"],
                                  ctx["p_att"], ctx["masks"],
                                  training=training)
        top, hs, cs = rnn.stacked_lstm_step(
            p["lstm"], jnp.concatenate([xt, att_res], -1),
            jnp.moveaxis(h, 1, 0), jnp.moveaxis(c, 1, 0),
            dropout_rng=rng if training else None, dropout=self.drop_prob_lm)
        out = dropout(rng, top, self.drop_prob_lm, training)
        return out, (jnp.moveaxis(hs, 0, 1), jnp.moveaxis(cs, 0, 1))
