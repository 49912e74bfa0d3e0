"""Caption decoder base: functional interface shared by every model family.

The reference's `CaptionModel` (models/CaptionModel.py:27-31) dispatches
`forward(..., mode='forward'|'sample'|'sample_beam')` on one nn.Module. Here
each model is a stateless description object exposing pure functions over a
parameter pytree:

    init_params(rng)                        -> params
    make_decoder(params, feats, ...)        -> (ctx, state0)
    step(params, ctx, state, it)            -> (logprobs [B, V+1], state)
    forward(params, feats, seq, ...)        -> logprobs [B, T-1, V+1]

`ctx` holds per-sequence precomputed tensors (projected attention memory,
masks) that are *constant across decode steps and identical across beams*;
`state` is the per-step recurrent carry that beam search reorders. This split
is what makes one vectorized beam-search program (ops/beam_search.py) serve
every model family — replacing the reference's per-image Python beam loop
(AttModel.py:167-196).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class Features(NamedTuple):
    """One batch of precomputed image features (reference get_batch dict).

    fc_feats:    [B, fc_feat_size]
    att_feats:   [B, N, att_feat_size(+5 if use_box)] or None
    attri_feats: [B, attri_feat_size] or None (stackcap attributes)
    att_masks:   [B, N] 0/1 or None
    """

    fc_feats: jax.Array
    att_feats: Optional[jax.Array] = None
    attri_feats: Optional[jax.Array] = None
    att_masks: Optional[jax.Array] = None


def linear_init(rng, in_dim: int, out_dim: int, *, scale: Optional[float] = None,
                dtype=jnp.float32) -> dict:
    k1, _ = jax.random.split(rng)
    if scale is None:
        scale = 1.0 / jnp.sqrt(in_dim)
        w = jax.random.uniform(k1, (in_dim, out_dim), dtype=dtype,
                               minval=-scale, maxval=scale)
    else:
        w = jax.random.uniform(k1, (in_dim, out_dim), dtype=dtype,
                               minval=-scale, maxval=scale)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype=dtype)}


def linear(p: dict, x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype) + p["b"].astype(x.dtype)


def embedding_init(rng, vocab: int, dim: int, *, scale: float = 0.1,
                   dtype=jnp.float32) -> jax.Array:
    # reference init_weights: uniform(-0.1, 0.1) (FCModel_NMT.py:75-79)
    return jax.random.uniform(rng, (vocab, dim), dtype=dtype, minval=-scale, maxval=scale)


def dropout(rng: Optional[jax.Array], x: jax.Array, rate: float,
            training: bool) -> jax.Array:
    if not training or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class CaptionDecoder:
    """Base class; subclasses are frozen dataclasses of static hyperparams."""

    vocab_size: int
    input_encoding_size: int
    rnn_size: int
    num_layers: int
    drop_prob_lm: float
    seq_length: int
    fc_feat_size: int

    # ---- to implement -----------------------------------------------------
    def init_params(self, rng) -> Any:
        raise NotImplementedError

    def make_decoder(self, params, feats: Features, *, training: bool = False,
                     rng: Optional[jax.Array] = None) -> Tuple[Any, Any]:
        raise NotImplementedError

    def step(self, params, ctx, state, it, *, training: bool = False,
             rng: Optional[jax.Array] = None):
        raise NotImplementedError

    def decode_ctx(self, ctx):
        """Hook: one-time ctx transforms worth hoisting out of a DECODE
        while_loop (sample/sample_beam) but wrong for the teacher-forcing
        scan — e.g. the att family's f32 attention-memory cast (see
        AttModel.decode_ctx). Default: identity."""
        return ctx

    # ---- optional split-head interface -------------------------------------
    # step == head(step_core) for most families: step_core runs the recurrent
    # cell up to the pre-logit hidden vector; head is pointwise in time
    # (logit projection + log_softmax). Families that implement both (and set
    # has_split_head) let forward() hoist the head OUT of the timestep scan:
    # one [T*B, H] x [H, V+1] matmul reads the 9.7 MB generator weight once
    # per step instead of once per scan iteration fwd AND bwd — the xplane
    # floor analysis (BASELINE.md) showed those per-iteration weight streams
    # dominate the training step's backward scan at batch 50.
    @property
    def has_split_head(self) -> bool:
        return False

    def step_core(self, params, ctx, state, it, *, training: bool = False,
                  rng: Optional[jax.Array] = None):
        """Returns (h [B, H] pre-head hidden, new state)."""
        raise NotImplementedError

    def head(self, params, h, *, training: bool = False,
             rng: Optional[jax.Array] = None):
        """Pointwise-in-time completion: h [..., H] -> logprobs [..., V+1]."""
        raise NotImplementedError

    @property
    def beam_ctx_no_expand(self) -> tuple:
        """ctx keys beam search leaves unexpanded ([B, ...] shared across
        beams); the model's attention must broadcast them over beams."""
        return ()

    # ---- shared ------------------------------------------------------------
    @classmethod
    def from_config(cls, cfg) -> "CaptionDecoder":
        kwargs = {}
        for f in dataclasses.fields(cls):
            if hasattr(cfg, f.name):
                kwargs[f.name] = getattr(cfg, f.name)
            elif f.default is dataclasses.MISSING:
                raise ValueError(f"config missing required field {f.name!r}")
        return cls(**kwargs)

    def forward(self, params, feats: Features, seq, *, training: bool = False,
                rng: Optional[jax.Array] = None, ss_prob: float = 0.0,
                ss_enabled: bool = True, aux_out: Optional[dict] = None):
        """Teacher-forcing forward as one scan.

        seq: [B, L] caption labels incl. leading BOS(0) column. Returns
        logprobs [B, L-1, V+1] where slot j predicts seq[:, j+1] (parity:
        FCModel_NMT._forward returns outputs[:, 1:]).

        Scheduled sampling (ss_prob > 0, training): per element, with prob
        ss_prob the input token is replaced by a sample from the previous
        step's output distribution (parity: FCModel_NMT.py:100-115).

        aux_out: optional dict the forward fills with detached side-channel
        stats (BatchNorm batch moments for momentum running-stat tracking);
        only passed to make_decoder when provided, so overrides without the
        kwarg stay compatible.
        """
        batch = seq.shape[0]
        n_steps = seq.shape[1] - 1
        if rng is None:
            rng = jax.random.PRNGKey(0)
        ctx_rng, dec_rng = jax.random.split(rng)
        mk_kwargs = {} if aux_out is None else {"aux_out": aux_out}
        ctx, state0 = self.make_decoder(params, feats, training=training,
                                        rng=ctx_rng, **mk_kwargs)

        vocab_p1 = self.vocab_size + 1
        init_logprobs = jnp.zeros((batch, vocab_p1), dtype=jnp.float32)

        # ss_prob may be a traced scalar (host-scheduled, SURVEY.md §7.3);
        # the coin flip handles ss_prob == 0 exactly, so gate on `training`.
        # ss_enabled is the STATIC switch (trainer flips it when the ramp
        # leaves 0 — at most one retrace): with it off, scheduled sampling's
        # logits->next-input dependency disappears and the head can hoist.
        use_ss = training and ss_enabled

        if self.has_split_head and not use_ss:
            # Head hoisted out of the scan: the scan carries only the
            # recurrent cell; the logit projection + log_softmax run once
            # over the stacked [T, B, H] hiddens, so generator weights are
            # read (and their grads accumulated) once per training step
            # instead of once per timestep.
            def core_body(state, inp):
                tok, step_rng = inp
                h, state = self.step_core(params, ctx, state, tok,
                                          training=training, rng=step_rng)
                return state, h

            n = seq.shape[1] - 1
            rngs = jax.random.split(dec_rng, n + 1)
            _, hs = jax.lax.scan(core_body, state0,
                                 (seq[:, :-1].T, rngs[:n]))
            out = self.head(params, hs, training=training, rng=rngs[n])
            return jnp.transpose(out, (1, 0, 2))  # [B, L-1, V+1]

        def body(carry, inp):
            state, prev_logprobs = carry
            tok, step_rng, t = inp
            if use_ss:
                r1, r2, r3 = jax.random.split(step_rng, 3)
                # never replace the t=0 (BOS) input: the reference gates the
                # coin on i >= 1 (AttModel.py:130); at t=0 prev_logprobs is
                # uninformative zeros and sampling from it would feed a
                # uniform-random token instead of BOS.
                coin = (jax.random.uniform(r1, (batch,)) < ss_prob) & (t > 0)
                sampled = jax.random.categorical(r2, prev_logprobs, axis=-1).astype(tok.dtype)
                it = jnp.where(coin, sampled, tok)
                sub_rng = r3
            else:
                it = tok
                sub_rng = step_rng
            logprobs, state = self.step(params, ctx, state, it,
                                        training=training, rng=sub_rng)
            return (state, logprobs.astype(jnp.float32)), logprobs

        step_rngs = jax.random.split(dec_rng, n_steps)
        tokens_tm = seq[:, :-1].T  # time-major inputs: seq[:, 0..L-2]
        (_, _), out = jax.lax.scan(body, (state0, init_logprobs),
                                   (tokens_tm, step_rngs,
                                    jnp.arange(n_steps)))
        return jnp.transpose(out, (1, 0, 2))  # [B, L-1, V+1]

    def sample(self, params, feats: Features, rng, *, greedy: bool = True,
               temperature: float = 1.0, seq_length: Optional[int] = None):
        """Batched greedy/multinomial decode (parity: AttModel._sample)."""
        from ..ops.sampling import sample as _sample

        ctx_rng, samp_rng = jax.random.split(rng)
        ctx, state0 = self.make_decoder(params, feats, training=False)
        ctx = self.decode_ctx(ctx)

        def step_fn(p, state, it):
            return self.step(p, ctx, state, it, training=False)

        batch = feats.fc_feats.shape[0]
        return _sample(step_fn, params, state0, batch,
                       seq_length or self.seq_length, samp_rng,
                       greedy=greedy, temperature=temperature)

    def sample_beam(self, params, feats: Features, *, beam_size: int,
                    **beam_opts):
        """Batched beam search (parity: CaptionModel.beam_search +
        AttModel._sample_beam, but fully vectorized over [batch, beam])."""
        from ..ops.beam_search import beam_search

        ctx, state0 = self.make_decoder(params, feats, training=False)
        ctx = self.decode_ctx(ctx)

        def step_fn(p, c, state, it):
            return self.step(p, c, state, it, training=False)

        return beam_search(step_fn, params, ctx, state0,
                           beam_size=beam_size, seq_length=self.seq_length,
                           eos_is_zero=True,
                           ctx_no_expand=self.beam_ctx_no_expand,
                           **beam_opts)
