"""Training criteria.

Parity map (reference `misc/criterion.py`):
- :func:`language_model_loss`  <- LanguageModelCriterion (:138-159), incl.
  the 3-headed stackcap sum;
- :func:`reward_loss`          <- RewardCriterion (:104-124) with the
  first-EOS-inclusive mask shift;
- :func:`nmt_loss`             <- NMTCriterion/NMT_loss (:126-205): NLL with
  PAD weight 0 + ppl/acc statistics;
- :func:`label_smoothing_loss` <- misc/utils.py LabelSmoothing (:289-320);
- :func:`kld_loss`             <- KLD (:285-292);
- :func:`weight_trans_loss`    <- Weight_Trans / Weight_Trans_y (:294-434):
  MSE between two embedding tables on joint-vocab rows.

All functions are pure and jit-safe; masks replace the reference's
variable-length slicing so shapes stay static.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C


def language_model_loss(logprobs, targets, masks) -> jax.Array:
    """Masked NLL over caption logprobs.

    logprobs: [B, T, V+1] log-softmax outputs (or a sequence of them for the
    stackcap multi-head case); targets, masks: [B, T] (already shifted:
    targets = labels[:, 1:], masks = masks[:, 1:], trainer.py:163).
    """
    if isinstance(logprobs, (list, tuple)):
        return sum(language_model_loss(lp, targets, masks) for lp in logprobs)
    t = min(logprobs.shape[1], targets.shape[1])
    lp = logprobs[:, :t]
    tg = targets[:, :t]
    mk = masks[:, :t].astype(jnp.float32)
    nll = -jnp.take_along_axis(lp, tg[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.sum(nll * mk) / jnp.maximum(jnp.sum(mk), 1.0)


def reward_loss(sample_logprobs, gen_seq, rewards) -> jax.Array:
    """SCST policy-gradient loss: −logprob × advantage × mask.

    sample_logprobs: [B, T] logprob of each sampled token; gen_seq: [B, T]
    sampled ids (0 after EOS); rewards: [B, T] or [B] advantage.
    Mask = (token > 0) shifted right by one so the first EOS step is
    included (criterion.py:113-116).
    """
    if rewards.ndim == 1:
        rewards = rewards[:, None] * jnp.ones_like(sample_logprobs)
    nonzero = (gen_seq > 0).astype(jnp.float32)
    mask = jnp.concatenate(
        [jnp.ones((gen_seq.shape[0], 1), jnp.float32), nonzero[:, :-1]], axis=1)
    out = -sample_logprobs * rewards * mask
    return jnp.sum(out) / jnp.maximum(jnp.sum(mask), 1.0)


class NMTStats(NamedTuple):
    """ppl/acc bookkeeping (parity: criterion.py Statistics :47-102)."""

    loss: jax.Array      # summed NLL
    n_words: jax.Array   # non-pad target tokens
    n_correct: jax.Array

    def ppl(self):
        return jnp.exp(jnp.minimum(self.loss / jnp.maximum(self.n_words, 1), 100.0))

    def accuracy(self):
        return 100.0 * self.n_correct / jnp.maximum(self.n_words, 1)

    def __add__(self, other):
        return NMTStats(self.loss + other.loss, self.n_words + other.n_words,
                        self.n_correct + other.n_correct)


def nmt_loss(logits_or_logprobs, targets, *, already_log: bool = False,
             label_smoothing: float = 0.0):
    """NLL with PAD weight 0 over generator outputs.

    logits: [B, T, V] (or [N, V]); targets: [B, T] (or [N]) with PAD=0
    excluded. Returns (mean-per-token loss, NMTStats with summed loss).
    """
    v = logits_or_logprobs.shape[-1]
    lp = logits_or_logprobs.reshape(-1, v)
    if not already_log:
        lp = jax.nn.log_softmax(lp.astype(jnp.float32), axis=-1)
    tg = targets.reshape(-1).astype(jnp.int32)
    non_pad = (tg != C.PAD).astype(jnp.float32)
    if label_smoothing > 0.0:
        loss_tok = label_smoothing_loss(lp, tg, smoothing=label_smoothing,
                                        pad_idx=C.PAD, reduce=False)
    else:
        loss_tok = -jnp.take_along_axis(lp, tg[:, None], axis=-1)[:, 0]
    loss_sum = jnp.sum(loss_tok * non_pad)
    pred = jnp.argmax(lp, axis=-1)
    n_correct = jnp.sum((pred == tg).astype(jnp.float32) * non_pad)
    n_words = jnp.sum(non_pad)
    stats = NMTStats(loss_sum, n_words, n_correct)
    return loss_sum / jnp.maximum(n_words, 1.0), stats


def label_smoothing_loss(logprobs, targets, *, smoothing: float = 0.1,
                         pad_idx: int = C.PAD, reduce: bool = True):
    """KL-based smoothed XE (parity: misc/utils.py:289-320).

    logprobs: [N, V] log-probabilities; targets: [N]. True dist: confidence
    at target, smoothing mass spread over V-2 slots (excluding pad + target),
    zero at pad; pad targets contribute 0.
    """
    n, v = logprobs.shape
    confidence = 1.0 - smoothing
    smooth_val = smoothing / (v - 2)
    true_dist = jnp.full((n, v), smooth_val, jnp.float32)
    true_dist = true_dist.at[:, pad_idx].set(0.0)
    true_dist = jnp.where(
        jax.nn.one_hot(targets, v, dtype=bool), confidence, true_dist)
    # KLDiv(log_input, target) summed, with target*log(target) terms constant
    kl = jnp.where(true_dist > 0,
                   true_dist * (jnp.log(jnp.maximum(true_dist, 1e-20)) - logprobs),
                   0.0)
    loss_tok = jnp.sum(kl, axis=-1)
    loss_tok = jnp.where(targets == pad_idx, 0.0, loss_tok)
    if reduce:
        return jnp.sum(loss_tok)
    return loss_tok


def kld_loss(logprobs_student, probs_teacher) -> jax.Array:
    """KL(teacher || student) per element (parity: criterion.py:285-292)."""
    kl = probs_teacher * (jnp.log(jnp.maximum(probs_teacher, 1e-20)) - logprobs_student)
    return jnp.mean(jnp.sum(kl, axis=-1))


def ref_exhaustion_loss(upper_bounds_seq, *, shard_size: int,
                        lambda_exhaust: float) -> jax.Array:
    """The reference's EXACT exhaustion term, exec-parity form
    (onmt/Loss.py:190-205 inside the shard loop): for each
    max_generator_batches-sized TIME shard, take the upper bounds at the
    shard's LAST timestep, drop the <SINK> column, and sum — so the value
    depends on the shard size, not just the final state (the term is
    re-added once per shard). upper_bounds_seq: [B, T, S] per-step bounds
    AFTER each step's attention subtraction. Exec-pinned vs the fork's own
    MemoryEfficientLoss in tests/test_ref_fork_loss_parity.py."""
    t = upper_bounds_seq.shape[1]
    last_steps = [min(k + shard_size, t) - 1
                  for k in range(0, t, shard_size)]
    u = upper_bounds_seq[:, jnp.asarray(last_steps), :-1]  # drop <SINK>
    return lambda_exhaust * jnp.sum(u)


def ref_coverage_loss(coverage_seq, attn_seq, *,
                      lambda_coverage: float) -> jax.Array:
    """The reference's EXACT coverage term (onmt/Loss.py:186-188):
    lambda * sum(min(coverage_t, attn_t)) over all steps. Shard-invariant
    (elementwise sum). Upstream this only EXECUTES together with
    copy_loss — `s["attn_t"]` is only sharded when copy_loss is on
    (Loss.py:166-168), so attn_seq is the COPY attention there; without
    copy_loss the reference KeyErrors. coverage_seq/attn_seq: [B, T, S]."""
    return lambda_coverage * jnp.sum(
        jnp.minimum(coverage_seq.astype(jnp.float32),
                    attn_seq.astype(jnp.float32)))


def attention_regularizers(attns, *, upper_bounds=None, coverage=None,
                           lambda_exhaust: float = 0.001,
                           lambda_coverage: float = 1.0) -> jax.Array:
    """Attention-budget penalties — this framework's own smoothed variants
    of the reference's exhaustion/coverage terms (onmt/Loss.py:186-205;
    for the reference's exact per-shard terms use ref_exhaustion_loss /
    ref_coverage_loss, exec-pinned).

    - exhaustion: penalize leftover fertility budget on real source slots
      (everything the <SINK> column didn't absorb);
    - coverage: penalize total attention mass exceeding 1 per source slot.
    attns: [B, T, S]; upper_bounds/coverage: final state values [B, S].
    """
    loss = jnp.float32(0.0)
    if upper_bounds is not None and lambda_exhaust:
        leftover = jnp.maximum(upper_bounds[:, :-1], 0.0)  # exclude <SINK>
        loss = loss + lambda_exhaust * jnp.mean(jnp.sum(leftover, axis=-1))
    if coverage is not None and lambda_coverage:
        over = jnp.maximum(coverage - 1.0, 0.0)
        loss = loss + lambda_coverage * jnp.mean(jnp.sum(over, axis=-1))
    return loss


def weight_trans_loss(emb_a, emb_b, align_a: jax.Array, align_b: jax.Array) -> jax.Array:
    """Pivot embedding-alignment MSE (parity: criterion.py:359-364, 294-434).

    emb_a: [Va, D] (e.g. captioner zh embedding), emb_b: [Vb, D] (NMT src
    embedding); align_a/align_b: [J] row indices into each table for the J
    joint-vocab words (built host-side by `pivot.build_joint_vocab`).
    """
    a = emb_a[align_a]
    b = emb_b[align_b]
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))
