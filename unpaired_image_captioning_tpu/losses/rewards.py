"""SCST (self-critical sequence training) rewards — fully on device.

Parity: reference `misc/rewards.py:37-81`:
- greedy baseline decode with the model in eval mode (:42-47);
- reward = cider_reward_weight · CIDEr-D + bleu_reward_weight · BLEU-4,
  scored against the image's ground-truth captions (`data['gts']`);
- advantage = reward(sample) − reward(greedy), broadcast over timesteps.

Differences by design: sequences never leave the device — n-gram scoring is
the tensor program in ops/cider.py over the prepro_ngrams df table (the
reference stringifies ids and runs host Python n-gram dicts every step,
rewards.py:51-66).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.cider import DfTable, bleu4, cider_d


def compute_reward(seq, gts, gts_mask, table: DfTable, *,
                   cider_weight: float = 1.0, bleu_weight: float = 0.0):
    """seq: [B, T] sampled/greedy ids; gts: [B, R, Tg]; gts_mask: [B, R]."""
    r = jnp.zeros((seq.shape[0],), jnp.float32)
    if cider_weight != 0.0:
        r = r + cider_weight * cider_d(seq, gts, gts_mask, table)
    if bleu_weight != 0.0:
        r = r + bleu_weight * bleu4(seq, gts, gts_mask)
    return r


def get_self_critical_reward(sample_seq, greedy_seq, gts, gts_mask,
                             table: DfTable, *, cider_weight: float = 1.0,
                             bleu_weight: float = 0.0):
    """Returns advantage [B, T] = reward(sample) − reward(greedy), repeated
    over time (parity: rewards.py:78-80)."""
    rs = compute_reward(sample_seq, gts, gts_mask, table,
                        cider_weight=cider_weight, bleu_weight=bleu_weight)
    rg = compute_reward(greedy_seq, gts, gts_mask, table,
                        cider_weight=cider_weight, bleu_weight=bleu_weight)
    adv = rs - rg
    return jnp.broadcast_to(adv[:, None], sample_seq.shape).astype(jnp.float32), rs
