"""Masking utilities — fixed-shape replacements for the reference's
packed-sequence machinery (AttModel.py:44-53 pack_wrapper; onmt sort-by-len).
"""

from __future__ import annotations

import jax.numpy as jnp


def length_mask(lengths, max_len: int, dtype=jnp.float32):
    """[B] lengths -> [B, max_len] 0/1 mask."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(dtype)


def seq_mask_from_labels(labels, include_first_eos: bool = True, dtype=jnp.float32):
    """Caption label tensor [B, T] (0 = pad/eos) -> loss mask [B, T].

    The reference builds masks with a 1 at the first EOS slot as well
    (dataloader.py get_batch: mask covers len+2 with the implicit eos), so
    `include_first_eos=True` shifts a 1 past the last nonzero token.
    """
    nonzero = (labels > 0)
    if not include_first_eos:
        return nonzero.astype(dtype)
    # mask[t] = 1 if labels[t] != 0 or labels[t-1] != 0  (first EOS kept)
    prev = jnp.pad(nonzero[:, :-1], ((0, 0), (1, 0)), constant_values=True)
    return jnp.logical_or(nonzero, prev).astype(dtype)


def masked_softmax(logits, mask, axis: int = -1):
    """Softmax with a multiplicative 0/1 mask and renormalization.

    Parity with reference Attention (AttModel.py:552-554): softmax first,
    multiply by mask, renormalize — NOT -inf masking. Keeps loss equivalence
    with the reference where padded attention slots exist.
    """
    weight = jnp.exp(logits - jnp.max(logits, axis=axis, keepdims=True))
    if mask is not None:
        weight = weight * mask
    denom = jnp.sum(weight, axis=axis, keepdims=True)
    return weight / jnp.maximum(denom, 1e-9)
