"""Fused Pallas additive attention vs the pure-XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from unpaired_image_captioning_tpu.models.att import attention_init
from unpaired_image_captioning_tpu.models.base import linear
from unpaired_image_captioning_tpu.ops.attention import fused_additive_attention
from unpaired_image_captioning_tpu.ops.masking import masked_softmax


def test_fused_attention_matches_reference(rng):
    b, n, a, d, h = 8, 12, 16, 20, 24
    p = attention_init(rng, h, a)
    ks = jax.random.split(rng, 4)
    hidden = jax.random.normal(ks[0], (b, h))
    p_att = jax.random.normal(ks[1], (b, n, a))
    emb = jax.random.normal(ks[2], (b, n, d))
    mask = jnp.ones((b, n)).at[0, 6:].set(0.0).at[3, 2:].set(0.0)

    att_h = linear(p["h2att"], hidden)
    # XLA reference (incl. alpha_net bias — softmax-invariant)
    dot = jnp.tanh(p_att + att_h[:, None, :])
    scores = (jnp.einsum("bna,ao->bno", dot, p["alpha_net"]["w"])[..., 0]
              + p["alpha_net"]["b"][0])
    w = masked_softmax(scores, mask)
    ref = jnp.einsum("bn,bnd->bd", w, emb)

    out = fused_additive_attention(p_att, att_h, p["alpha_net"]["w"], mask,
                                   emb, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_attention_partial_block(rng):
    # batch not divisible by block_b: trailing rows still correct
    b, n, a, d = 5, 7, 8, 12
    ks = jax.random.split(rng, 4)
    p_att = jax.random.normal(ks[0], (b, n, a))
    att_h = jax.random.normal(ks[1], (b, a))
    alpha = jax.random.normal(ks[2], (a, 1))
    emb = jax.random.normal(ks[3], (b, n, d))
    mask = jnp.ones((b, n))
    out = fused_additive_attention(p_att, att_h, alpha, mask, emb,
                                   block_b=4, interpret=True)
    dot = jnp.tanh(p_att + att_h[:, None, :])
    scores = jnp.einsum("bna,ao->bno", dot, alpha)[..., 0]
    w = masked_softmax(scores, mask)
    ref = jnp.einsum("bn,bnd->bd", w, emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_attention_beams_matches_reference(rng):
    from unpaired_image_captioning_tpu.ops.attention import (
        fused_additive_attention_beams)

    b, k, n, a, d = 4, 3, 10, 16, 12
    ks = jax.random.split(rng, 4)
    p_att = jax.random.normal(ks[0], (b, n, a))
    att_h = jax.random.normal(ks[1], (b, k, a))
    alpha = jax.random.normal(ks[2], (a, 1))
    emb = jax.random.normal(ks[3], (b, n, d))
    mask = jnp.ones((b, n)).at[0, 6:].set(0.0)
    out = fused_additive_attention_beams(p_att, att_h, alpha, mask, emb,
                                         interpret=True)
    dot = jnp.tanh(p_att[:, None] + att_h[:, :, None, :])
    scores = jnp.einsum("bkna,ao->bkno", dot, alpha)[..., 0]
    w = masked_softmax(scores, mask[:, None, :])
    ref = jnp.einsum("bkn,bnd->bkd", w, emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
