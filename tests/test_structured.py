"""Matrix-tree structured attention + image encoder tests."""

import jax
import jax.numpy as jnp
import numpy as np

from unpaired_image_captioning_tpu.models.nmt import (NMTDecoder,
                                                      NMTImageEncoder)
from unpaired_image_captioning_tpu.ops.attention_transforms import (
    matrix_tree_marginals)


def test_matrix_tree_marginals_are_distributions(rng):
    b, n = 3, 5
    k1, k2 = jax.random.split(rng)
    scores = jax.random.normal(k1, (b, n, n))
    roots = jax.random.normal(k2, (b, n))
    marg, root_marg = matrix_tree_marginals(scores, roots)
    # every child (except the MTT-anchored slot 0) has exactly one parent in
    # expectation: root prob + sum of incoming edge marginals == 1
    incoming = np.asarray(marg.sum(axis=1) + root_marg)
    np.testing.assert_allclose(incoming[:, 1:], 1.0, atol=1e-3)
    assert (np.asarray(marg)[:, :, 1:] > -1e-4).all()


def test_matrix_tree_peaked_scores(rng):
    # a huge score on edge (1 -> 2) should give that edge marginal ~1
    b, n = 1, 4
    scores = jnp.zeros((b, n, n)).at[0, 1, 2].set(12.0)
    roots = jnp.zeros((b, n))
    marg, _ = matrix_tree_marginals(scores, roots)
    assert float(marg[0, 1, 2]) > 0.95


def test_image_encoder_feeds_decoder(rng):
    enc = NMTImageEncoder(feat_size=16, rnn_size=24, layers=1)
    p_enc = enc.init_params(rng)
    grid = jax.random.normal(rng, (2, 3, 4, 16))
    ctx, (h, c) = enc.apply(p_enc, grid)
    assert ctx.shape == (2, 12, 24)
    assert h.shape == (1, 2, 24)

    dec = NMTDecoder(vocab_size=20, word_vec_size=8, rnn_size=24, layers=1)
    p_dec = dec.init_params(jax.random.fold_in(rng, 1))
    state = dec.init_state((h, c), ctx)
    it = jnp.zeros((2,), jnp.int32)
    out, attn, state = dec.step(p_dec, ctx, state, it)
    assert out.shape == (2, 24) and attn.shape == (2, 12)
