"""Step-fused att1->lstm1->att2 kernel vs the composed XLA ops."""

import jax
import jax.numpy as jnp
import numpy as np

from unpaired_image_captioning_tpu.models.att import (attention_apply,
                                                      attention_init)
from unpaired_image_captioning_tpu.models.base import linear, linear_init
from unpaired_image_captioning_tpu.ops import rnn
from unpaired_image_captioning_tpu.ops.attention import fused_att_lstm_att


def test_fused_stack_matches_composed(rng):
    b, n, a, h, d = 6, 9, 16, 16, 16  # D == H (att_emb in rnn space)
    ks = jax.random.split(rng, 10)
    p_att = jax.random.normal(ks[0], (b, n, a))
    att_emb = jax.random.normal(ks[1], (b, n, d))
    mask = jnp.ones((b, n)).at[0, 5:].set(0.0)
    h0d = jax.random.normal(ks[2], (b, h))
    h1p = jax.random.normal(ks[3], (b, h))
    c1p = jax.random.normal(ks[4], (b, h))
    att1_p = attention_init(ks[5], h, a)
    att2_p = attention_init(ks[6], h, a)
    lstm1 = rnn.init_lstm_params(ks[7], 2 * h, h, maxout=True)
    emb2 = linear_init(ks[8], d, h)

    # composed reference (the _stack XLA path, dropout-free)
    att1 = attention_apply(att1_p, h0d, att_emb, p_att, mask)
    h1_ref, c1_ref = rnn.lstm_step(lstm1, jnp.concatenate([h0d, att1], -1),
                                   h1p, c1p, maxout=True, use_pallas=False)
    att2_ref = attention_apply(att2_p, h1_ref + linear(emb2, att1),
                               att_emb, p_att, mask)

    q1 = linear(att1_p["h2att"], h0d)
    h1, c1, att2 = fused_att_lstm_att(
        p_att, att_emb, mask, q1, h0d, h1p, c1p, lstm1["w"], lstm1["b"],
        emb2["w"], emb2["b"], att2_p["h2att"]["w"], att2_p["h2att"]["b"],
        att1_p["alpha_net"]["w"], att2_p["alpha_net"]["w"],
        block_b=4, interpret=True)

    np.testing.assert_allclose(np.asarray(h1), np.asarray(h1_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c1_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(att2), np.asarray(att2_ref),
                               atol=2e-5)
