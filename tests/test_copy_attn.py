"""Copy attention / CopyGenerator and attention regularizer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from unpaired_image_captioning_tpu import constants as C
from unpaired_image_captioning_tpu.losses.criterion import (
    attention_regularizers, nmt_loss)
from unpaired_image_captioning_tpu.models.nmt import NMTModel

SRC_V, TGT_V = 31, 29
B, S, T = 4, 7, 6


def make_batch(rng):
    k1, k2 = jax.random.split(rng)
    src = jax.random.randint(k1, (B, S), 4, SRC_V)
    lengths = jnp.full((B,), S, jnp.int32)
    tgt = jax.random.randint(k2, (B, T), 4, TGT_V)
    tgt = tgt.at[:, 0].set(C.BOS).at[:, -1].set(C.EOS)
    return src, lengths, tgt


def test_copy_generator(rng):
    model = NMTModel(src_vocab_size=SRC_V, tgt_vocab_size=TGT_V,
                     word_vec_size=16, rnn_size=24, layers=1, copy_attn=True,
                     max_decode_len=8)
    params = model.init_params(rng)
    assert "copy_gate" in params
    src, lengths, tgt = make_batch(rng)
    outs, (attns, copy_attns) = model.forward(params, src, lengths, tgt)
    assert copy_attns.shape == (B, T - 1, S)
    np.testing.assert_allclose(np.asarray(copy_attns.sum(-1)), 1.0, atol=1e-4)

    src2tgt = np.full((SRC_V,), C.UNK, np.int32)
    src2tgt[5:15] = np.arange(5, 15)  # shared surface forms
    lp = model.copy_generator_logprobs(params, outs, copy_attns, src,
                                       jnp.asarray(src2tgt))
    assert lp.shape == (B, T - 1, TGT_V)
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, atol=1e-3)
    loss, _ = nmt_loss(lp, tgt[:, 1:], already_log=True)
    assert np.isfinite(float(loss))

    # gradient flows through the copy path
    def f(p):
        o, (a, ca) = model.forward(p, src, lengths, tgt)
        l, _ = nmt_loss(model.copy_generator_logprobs(p, o, ca, src,
                                                      jnp.asarray(src2tgt)),
                        tgt[:, 1:], already_log=True)
        return l

    g = jax.grad(f)(params)
    assert float(jnp.abs(g["copy_gate"]["w"]).sum()) > 0


def test_attention_regularizers():
    ub = jnp.concatenate([jnp.full((2, 4), 0.5), jnp.full((2, 1), 90.0)], 1)
    cov = jnp.full((2, 5), 1.4)
    loss = attention_regularizers(None, upper_bounds=ub, coverage=cov,
                                  lambda_exhaust=0.01, lambda_coverage=1.0)
    # exhaustion: 4 slots x 0.5 x 0.01 = 0.02 ; coverage: 5 x 0.4 = 2.0
    np.testing.assert_allclose(float(loss), 0.02 + 2.0, atol=1e-5)
