"""Per-family overfit tests: a model whose state threading / attention
wiring is broken cannot drive teacher-forcing loss toward zero on a tiny
fixed dataset. Catches bugs that shape-level smoke tests miss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unpaired_image_captioning_tpu import models
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.losses.criterion import language_model_loss
from unpaired_image_captioning_tpu.models.base import Features

V, T, B, N = 18, 6, 4, 5


def setup(name):
    enc = 20 if name.startswith("adaatt") else 12
    cfg = Config(caption_model=name, vocab_size=V, rnn_size=20, num_layers=1,
                 input_encoding_size=enc, att_hid_size=10, fc_feat_size=14,
                 att_feat_size=12, attri_feat_size=8, seq_length=T,
                 drop_prob_lm=0.0, num_heads=4)
    model = models.setup(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    ks = jax.random.split(rng, 4)
    feats = Features(
        fc_feats=jax.random.normal(ks[0], (B, 14)),
        att_feats=jax.random.normal(ks[1], (B, N, 12)),
        attri_feats=jax.random.normal(ks[2], (B, 8)),
        att_masks=jnp.ones((B, N)))
    seq = jax.random.randint(ks[3], (B, T + 2), 1, V + 1)
    seq = seq.at[:, 0].set(0).at[:, -1].set(0)
    masks = (seq[:, 1:] > 0).astype(jnp.float32)
    return model, params, feats, seq, masks


@pytest.mark.parametrize("name", ["topdown", "att2in2", "adaatt",
                                  "transformer", "stackcap", "denseatt"])
def test_overfit(name):
    model, params, feats, seq, masks = setup(name)
    tx = optax.adam(1e-2)
    st = tx.init(params)

    @jax.jit
    def step(params, st):
        def loss_fn(p):
            out = model.forward(p, feats, seq, training=False)
            return language_model_loss(out, seq[:, 1:], masks)

        l, g = jax.value_and_grad(loss_fn)(params)
        up, st2 = tx.update(g, st)
        return optax.apply_updates(params, up), st2, l

    first = None
    for i in range(80):
        params, st, l = step(params, st)
        if first is None:
            first = float(l)
    final = float(l)
    assert final < first * 0.25, f"{name}: {first:.3f} -> {final:.3f}"

    # after overfitting, greedy decode reproduces the training captions
    gen, _ = model.sample(params, feats, jax.random.PRNGKey(9))
    gen = np.asarray(gen)
    tgt = np.asarray(seq[:, 1:T + 1])
    match = (gen[:, : T] == tgt[:, : T]).mean()
    assert match > 0.5, f"{name}: greedy match {match:.2f}"
