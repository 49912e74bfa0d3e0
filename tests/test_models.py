"""Smoke + semantics tests across the caption model families."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu import models
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.losses.criterion import language_model_loss
from unpaired_image_captioning_tpu.models.base import Features

VOCAB = 23
B, N, T = 4, 6, 8


def tiny_cfg(model: str) -> Config:
    # adaatt requires input_encoding_size == rnn_size (sentinel concat)
    enc = 24 if model.startswith("adaatt") else 16
    return Config(
        caption_model=model, vocab_size=VOCAB, rnn_size=24, num_layers=1,
        input_encoding_size=enc, att_hid_size=12, attri_hid_size=12,
        fc_feat_size=20, att_feat_size=18, attri_feat_size=10,
        seq_length=T, drop_prob_lm=0.5, batch_size=B,
    )


def make_feats(rng) -> Features:
    ks = jax.random.split(rng, 4)
    masks = jnp.ones((B, N)).at[0, 4:].set(0.0)
    return Features(
        fc_feats=jax.random.normal(ks[0], (B, 20)),
        att_feats=jax.random.normal(ks[1], (B, N, 18)),
        attri_feats=jax.random.normal(ks[2], (B, 10)),
        att_masks=masks,
    )


def make_seq(rng):
    seq = jax.random.randint(rng, (B, T + 2), 1, VOCAB + 1)
    seq = seq.at[:, 0].set(0)          # leading BOS slot
    seq = seq.at[:, -1].set(0)         # trailing EOS slot
    seq = seq.at[0, 5:].set(0)         # one short caption
    return seq


ALL_MODELS = ["fc", "show_tell", "show_attend_tell", "att2in", "att2in2",
              "att2all2", "adaatt", "adaattmo", "topdown", "stackatt",
              "denseatt", "transformer", "stackcap"]


@pytest.mark.parametrize("name", ALL_MODELS)
def test_forward_sample_beam(rng, name):
    cfg = tiny_cfg(name)
    model = models.setup(cfg)
    params = model.init_params(rng)
    feats = make_feats(rng)
    seq = make_seq(jax.random.fold_in(rng, 1))

    out = model.forward(params, feats, seq, training=True,
                        rng=jax.random.fold_in(rng, 2), ss_prob=0.1)
    heads = out if isinstance(out, list) else [out]
    for h in heads:
        assert h.shape == (B, T + 1, VOCAB + 1)
        # log_softmax rows sum to 1 in prob space
        np.testing.assert_allclose(
            np.exp(np.asarray(h[0, 0])).sum(), 1.0, atol=1e-4)

    masks = (seq[:, 1:] > 0).astype(jnp.float32)
    loss = language_model_loss(out, seq[:, 1:], masks)
    assert np.isfinite(float(loss))

    # greedy sample
    gen, logps = model.sample(params, feats, jax.random.fold_in(rng, 3))
    assert gen.shape == (B, T) and logps.shape == (B, T)
    gen = np.asarray(gen)
    for row in gen:
        stopped = False
        for tok in row:
            if stopped:
                assert tok == 0
            if tok == 0:
                stopped = True

    # multinomial sample
    gen2, _ = model.sample(params, feats, jax.random.fold_in(rng, 4),
                           greedy=False, temperature=1.0)
    assert gen2.shape == (B, T)

    # beam search
    res = model.sample_beam(params, feats, beam_size=3)
    assert res.seq.shape == (B, 3, T)
    assert res.scores.shape == (B, 3)
    # beams sorted by score within group
    s = np.asarray(res.scores)
    assert (np.diff(s, axis=1) <= 1e-5).all()


def test_greedy_matches_beam1_fc(rng):
    """beam_size=1 must reproduce greedy decode (no length-norm, no groups)."""
    cfg = tiny_cfg("fc")
    model = models.setup(cfg)
    params = model.init_params(rng)
    feats = make_feats(rng)
    gen, _ = model.sample(params, feats, jax.random.fold_in(rng, 3))
    res = model.sample_beam(params, feats, beam_size=1, suppress_unk=False)
    np.testing.assert_array_equal(np.asarray(gen), np.asarray(res.seq[:, 0]))


@pytest.mark.parametrize("name", ["fc", "stackcap"])
def test_scheduled_sampling_never_replaces_bos(rng, name):
    """The ss coin must be skipped at t=0 (reference AttModel.py:130 gates on
    i >= 1): with dropout off, the step-0 logprobs under ss_prob=1.0 must be
    identical to teacher forcing, since the BOS input is never replaced."""
    cfg = dataclasses.replace(tiny_cfg(name), drop_prob_lm=0.0)
    model = models.setup(cfg)
    params = model.init_params(rng)
    feats = make_feats(rng)
    seq = make_seq(jax.random.fold_in(rng, 1))
    frng = jax.random.fold_in(rng, 2)
    out0 = model.forward(params, feats, seq, training=True, rng=frng,
                         ss_prob=0.0)
    out1 = model.forward(params, feats, seq, training=True, rng=frng,
                         ss_prob=1.0)
    if isinstance(out0, list):  # stackcap multi-head
        out0, out1 = out0[-1], out1[-1]
    np.testing.assert_allclose(np.asarray(out0[:, 0]), np.asarray(out1[:, 0]),
                               atol=1e-6)
    # ...and later steps DO diverge under ss_prob=1.0
    assert not np.allclose(np.asarray(out0[:, 1:]), np.asarray(out1[:, 1:]))


def test_forward_deterministic_eval(rng):
    cfg = tiny_cfg("topdown")
    model = models.setup(cfg)
    params = model.init_params(rng)
    feats = make_feats(rng)
    seq = make_seq(rng)
    a = model.forward(params, feats, seq, training=False)
    b = model.forward(params, feats, seq, training=False,
                      rng=jax.random.fold_in(rng, 9))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fc_loss_decreases(rng):
    """Minimal end-to-end training slice: loss goes down under adam."""
    import optax

    cfg = tiny_cfg("fc")
    model = models.setup(cfg)
    params = model.init_params(rng)
    feats = make_feats(rng)
    seq = make_seq(rng)
    masks = (seq[:, 1:] > 0).astype(jnp.float32)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.forward(p, feats, seq, training=False)
            return language_model_loss(out, seq[:, 1:], masks)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(30):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.7


def test_logit_layers_and_use_bn(rng):
    """logit MLP head (logit_layers>1) + BatchNorm variants compile and
    decode (AttModel.py:88-93 logit stack, :79-84 use_bn)."""
    cfg = tiny_cfg("topdown")
    cfg.logit_layers = 2
    cfg.use_bn = 2
    model = models.setup(cfg)
    params = model.init_params(rng)
    assert len(params["logit"]) == 2
    assert "bn0" in params and "bn1" in params
    feats = make_feats(rng)
    seq = make_seq(rng)
    out = model.forward(params, feats, seq, training=True,
                        rng=jax.random.fold_in(rng, 1))
    assert np.isfinite(np.asarray(out)).all()
    gen, _ = model.sample(params, feats, rng)
    assert gen.shape == (B, T)


def test_adaatt_beam_shared_memory_matches_expanded(monkeypatch):
    """AdaAtt's k-aware sentinel attention under the unexpanded beam
    layout must reproduce the expanded layout's decode (same per-image
    memory, summation split sentinel/slots is the only float difference)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unpaired_image_captioning_tpu import models
    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.models.att import AdaAttModel
    from unpaired_image_captioning_tpu.models.base import Features

    cfg = Config(caption_model="adaatt", vocab_size=30, rnn_size=16,
                 num_layers=1, input_encoding_size=16, att_hid_size=12,
                 fc_feat_size=20, att_feat_size=14, seq_length=7,
                 drop_prob_lm=0.0)
    model = models.setup(cfg)
    params = model.init_params(jax.random.PRNGKey(2))
    rng = np.random.RandomState(4)
    feats = Features(
        fc_feats=jnp.asarray(rng.randn(3, 20), jnp.float32),
        att_feats=jnp.asarray(rng.randn(3, 5, 14), jnp.float32),
        attri_feats=None,
        att_masks=jnp.asarray(
            np.concatenate([np.ones((3, 3)), np.zeros((3, 2))], 1)
            .astype(np.float32)))
    res_shared = model.sample_beam(params, feats, beam_size=4)

    monkeypatch.setattr(AdaAttModel, "beam_ctx_no_expand",
                        property(lambda self: ()))
    res_exp = model.sample_beam(params, feats, beam_size=4)
    np.testing.assert_array_equal(np.asarray(res_shared.seq),
                                  np.asarray(res_exp.seq))
    np.testing.assert_allclose(np.asarray(res_shared.scores),
                               np.asarray(res_exp.scores), atol=1e-5)


@pytest.mark.parametrize("name", ["fc", "show_tell", "all_img", "denseatt",
                                  "topdown", "adaatt"])
def test_split_head_forward_matches_step_scan(rng, name):
    """forward()'s hoisted-head path (head computed once over the stacked
    [T, B, H] hiddens when scheduled sampling is statically off — the
    training-step HBM-floor fix, BASELINE.md) must match the in-scan
    step() path that ss_enabled=True uses, at eval AND at training with
    drop_prob 0 (the statically-ss-off XE operating point)."""
    cfg = tiny_cfg(name if name != "all_img" else "all_img")
    model = models.setup(cfg)
    assert model.has_split_head
    params = model.init_params(rng)
    feats = make_feats(rng)
    seq = make_seq(jax.random.fold_in(rng, 1))
    model0 = dataclasses.replace(model, drop_prob_lm=0.0)
    for training in (False, True):
        r = jax.random.fold_in(rng, 2)
        out_split = model0.forward(params, feats, seq, training=training,
                                   rng=r, ss_enabled=False)
        out_scan = model0.forward(params, feats, seq, training=training,
                                  rng=r, ss_enabled=True)
        np.testing.assert_allclose(np.asarray(out_split),
                                   np.asarray(out_scan), rtol=1e-5,
                                   atol=1e-5)
