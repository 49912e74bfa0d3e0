"""Transformer decode-path self-check.

Parity: the reference transformer asserts its incremental decode equals the
parallel decode (TransformerModel.py:521-523). Here: teacher-forcing the
greedy-decoded sequence through the parallel path must yield the same
argmax at every step the KV-cache incremental path chose."""

import jax
import jax.numpy as jnp
import numpy as np

from unpaired_image_captioning_tpu import models
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.models.base import Features

V, T, B, N = 21, 7, 3, 5


def test_incremental_matches_parallel(rng):
    cfg = Config(caption_model="transformer", vocab_size=V, rnn_size=32,
                 num_layers=2, input_encoding_size=16, att_hid_size=16,
                 fc_feat_size=10, att_feat_size=12, seq_length=T,
                 drop_prob_lm=0.0, num_heads=4)
    model = models.setup(cfg)
    params = model.init_params(rng)
    ks = jax.random.split(rng, 3)
    feats = Features(
        fc_feats=jax.random.normal(ks[0], (B, 10)),
        att_feats=jax.random.normal(ks[1], (B, N, 12)),
        att_masks=jnp.ones((B, N)).at[0, 3:].set(0.0))

    # incremental greedy decode (fixed KV cache)
    seq, _ = model.sample(params, feats, ks[2])
    seq = np.asarray(seq)

    # parallel teacher forcing on [BOS; seq]
    full = np.zeros((B, T + 1), np.int32)
    full[:, 1:] = seq
    lp = model.forward(params, feats, jnp.asarray(full), training=False)
    par_argmax = np.asarray(jnp.argmax(lp, -1))  # slot j predicts full[:, j+1]

    for b in range(B):
        for t in range(T):
            np.testing.assert_equal(
                par_argmax[b, t], seq[b, t],
                err_msg=f"b={b} t={t}")
            if seq[b, t] == 0:
                break


def test_beam_cross_kv_share_parity(rng):
    """Beam decode with UNEXPANDED cross K/V (beams of one image share the
    encoder memory, CROSS_KV_SHARE) must be token- and score-identical to
    the expanded path."""
    from unpaired_image_captioning_tpu.models import transformer as tmod

    cfg = Config(caption_model="transformer", vocab_size=V, rnn_size=32,
                 num_layers=2, input_encoding_size=16, att_hid_size=16,
                 fc_feat_size=10, att_feat_size=12, seq_length=T,
                 drop_prob_lm=0.0, num_heads=4)
    model = models.setup(cfg)
    params = model.init_params(rng)
    ks = jax.random.split(rng, 3)
    feats = Features(
        fc_feats=jax.random.normal(ks[0], (B, 10)),
        att_feats=jax.random.normal(ks[1], (B, N, 12)),
        att_masks=jnp.ones((B, N)).at[0, 3:].set(0.0))

    old = tmod.CROSS_KV_SHARE
    try:
        tmod.CROSS_KV_SHARE = False
        assert model.beam_ctx_no_expand == ()
        r_exp = model.sample_beam(params, feats, beam_size=5)
        tmod.CROSS_KV_SHARE = True
        assert model.beam_ctx_no_expand == ("cross", "src_mask")
        r_shr = model.sample_beam(params, feats, beam_size=5)
    finally:
        tmod.CROSS_KV_SHARE = old
    np.testing.assert_array_equal(np.asarray(r_exp.seq), np.asarray(r_shr.seq))
    np.testing.assert_allclose(np.asarray(r_exp.scores),
                               np.asarray(r_shr.scores), rtol=1e-5, atol=1e-5)


def test_transformer_use_bn(rng, tmp_path):
    """Transformer att_embed BatchNorm (use_bn/use_bn=2, reference
    TransformerModel.py:321-326): params exist, trainer momentum-tracks the
    running stats, and eval decode consumes them finitely."""
    import math

    from unpaired_image_captioning_tpu.data.dataloader import CaptionDataLoader
    from unpaired_image_captioning_tpu.data.synthetic import (
        make_caption_artifacts)
    from unpaired_image_captioning_tpu.train.trainer import Trainer

    jpath, h5path, mem = make_caption_artifacts(str(tmp_path), vocab_size=V)
    loader = CaptionDataLoader(input_json=jpath, input_label_h5=h5path,
                               batch_size=4, seq_per_img=2, att_feat_size=24,
                               attri_feat_size=16, in_memory=mem,
                               use_box_cls_prob=0)
    cfg = Config(caption_model="transformer", use_bn=2, vocab_size=V,
                 rnn_size=32, num_layers=2, input_encoding_size=16,
                 att_hid_size=16, fc_feat_size=32, att_feat_size=24,
                 seq_length=loader.seq_length, drop_prob_lm=0.1, num_heads=4,
                 batch_size=4, seq_per_img=2, i2t_train_flag=True,
                 i2t_learning_rate=1e-3,
                 checkpoint_path=str(tmp_path / "save"))
    tr = Trainer(cfg)
    assert "bn0" in tr.i2t_params and "bn1" in tr.i2t_params
    for _ in range(2):
        m = tr.train(loader.get_batch("train"))
    assert math.isfinite(m["i2t_loss"])
    assert float(jnp.abs(tr.i2t_params["bn0"]["mean"]).max()) > 0
    assert float(jnp.abs(tr.i2t_params["bn1"]["mean"]).max()) > 0

    d = loader.get_batch("val")
    feats = Features(fc_feats=jnp.asarray(d["fc_feats"]),
                     att_feats=jnp.asarray(d["att_feats"]),
                     att_masks=jnp.asarray(d["att_masks"]))
    seq, logps = tr.i2t_model.sample(tr.i2t_params, feats,
                                     jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(logps)).all()
