"""Tests: image front-end kernel, word cloud, weight transplant, optimizer
schedules, attention transforms under grad, metric logger."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_resize_normalize_pallas_matches_xla(np_rng):
    from unpaired_image_captioning_tpu.ops.image import resize_normalize

    imgs = np_rng.randint(0, 256, (2, 24, 32, 3)).astype(np.uint8)
    a = resize_normalize(jnp.asarray(imgs), h_out=16, w_out=16,
                         use_pallas=False)
    b = resize_normalize(jnp.asarray(imgs), h_out=16, w_out=16,
                         use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # oracle check on UPSCALE (jax.image.resize antialiases downscales, so
    # kernels only agree for scale >= 1)
    from unpaired_image_captioning_tpu.models.resnet import (IMAGENET_MEAN,
                                                             IMAGENET_STD)

    up = resize_normalize(jnp.asarray(imgs), h_out=48, w_out=64,
                          use_pallas=False)
    ref = jax.image.resize(jnp.asarray(imgs, jnp.float32), (2, 48, 64, 3),
                           method="linear")
    ref = (ref / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref), atol=1e-3)


def test_word_cloud(tmp_path):
    from unpaired_image_captioning_tpu.utils.word_cloud import (
        layout_words, render_svg, word_cloud_from_captions)

    freqs = {"cat": 10.0, "dog": 6.0, "horse": 3.0, "zebra": 1.0}
    placed = layout_words(freqs, width=300, height=150, seed=1)
    assert placed and placed[0][0] == "cat"
    # boxes must not overlap
    boxes = []
    for word, font, x, y in placed:
        w = int(len(word) * font * 0.62) + 2
        h = font + 2
        for (ox, oy, ow, oh) in boxes:
            assert (x + w <= ox or ox + ow <= x or y + h <= oy or oy + oh <= y)
        boxes.append((x, y, w, h))
    svg = word_cloud_from_captions(["the cat sat", "the cat ran", "a dog"],
                                   str(tmp_path / "wc.svg"))
    assert "<svg" in svg and "cat" in svg
    assert os.path.exists(tmp_path / "wc.svg")


def test_weight_transplant(rng):
    from unpaired_image_captioning_tpu import models
    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.models.weight_init import (
        partial_embedding_transplant, transplant)

    cfg = Config(caption_model="fc", vocab_size=20, rnn_size=16, num_layers=1,
                 input_encoding_size=8, fc_feat_size=12, seq_length=6)
    m = models.setup(cfg)
    donor = m.init_params(rng)
    fresh = m.init_params(jax.random.fold_in(rng, 1))
    out, moved, skipped = transplant(fresh, donor)
    assert not skipped
    np.testing.assert_allclose(np.asarray(out["embed"]),
                               np.asarray(donor["embed"]))

    # cross-shape transplant: only matching leaves move
    cfg2 = Config(caption_model="fc", vocab_size=20, rnn_size=24, num_layers=1,
                  input_encoding_size=8, fc_feat_size=12, seq_length=6)
    m2 = models.setup(cfg2)
    fresh2 = m2.init_params(rng)
    out2, moved2, skipped2 = transplant(fresh2, donor)
    assert "/embed" in moved2
    assert any("core" in s for s in skipped2)

    emb = jnp.zeros((5, 4))
    donor_emb = jnp.ones((7, 4)) * 2
    res = partial_embedding_transplant(emb, donor_emb,
                                       np.asarray([[0, 3], [2, 1]]))
    assert float(res[0, 0]) == 2.0 and float(res[2, 0]) == 2.0
    assert float(res[1, 0]) == 0.0


def test_lr_schedules():
    from unpaired_image_captioning_tpu.train.optimizer import (
        PlateauScheduler, epoch_decayed_lr, noam_lr, scheduled_sampling_prob)

    assert epoch_decayed_lr(1.0, 2, 5, 3, 0.5) == 1.0
    assert epoch_decayed_lr(1.0, 8, 5, 3, 0.5) == 0.5
    assert epoch_decayed_lr(1.0, 11, 5, 3, 0.5) == 0.25
    assert noam_lr(512, 2.0, 4000, 1) < noam_lr(512, 2.0, 4000, 4000)
    assert noam_lr(512, 2.0, 4000, 4000) > noam_lr(512, 2.0, 4000, 40000)
    assert scheduled_sampling_prob(4, 5, 5, 0.05, 0.25) == 0.0
    assert scheduled_sampling_prob(10, 5, 5, 0.05, 0.25) == 0.05
    assert scheduled_sampling_prob(100, 5, 5, 0.05, 0.25) == 0.25

    ps = PlateauScheduler(factor=0.5, patience=1, mode="max")
    assert ps.update(1.0) == 1.0
    assert ps.update(0.9) == 1.0   # 1 bad epoch tolerated
    assert ps.update(0.8) == 0.5   # decay


def test_sparsemax_grad(rng):
    """Finite-difference gradient check (the reference test_activations.py
    pattern, SURVEY.md §4)."""
    from unpaired_image_captioning_tpu.ops.attention_transforms import sparsemax

    z = jax.random.normal(rng, (6,)) * 0.5

    def f(z):
        return jnp.sum(sparsemax(z[None, :]) ** 2)

    g = jax.grad(f)(z)
    eps = 1e-4
    for i in range(6):
        zp = z.at[i].add(eps)
        zm = z.at[i].add(-eps)
        fd = (f(zp) - f(zm)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), atol=1e-2)


def test_metric_logger(tmp_path):
    from unpaired_image_captioning_tpu.train.logging import MetricLogger

    lg = MetricLogger(str(tmp_path))
    lg.add_scalars(1, {"loss": 2.0})
    lg.add_scalars(2, {"loss": 1.5, "acc": 0.3})
    import json

    lines = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    assert lines[0]["loss"] == 2.0 and lines[1]["step"] == 2


def test_vis_words(tmp_path):
    from unpaired_image_captioning_tpu.utils.vis_words import vis_words

    a = ["a cat on a mat", "a dog runs", "a cat sleeps"]
    b = ["the cat is here", "the bird flies"]
    p = vis_words(a, b, str(tmp_path / "vw.html"), label_a="gen",
                  label_b="refs")
    content = open(p).read()
    assert "<svg" in content and "cat" in content and "gen" in content


def test_bn_calibration(tmp_path):
    from unpaired_image_captioning_tpu import models
    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.data.dataloader import CaptionDataLoader
    from unpaired_image_captioning_tpu.data.synthetic import make_caption_artifacts
    from unpaired_image_captioning_tpu.models.att import calibrate_batch_norm
    from unpaired_image_captioning_tpu.models.base import Features

    jp, h5p, mem = make_caption_artifacts(str(tmp_path), vocab_size=20)
    loader = CaptionDataLoader(input_json=jp, input_label_h5=h5p,
                               batch_size=4, seq_per_img=1, att_feat_size=24,
                               attri_feat_size=16, in_memory=mem)
    cfg = Config(caption_model="topdown", vocab_size=20, rnn_size=16,
                 num_layers=1, input_encoding_size=12, att_hid_size=8,
                 fc_feat_size=32, att_feat_size=24, seq_length=6,
                 drop_prob_lm=0.0, use_bn=2)
    model = models.setup(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = calibrate_batch_norm(params, loader, n_batches=4)
    assert float(jnp.abs(params["bn0"]["mean"]).sum()) > 0

    # eval output for one example must not depend on batch composition
    data = loader.get_batch("val")
    f_all = Features(fc_feats=jnp.asarray(data["fc_feats"]),
                     att_feats=jnp.asarray(data["att_feats"]),
                     att_masks=jnp.asarray(data["att_masks"]))
    f_one = Features(fc_feats=jnp.asarray(data["fc_feats"][:1]),
                     att_feats=jnp.asarray(data["att_feats"][:1]),
                     att_masks=jnp.asarray(data["att_masks"][:1]))
    seq_all, _ = model.sample(params, f_all, jax.random.PRNGKey(1))
    seq_one, _ = model.sample(params, f_one, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(seq_all)[0], np.asarray(seq_one)[0])

    # multi-host sharding: stripes are disjoint and cover the train split
    l0 = CaptionDataLoader(input_json=jp, input_label_h5=h5p, batch_size=2,
                           seq_per_img=1, att_feat_size=24, attri_feat_size=16,
                           in_memory=mem, host_id=0, num_hosts=2)
    l1 = CaptionDataLoader(input_json=jp, input_label_h5=h5p, batch_size=2,
                           seq_per_img=1, att_feat_size=24, attri_feat_size=16,
                           in_memory=mem, host_id=1, num_hosts=2)
    s0, s1 = set(l0.split_ix["train"]), set(l1.split_ix["train"])
    assert not (s0 & s1)
    assert s0 | s1 == set(loader.split_ix["train"])
    assert l0.split_ix["val"] == loader.split_ix["val"]
