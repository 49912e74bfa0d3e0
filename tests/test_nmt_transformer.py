"""Transformer NMT + BPE + KLD distillation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu import constants as C
from unpaired_image_captioning_tpu.losses.criterion import nmt_loss
from unpaired_image_captioning_tpu.models.nmt_transformer import (
    TransformerNMTModel, make_nmt_model)

SRC_V, TGT_V = 31, 29
B, S, T = 4, 7, 6


def tiny_tnmt(**kw):
    base = dict(src_vocab_size=SRC_V, tgt_vocab_size=TGT_V, d_model=16,
                d_ff=32, num_layers=2, num_heads=4, max_decode_len=8)
    base.update(kw)
    return TransformerNMTModel(**base)


def make_batch(rng):
    k1, k2 = jax.random.split(rng)
    src = jax.random.randint(k1, (B, S), 4, SRC_V)
    lengths = jnp.array([S, S - 2, S - 1, 3])
    src = jnp.where(jnp.arange(S)[None] < lengths[:, None], src, C.PAD)
    tgt = jax.random.randint(k2, (B, T), 4, TGT_V)
    tgt = tgt.at[:, 0].set(C.BOS).at[:, -1].set(C.EOS)
    return src, lengths, tgt


def test_forward_and_loss_decreases(rng):
    import optax

    model = tiny_tnmt()
    params = model.init_params(rng)
    src, lengths, tgt = make_batch(rng)
    outs, _ = model.forward(params, src, lengths, tgt)
    assert outs.shape == (B, T - 1, 16)

    tx = optax.adam(3e-3)
    st = tx.init(params)

    @jax.jit
    def step(params, st):
        def loss_fn(p):
            outs, _ = model.forward(p, src, lengths, tgt)
            return nmt_loss(model.generator_logits(p, outs), tgt[:, 1:])[0]

        l, g = jax.value_and_grad(loss_fn)(params)
        up, st2 = tx.update(g, st)
        return optax.apply_updates(params, up), st2, l

    first = None
    for _ in range(20):
        params, st, l = step(params, st)
        first = first or float(l)
    assert float(l) < first * 0.9


def test_translate_batch(rng):
    model = tiny_tnmt()
    params = model.init_params(rng)
    src, lengths, _ = make_batch(rng)
    res = model.translate_batch(params, src, lengths, beam_size=3)
    assert res.seq.shape == (B, 3, 8)
    assert res.aux is not None and (np.asarray(res.aux) < S).all()


def test_translate_stack_kernel_token_identity(rng, monkeypatch):
    """Whole-stack fused decode kernel (want_attn variant) vs the XLA step
    path: beam tokens and the UNK attn-argmax trace must be IDENTICAL, and
    scores equal to float noise. Run in interpret mode so the Pallas
    program's math (incl. the DMA-streamed weight path and the last-layer
    attention output) is checked on CPU."""
    from unpaired_image_captioning_tpu.models import nmt_transformer as M

    model = tiny_tnmt(d_model=32, d_ff=48, num_heads=4)  # dh=8: kernel-legal
    params = model.init_params(rng)
    src, lengths, _ = make_batch(rng)
    ref = model.translate_batch(params, src, lengths, beam_size=3)
    monkeypatch.setattr(M, "_INTERPRET", True)
    assert M._use_stack_kernel(32, 4)
    got = model.translate_batch(params, src, lengths, beam_size=3)
    np.testing.assert_array_equal(np.asarray(got.seq), np.asarray(ref.seq))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.aux), np.asarray(ref.aux))


def test_shared_embeddings(rng):
    model = tiny_tnmt(share_decoder_embeddings=True)
    params = model.init_params(rng)
    assert "w" not in params["generator"]
    src, lengths, tgt = make_batch(rng)
    outs, _ = model.forward(params, src, lengths, tgt)
    logits = model.generator_logits(params, outs)
    assert logits.shape == (B, T - 1, TGT_V)


def test_factory():
    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.models.nmt import NMTModel

    cfg = Config(nmt_src_vocab_size=SRC_V, nmt_tgt_vocab_size=TGT_V,
                 word_vec_size=16, rnn_size=32, layers=1)
    assert isinstance(make_nmt_model(cfg), NMTModel)
    cfg.nmt_model_type = "transformer"
    assert isinstance(make_nmt_model(cfg), TransformerNMTModel)


def test_kld_distillation(tmp_path, rng):
    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.train.trainer import Trainer

    cfg = Config(caption_model="fc", vocab_size=0, nmt_train_flag=True,
                 nmt_kld_train_flag=True, nmt_src_vocab_size=SRC_V,
                 nmt_tgt_vocab_size=TGT_V, word_vec_size=16, rnn_size=24,
                 layers=1, nmt_optim="adam", nmt_learning_rate=1e-3,
                 checkpoint_path=str(tmp_path))
    teacher = Trainer(cfg).nmt_params
    tr = Trainer(cfg, nmt_teacher_params=teacher,
                 rng=jax.random.PRNGKey(5))
    src, lengths, tgt = make_batch(rng)
    data = {"nmt": {"src": np.asarray(src), "tgt": np.asarray(tgt),
                    "lengths": np.asarray(lengths)}}
    m = tr.train(data)
    assert "nmt_kld" in m and np.isfinite(m["nmt_kld"])


def test_bpe_roundtrip():
    from unpaired_image_captioning_tpu.utils.bpe import (BPE, learn_bpe,
                                                         load_codes,
                                                         save_codes)

    corpus = ["low lower lowest", "new newer newest", "low low new"] * 5
    merges = learn_bpe(corpus, num_merges=30, min_frequency=2)
    assert merges
    bpe = BPE(merges)
    seg = bpe.segment("lowest newest")
    assert BPE.decode(seg) == "lowest newest"
    # frequent whole words end up as single tokens
    assert bpe.segment("low") == "low"

    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "codes")
    save_codes(merges, path)
    assert load_codes(path) == merges
