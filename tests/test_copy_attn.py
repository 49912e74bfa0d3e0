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


def test_copy_extended_dynamic_vocab(rng):
    """Extended-vocab CopyGenerator: distribution over [V + S] normalizes;
    out-of-vocab copy mass lands on first-occurrence slots (duplicates share
    one slot, OpenNMT src_map semantics); folding the extension back onto
    UNK recovers the collapsed distribution."""
    model = NMTModel(src_vocab_size=SRC_V, tgt_vocab_size=TGT_V,
                     word_vec_size=16, rnn_size=24, layers=1, copy_attn=True,
                     max_decode_len=8)
    params = model.init_params(rng)
    src, lengths, tgt = make_batch(rng)
    # force a duplicate source token and a pad
    src = src.at[:, 3].set(src[:, 1]).at[:, -1].set(C.PAD)
    outs, (attns, copy_attns) = model.forward(params, src, lengths, tgt)

    src2tgt = np.full((SRC_V,), C.UNK, np.int32)
    src2tgt[5:15] = np.arange(5, 15)
    src2tgt[C.PAD] = C.PAD  # Dict.align maps <blank> -> <blank>
    lp_ext = model.copy_generator_extended_logprobs(
        params, outs, copy_attns, src, jnp.asarray(src2tgt))
    assert lp_ext.shape == (B, T - 1, TGT_V + S)
    p_ext = np.exp(np.asarray(lp_ext))
    np.testing.assert_allclose(p_ext.sum(-1), 1.0, atol=1e-3)

    # duplicate source token: slot of position 3 must be empty (shares 1)
    first = np.asarray(model.src_first_occurrence(src))
    assert (first[:, 3] == 1).all() or (src2tgt[np.asarray(src)[:, 3]] != C.UNK).all()
    dup_oov = src2tgt[np.asarray(src)[:, 3]] == C.UNK
    assert (p_ext[dup_oov, :, TGT_V + 3] < 1e-12).all()
    # pad column gets no copy mass
    assert (p_ext[:, :, TGT_V + S - 1] < 1e-12).all()

    # folding extension onto UNK == collapsed copy_generator_logprobs
    lp_col = model.copy_generator_logprobs(params, outs, copy_attns, src,
                                           jnp.asarray(src2tgt))
    folded = p_ext[..., :TGT_V].copy()
    folded[..., C.UNK] += p_ext[..., TGT_V:].sum(-1)
    np.testing.assert_allclose(folded, np.exp(np.asarray(lp_col)),
                               atol=2e-3, rtol=1e-3)

    # forced-copy targets: UNK gold token with alignment -> extended id
    align = np.full((B, T - 1), -1, np.int32)
    tgt_shift = np.asarray(tgt)[:, 1:].copy()
    tgt_shift[:, 2] = C.UNK
    align[:, 2] = 3  # copies source position 3 (canonical slot: 1)
    ext_t = np.asarray(model.extended_copy_targets(
        jnp.asarray(tgt_shift), jnp.asarray(align), src))
    assert (ext_t[:, 2] == TGT_V + first[:, 3]).all()
    assert (ext_t[:, 0] == tgt_shift[:, 0]).all()

    # beam translate over the extended vocab + exact copy resolution
    res = model.translate_batch(params, src, lengths, beam_size=3,
                                src2tgt=jnp.asarray(src2tgt))
    tgt_seq, copy_pos = model.resolve_extended(res.seq)
    tgt_seq, copy_pos = np.asarray(tgt_seq), np.asarray(copy_pos)
    assert tgt_seq.max() < TGT_V
    assert ((copy_pos == -1) | (copy_pos < S)).all()
    assert (tgt_seq[copy_pos >= 0] == C.UNK).all()


def test_pivot_with_copy_attn(rng):
    """pivot_translate with a copy-attention NMT model: extended-vocab
    decode, collapsed en ids, exact copy positions folded into the
    replacement channel."""
    from unpaired_image_captioning_tpu import pivot
    from unpaired_image_captioning_tpu.models.fc import FCModel

    cap_V = 15
    cap = FCModel(vocab_size=cap_V, input_encoding_size=12, rnn_size=16,
                  num_layers=1, drop_prob_lm=0.0, seq_length=6,
                  fc_feat_size=10)
    cp = cap.init_params(rng)
    model = NMTModel(src_vocab_size=SRC_V, tgt_vocab_size=TGT_V,
                     word_vec_size=16, rnn_size=24, layers=1, copy_attn=True,
                     max_decode_len=8)
    np_ = model.init_params(jax.random.fold_in(rng, 1))
    cap2nmt = jnp.asarray(
        np.r_[0, np.random.default_rng(0).integers(4, SRC_V, cap_V + 1)[1:]],
        jnp.int32)
    src2tgt = np.full((SRC_V,), C.PAD, np.int32)
    src2tgt[5:15] = np.arange(5, 15)
    feats = jax.random.normal(jax.random.fold_in(rng, 2), (3, 10))
    from unpaired_image_captioning_tpu.models.base import Features
    zh, en, aux = pivot.pivot_translate(
        cap, cp, model, np_, Features(fc_feats=feats), cap2nmt,
        cap_beam=2, nmt_beam=3, nmt_max_len=8,
        src2tgt=jnp.asarray(src2tgt))
    en = np.asarray(en)
    assert en.max() < TGT_V  # extended ids collapsed
    assert np.asarray(aux).min() >= 0


def test_copy_fold_logprobs_values(rng):
    """copy_generator_fold_logprobs == a numpy re-derivation of the
    reference's decode-time scoring (CopyGenerator.py:36-48 +
    Translator.py:207-226): UNK/PAD logits -inf before softmax, copy mass
    folded onto align-mapped ids, PAD-aligned mass dropped, log of the
    sub-normalized result. (Exec parity vs the fork's own Translator:
    tests/test_ref_nmt_source_parity.py.)"""
    model = NMTModel(src_vocab_size=SRC_V, tgt_vocab_size=TGT_V,
                     word_vec_size=16, rnn_size=24, layers=1, copy_attn=True)
    params = model.init_params(rng)
    src, lengths, tgt = make_batch(jax.random.fold_in(rng, 1))
    outs, (attns, copy_attns) = model.forward(params, src, lengths, tgt)

    src2tgt = np.full((SRC_V,), C.PAD, np.int32)
    src2tgt[5:20] = (np.arange(5, 20) % (TGT_V - 4)) + 4

    lp = np.asarray(model.copy_generator_fold_logprobs(
        params, outs, copy_attns, src, jnp.asarray(src2tgt)))

    logits = np.asarray(model.generator_logits(params, outs), np.float64)
    logits[..., C.UNK] = -np.inf
    logits[..., C.PAD] = -np.inf
    p_vocab = np.exp(logits - logits.max(-1, keepdims=True))
    p_vocab /= p_vocab.sum(-1, keepdims=True)
    from unpaired_image_captioning_tpu.models.base import linear
    g = np.asarray(jax.nn.sigmoid(
        linear(params["copy_gate"], outs).astype(jnp.float32)), np.float64)
    out = (1.0 - g) * p_vocab
    a = np.asarray(copy_attns, np.float64)
    for b in range(B):
        for j in range(S):
            v = int(src2tgt[int(np.asarray(src)[b, j])])
            if v != C.PAD:
                out[b, :, v] += g[b, :, 0] * a[b, :, j]
    np.testing.assert_allclose(lp, np.log(np.maximum(out, 1e-20)),
                               atol=1e-4, rtol=1e-4)
    # sub-normalized: dropped unmapped copy mass keeps row sums <= 1
    assert (np.exp(lp).sum(-1) <= 1.0 + 1e-4).all()

    # fold-mode beam decode stays in the plain vocab and never emits the
    # masked UNK/PAD mid-hypothesis
    res = model.translate_batch(params, src, lengths, beam_size=3,
                                src2tgt=jnp.asarray(src2tgt),
                                copy_mode="fold")
    seq = np.asarray(res.seq)
    assert seq.max() < TGT_V
    live = np.cumprod(seq != C.EOS, axis=-1).astype(bool)  # pre-EOS slots
    assert (seq[live] != C.UNK).all() and (seq[live] != C.PAD).all()
