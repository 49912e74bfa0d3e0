"""NMT stack tests: encoder/decoder shapes, loss decrease, beam translate,
attention transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu import constants as C
from unpaired_image_captioning_tpu.losses.criterion import nmt_loss
from unpaired_image_captioning_tpu.models.nmt import NMTModel
from unpaired_image_captioning_tpu.ops import attention_transforms as at

SRC_V, TGT_V = 31, 29
B, S, T = 4, 7, 6


def tiny_nmt(**kw):
    base = dict(src_vocab_size=SRC_V, tgt_vocab_size=TGT_V,
                word_vec_size=16, rnn_size=24, layers=1, dropout=0.3,
                max_decode_len=8)
    base.update(kw)
    return NMTModel(**base)


def make_batch(rng):
    k1, k2 = jax.random.split(rng)
    src = jax.random.randint(k1, (B, S), 4, SRC_V)
    lengths = jnp.array([S, S - 2, S - 1, 3])
    pos = jnp.arange(S)[None, :]
    src = jnp.where(pos < lengths[:, None], src, C.PAD)
    tgt = jax.random.randint(k2, (B, T), 4, TGT_V)
    tgt = tgt.at[:, 0].set(C.BOS)
    tgt = tgt.at[:, -1].set(C.EOS)
    return src, lengths, tgt


def test_forward_shapes(rng):
    model = tiny_nmt()
    params = model.init_params(rng)
    src, lengths, tgt = make_batch(rng)
    outs, attns = model.forward(params, src, lengths, tgt)
    assert outs.shape == (B, T - 1, 24)
    assert attns.shape == (B, T - 1, S)
    logits = model.generator_logits(params, outs)
    loss, stats = nmt_loss(logits, tgt[:, 1:])
    assert np.isfinite(float(loss))
    assert float(stats.n_words) == float(jnp.sum(tgt[:, 1:] != C.PAD))


@pytest.mark.parametrize("kw", [
    dict(attention_type="mlp"),
    dict(attn_transform="sparsemax"),
    dict(attn_transform="constrained_softmax", fertility=2.0),
    dict(attn_transform="constrained_sparsemax", fertility=2.0),
    # learned per-word fertility bounds (fork Models.py:214-222,275-287)
    dict(attn_transform="constrained_softmax", predict_fertility=True),
    dict(context_gate="both"),
    dict(coverage_attn=True),
    # opt-in Tu et al. feedback (the reference inits linear_cover but never
    # feeds coverage into attention; see NMTDecoder.coverage_feed)
    dict(coverage_attn=True, coverage_feed=True),
    dict(brnn=False),
    dict(layers=2),
    dict(share_decoder_embeddings=True, word_vec_size=24),
    dict(position_encoding=True),
])
def test_variants_forward(rng, kw):
    model = tiny_nmt(**kw)
    params = model.init_params(rng)
    src, lengths, tgt = make_batch(rng)
    outs, _ = model.forward(params, src, lengths, tgt, training=True, rng=rng)
    assert np.isfinite(np.asarray(outs)).all()


def test_loss_decreases(rng):
    import optax

    model = tiny_nmt()
    params = model.init_params(rng)
    src, lengths, tgt = make_batch(rng)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            outs, _ = model.forward(p, src, lengths, tgt)
            logits = model.generator_logits(p, outs)
            loss, _ = nmt_loss(logits, tgt[:, 1:])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for _ in range(25):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.8


def test_translate_batch(rng):
    model = tiny_nmt()
    params = model.init_params(rng)
    src, lengths, _ = make_batch(rng)
    res = model.translate_batch(params, src, lengths, beam_size=3)
    assert res.seq.shape == (B, 3, 8)
    assert res.aux.shape == (B, 3, 8)
    seq = np.asarray(res.seq)
    # each finished hypothesis ends with EOS then PADs (or hit max_len)
    for b in range(B):
        row = seq[b, 0]
        if (row == C.EOS).any():
            e = int(np.argmax(row == C.EOS))
            assert (row[e + 1:] == C.PAD).all()
    # attention argmax points inside the source
    assert (np.asarray(res.aux) < S).all()


def test_sparsemax_properties(rng):
    z = jax.random.normal(rng, (5, 11)) * 3
    p = at.sparsemax(z)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, atol=1e-5)
    assert (np.asarray(p) >= 0).all()
    # sparsemax of a large one-hot logit is that one-hot
    z2 = jnp.zeros((1, 5)).at[0, 2].set(10.0)
    np.testing.assert_allclose(np.asarray(at.sparsemax(z2))[0, 2], 1.0, atol=1e-5)


def test_constrained_softmax_respects_bounds(rng):
    z = jax.random.normal(rng, (6, 9))
    u = jnp.full((6, 9), 0.2)
    p = at.constrained_softmax(z, upper_bounds=u)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, atol=1e-4)
    assert (np.asarray(p) <= 0.2 + 1e-5).all()


def test_constrained_sparsemax_respects_bounds(rng):
    z = jax.random.normal(rng, (6, 9)) * 2
    u = jnp.full((6, 9), 0.3)
    p = at.constrained_sparsemax(z, upper_bounds=u)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, atol=1e-4)
    assert (np.asarray(p) <= 0.3 + 1e-5).all()
    # with loose bounds it equals sparsemax
    loose = at.constrained_sparsemax(z, upper_bounds=jnp.full((6, 9), 10.0))
    np.testing.assert_allclose(np.asarray(loose), np.asarray(at.sparsemax(z)),
                               atol=1e-4)


def test_fertility_bound_sources(rng):
    """Upper-bound init sources for the constrained transforms (fork
    Models.py:455-470 max_word_coverage): predicted per-word fertility
    changes decode state vs the constant fill; a guided alignment table
    (utils/fertility.py) overrides both; all three translate."""
    from unpaired_image_captioning_tpu.utils.fertility import (
        alignment_fertilities, batch_fertilities)

    src, lengths, _ = make_batch(rng)

    base = tiny_nmt(attn_transform="constrained_softmax", fertility=2.0,
                    dropout=0.0)
    pred = tiny_nmt(attn_transform="constrained_softmax", fertility=2.0,
                    dropout=0.0, predict_fertility=True)
    p = pred.init_params(rng)

    # predicted head feeds init_state: bounds differ from the constant
    ctx, hid, fert = pred.encoder.apply(p["encoder"], src, lengths,
                                        with_fertility=True)
    st = pred.decoder.init_state(hid, ctx, upper_bounds_init=fert)
    assert st["upper_bounds"].shape == (B, S)
    assert not np.allclose(np.asarray(st["upper_bounds"][:, :-1]), 2.0)
    np.testing.assert_allclose(np.asarray(st["upper_bounds"][:, -1]), 100.0)
    assert (np.asarray(fert) > 1.0).all()  # 1 + exp(.) > 1

    res = pred.translate_batch(p, src, lengths, beam_size=3, max_len=6)
    assert np.asarray(res.seq).shape[:2] == (B, 3)

    # guided: per-word table lookup overrides prediction
    table = alignment_fertilities(["0-0 0-1 1-0"], [[4, 5]], SRC_V)
    fb = batch_fertilities(table, np.asarray(src))
    assert fb.shape == (B, S)
    res2 = pred.translate_batch(p, src, lengths, beam_size=3, max_len=6,
                                src_fertilities=jnp.asarray(fb))
    assert np.asarray(res2.seq).shape[:2] == (B, 3)

    # constant-fertility model ignores the extra head params
    pb = base.init_params(rng)
    out, _ = base.forward(pb, src, lengths,
                          jnp.full((B, 4), 4, jnp.int32).at[:, 0].set(C.BOS))
    assert np.isfinite(np.asarray(out)).all()


def test_truncated_decoder_gradient_semantics(rng):
    """Truncated BPTT (fork train.py:262-270): gradients must not flow
    across segment boundaries. With segment >= T the grads equal the
    untruncated model's; with segment 1 the recurrent weights' grads
    differ (cross-step flow removed) while staying finite."""
    src, lengths, tgt = make_batch(rng)

    def grads(model):
        p = tiny_nmt(dropout=0.0).init_params(jax.random.PRNGKey(5))

        def loss_fn(p):
            outs, _ = model.forward(p, src, lengths, tgt)
            loss, _ = nmt_loss(model.generator_logits(p, outs), tgt[:, 1:])
            return loss
        return jax.grad(loss_fn)(p)

    g_full = grads(tiny_nmt(dropout=0.0))
    g_same = grads(tiny_nmt(dropout=0.0, truncated_decoder=T))
    g_cut = grads(tiny_nmt(dropout=0.0, truncated_decoder=1))

    leaves_full = jax.tree.leaves(g_full)
    leaves_same = jax.tree.leaves(g_same)
    leaves_cut = jax.tree.leaves(g_cut)
    for a, b in zip(leaves_full, leaves_same):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves_cut)
    diff = sum(float(jnp.sum(jnp.abs(a - b)))
               for a, b in zip(leaves_full, leaves_cut))
    assert diff > 1e-3, "segment-1 truncation changed no gradient"


def test_pretrained_embedding_load(rng, tmp_path):
    """pre_word_vecs_enc/dec (fork train.py:442-443): word LUTs replaced
    from .npz/.npy artifacts, shape-checked."""
    model = tiny_nmt()
    params = model.init_params(rng)
    enc_t = np.random.RandomState(0).randn(SRC_V, 16).astype(np.float32)
    dec_t = np.random.RandomState(1).randn(TGT_V, 16).astype(np.float32)
    np.savez(tmp_path / "enc.npz", embedding=enc_t)
    np.save(tmp_path / "dec.npy", dec_t)
    params = model.load_pretrained_embeddings(
        params, enc_path=str(tmp_path / "enc.npz"),
        dec_path=str(tmp_path / "dec.npy"))
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["embeddings"]["word_lut"]), enc_t)
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["embeddings"]["word_lut"]), dec_t)
    with pytest.raises(AssertionError):
        model.load_pretrained_embeddings(
            params, enc_path=str(tmp_path / "dec.npy"))


def test_gold_scores_matches_nll(rng):
    """gold_scores == per-sentence -NLL under the same generator — the
    semantics the fork's `translate.py -tgt` ADVERTISES (GOLD SCORE /
    reportScore:74-77). The reference's own scoring cannot execute: the
    fork's block reads `upper_bounds` unbound (Translator.py:159) and the
    main repo leaves goldScores at zeros (NMT_Models.py:334-335), so this
    is pinned to the loss criterion instead of an exec'd source."""
    model = tiny_nmt(dropout=0.0)
    params = model.init_params(rng)
    k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
    src = jax.random.randint(k1, (B, S), 4, SRC_V)
    lengths = jnp.full((B,), S, jnp.int32)
    tgt = jax.random.randint(k2, (B, T), 4, TGT_V)
    tgt = tgt.at[:, 0].set(C.BOS).at[:, -1].set(C.EOS)
    tgt = tgt.at[3, 3:].set(C.PAD)  # ragged gold row

    gs = np.asarray(model.gold_scores(params, src, lengths, tgt))
    assert gs.shape == (B,)

    outs, _ = model.forward(params, src, lengths, tgt)
    logits = model.generator_logits(params, outs)
    _, stats = nmt_loss(logits, tgt[:, 1:])
    np.testing.assert_allclose(gs.sum(), -float(stats.loss), rtol=1e-5)

    # vectorization: each row equals its own single-sentence score
    for b in range(B):
        one = np.asarray(model.gold_scores(
            params, src[b:b + 1], lengths[b:b + 1], tgt[b:b + 1]))
        np.testing.assert_allclose(gs[b], one[0], rtol=1e-5, atol=1e-5)


def test_translate_cli_tgt_gold_report(tmp_path, capsys):
    """translate CLI -tgt route: per-run GOLD AVG SCORE / GOLD PPL printed
    from gold_scores (fork translate.py:134-136,180 + reportScore)."""
    import json
    import os

    from unpaired_image_captioning_tpu.cli import translate as translate_cli
    from unpaired_image_captioning_tpu.train.checkpoint import (save_json,
                                                                save_pytree)
    from unpaired_image_captioning_tpu.vocab import Dict

    model = tiny_nmt(dropout=0.0)
    params = model.init_params(jax.random.PRNGKey(3))
    run = tmp_path / "run"
    os.makedirs(run)
    import dataclasses

    save_json(str(run / "nmt_config.json"),
              {"model_type": "rnn", **dataclasses.asdict(model)})
    save_pytree(str(run / "model_nmt.msgpack"), params)
    sd = Dict([C.PAD_WORD, C.UNK_WORD, C.BOS_WORD, C.EOS_WORD])
    td = Dict([C.PAD_WORD, C.UNK_WORD, C.BOS_WORD, C.EOS_WORD])
    for i in range(4, SRC_V):
        sd.add(f"w{i}")
    for i in range(4, TGT_V):
        td.add(f"t{i}")
    with open(run / "src_dict.json", "w") as f:
        json.dump(sd.state_dict(), f)
    with open(run / "tgt_dict.json", "w") as f:
        json.dump(td.state_dict(), f)

    (tmp_path / "in.src").write_text("w4 w5 w6\nw7 w8\n", encoding="utf-8")
    (tmp_path / "in.tgt").write_text("t4 t5\nt6 t7 t8\n", encoding="utf-8")
    out = tmp_path / "pred.txt"
    translate_cli.main(["-model", str(run), "-src", str(tmp_path / "in.src"),
                        "-tgt", str(tmp_path / "in.tgt"),
                        "-output", str(out), "-beam_size", "2",
                        "-max_sent_length", "8"])
    printed = capsys.readouterr().out
    assert "PRED AVG SCORE:" in printed and "GOLD AVG SCORE:" in printed
    assert out.exists()

    # the reported gold average reproduces gold_scores on the same ids
    src = np.zeros((2, 3), np.int32)
    src[0] = [sd.lookup("w4"), sd.lookup("w5"), sd.lookup("w6")]
    src[1, :2] = [sd.lookup("w7"), sd.lookup("w8")]
    lengths = np.array([3, 2], np.int32)
    tgt = np.zeros((2, 5), np.int32)
    tgt[0, :4] = [C.BOS, td.lookup("t4"), td.lookup("t5"), C.EOS]
    tgt[1] = [C.BOS, td.lookup("t6"), td.lookup("t7"), td.lookup("t8"), C.EOS]
    gs = np.asarray(model.gold_scores(params, jnp.asarray(src),
                                      jnp.asarray(lengths), jnp.asarray(tgt)))
    want = gs.sum() / 5.0  # 5 gold words
    got = float(printed.split("GOLD AVG SCORE: ")[1].split(",")[0])
    np.testing.assert_allclose(got, want, atol=5e-4)
