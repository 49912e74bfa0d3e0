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
        assert set(("cross", "src_mask", "wpack", "wstack")) <= set(
            model.beam_ctx_no_expand)
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


def test_step_per_row_positions(rng):
    """Rows of one batch may sit at DIFFERENT decode positions (diverse beam
    groups are time-staggered): stepping a combined state whose rows carry
    t=[2,1] must equal stepping each row separately (ADVICE r1 — the old
    code read row 0's t for every row)."""
    cfg = Config(caption_model="transformer", vocab_size=V, rnn_size=32,
                 num_layers=2, input_encoding_size=16, att_hid_size=16,
                 fc_feat_size=10, att_feat_size=12, seq_length=T,
                 drop_prob_lm=0.0, num_heads=4)
    model = models.setup(cfg)
    params = model.init_params(rng)
    ks = jax.random.split(rng, 3)
    feats = Features(
        fc_feats=jax.random.normal(ks[0], (2, 10)),
        att_feats=jax.random.normal(ks[1], (2, N, 12)),
        att_masks=jnp.ones((2, N)))
    ctx, state = model.make_decoder(params, feats, training=False)

    def row(tree, i):
        return jax.tree.map(lambda x: x[i:i + 1], tree)

    # advance row 0 two steps, row 1 one step (different token histories)
    c0, s0 = row(ctx, 0), row(state, 0)
    for tok in (3, 5):
        _, s0 = model.step(params, c0, s0, jnp.asarray([tok]), training=False)
    c1, s1 = row(ctx, 1), row(state, 1)
    _, s1 = model.step(params, c1, s1, jnp.asarray([7]), training=False)

    combined = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), s0, s1)
    assert np.asarray(combined["t"]).tolist() == [2, 1]
    lp_comb, _ = model.step(params, ctx, combined, jnp.asarray([9, 11]),
                            training=False)
    lp0, _ = model.step(params, c0, s0, jnp.asarray([9]), training=False)
    lp1, _ = model.step(params, c1, s1, jnp.asarray([11]), training=False)
    np.testing.assert_allclose(np.asarray(lp_comb[0]), np.asarray(lp0[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp_comb[1]), np.asarray(lp1[0]),
                               atol=1e-5)


def test_layer_kernel_matches_xla_step(rng):
    """The fused decoder-layer Pallas kernel (ops/transformer_decode.py,
    interpret mode here) reproduces the XLA step path — logprobs AND
    per-layer K/V caches — over sequential steps and under diverse-beam
    time-staggered per-row positions, for kb=1 (greedy) and kb=2 (shared
    beam memory)."""
    import math

    from unpaired_image_captioning_tpu.models.transformer import (
        layer_norm, linear, positional_encoding)
    from unpaired_image_captioning_tpu.ops.transformer_decode import (
        decoder_layer_step, pack_layer_weights)

    cfg = Config(caption_model="transformer", vocab_size=V, rnn_size=32,
                 num_layers=2, input_encoding_size=16, att_hid_size=16,
                 fc_feat_size=10, att_feat_size=12, seq_length=T,
                 drop_prob_lm=0.0, num_heads=4)
    model = models.setup(cfg)
    params = model.init_params(rng)
    ks = jax.random.split(rng, 4)
    feats = Features(
        fc_feats=jax.random.normal(ks[0], (B, 10)),
        att_feats=jax.random.normal(ks[1], (B, N, 12)),
        att_masks=jnp.ones((B, N)).at[0, 3:].set(0.0))
    wpacks = [pack_layer_weights(lp) for lp in params["dec"]]
    d = model.d_model

    def kernel_step(ctx, state, it):
        t = state["t"]
        x = params["tgt_embed"][it] * math.sqrt(d)
        x = x + positional_encoding(T, d)[t].astype(x.dtype)
        new_state = {"t": t + 1}
        for li in range(model.num_layers):
            x, k_li, v_li = decoder_layer_step(
                x, t, ctx["cross"][li]["k"], ctx["cross"][li]["v"],
                ctx["src_mask"], state[f"k{li}"], state[f"v{li}"],
                wpacks[li], n_heads=model.num_heads, interpret=True)
            new_state[f"k{li}"] = k_li
            new_state[f"v{li}"] = v_li
        x = layer_norm(params["dec_norm"], x[:, None, :])[:, 0]
        logits = linear(params["generator"], x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), new_state

    for kb in (1, 2):
        ctx, st_x = model.make_decoder(params, feats)
        rows = B * kb
        if kb > 1:  # beam-expanded rows over shared [B] cross memory
            st_x = jax.tree.map(
                lambda a: jnp.repeat(a, kb, axis=0), st_x)
        st_k = {"t": st_x["t"]}
        for li in range(model.num_layers):
            st_k[f"k{li}"] = st_x["k"][:, li]
            st_k[f"v{li}"] = st_x["v"][:, li]

        its = jax.random.randint(ks[2], (3, rows), 1, V)
        for step_i in range(3):
            it = its[step_i]
            lp_x, st_x = model.step(params, ctx, st_x, it)
            lp_k, st_k = kernel_step(ctx, st_k, it)
            np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_x),
                                       rtol=2e-5, atol=2e-5)
            for li in range(model.num_layers):
                np.testing.assert_allclose(np.asarray(st_k[f"k{li}"]),
                                           np.asarray(st_x["k"][:, li]),
                                           rtol=2e-5, atol=2e-5)
                np.testing.assert_allclose(np.asarray(st_k[f"v{li}"]),
                                           np.asarray(st_x["v"][:, li]),
                                           rtol=2e-5, atol=2e-5)

    # staggered per-row positions (diverse-beam groups)
    ctx, st_x = model.make_decoder(params, feats)
    stag = jnp.asarray([0, 1, 2], jnp.int32)
    st_x = dict(st_x, t=stag)
    st_k = {"t": stag, **{f"k{li}": st_x["k"][:, li]
                          for li in range(model.num_layers)},
            **{f"v{li}": st_x["v"][:, li]
               for li in range(model.num_layers)}}
    it = jnp.asarray([3, 4, 5], jnp.int32)
    lp_x, _ = model.step(params, ctx, st_x, it)
    lp_k, _ = kernel_step(ctx, st_k, it)
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_x),
                               rtol=2e-5, atol=2e-5)


def test_stack_kernel_matches_xla_step(rng):
    """The whole-stack Pallas kernel (decoder_stack_step: all L fused layers
    in one grid-(L, B/bi) program, weights DMA'd per layer, x carried in the
    output buffer) reproduces the XLA step path — logprobs AND the stacked
    [R, L, T, d] K/V caches — over sequential steps, for kb=1 and kb=2, and
    under diverse-beam time-staggered per-row positions."""
    import math

    from unpaired_image_captioning_tpu.models.transformer import (
        layer_norm, linear, positional_encoding)
    from unpaired_image_captioning_tpu.ops.transformer_decode import (
        decoder_stack_step, pack_stack_weights)

    cfg = Config(caption_model="transformer", vocab_size=V, rnn_size=32,
                 num_layers=3, input_encoding_size=16, att_hid_size=16,
                 fc_feat_size=10, att_feat_size=12, seq_length=T,
                 drop_prob_lm=0.0, num_heads=4)
    model = models.setup(cfg)
    params = model.init_params(rng)
    ks = jax.random.split(rng, 4)
    feats = Features(
        fc_feats=jax.random.normal(ks[0], (B, 10)),
        att_feats=jax.random.normal(ks[1], (B, N, 12)),
        att_masks=jnp.ones((B, N)).at[0, 3:].set(0.0))
    wstack = pack_stack_weights(params["dec"])
    d = model.d_model
    L = model.num_layers

    def stack_step(ctx, state, it):
        t = state["t"]
        x = params["tgt_embed"][it] * math.sqrt(d)
        x = x + positional_encoding(T, d)[t].astype(x.dtype)
        ck_all = jnp.stack([c["k"] for c in ctx["cross"]])
        cv_all = jnp.stack([c["v"] for c in ctx["cross"]])
        x, k_all, v_all = decoder_stack_step(
            x, t, ck_all, cv_all, ctx["src_mask"], state["k_all"],
            state["v_all"], wstack, n_heads=model.num_heads, interpret=True)
        new_state = {"t": t + 1, "k_all": k_all, "v_all": v_all}
        x = layer_norm(params["dec_norm"], x[:, None, :])[:, 0]
        logits = linear(params["generator"], x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), new_state

    for kb in (1, 2):
        ctx, st_x = model.make_decoder(params, feats)
        rows = B * kb
        if kb > 1:
            st_x = jax.tree.map(lambda a: jnp.repeat(a, kb, axis=0), st_x)
        st_s = {"t": st_x["t"], "k_all": st_x["k"], "v_all": st_x["v"]}

        its = jax.random.randint(ks[2], (3, rows), 1, V)
        for step_i in range(3):
            it = its[step_i]
            lp_x, st_x = model.step(params, ctx, st_x, it)
            lp_s, st_s = stack_step(ctx, st_s, it)
            np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_x),
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(np.asarray(st_s["k_all"]),
                                       np.asarray(st_x["k"]),
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(np.asarray(st_s["v_all"]),
                                       np.asarray(st_x["v"]),
                                       rtol=2e-5, atol=2e-5)

    # staggered per-row positions (diverse-beam groups)
    ctx, st_x = model.make_decoder(params, feats)
    stag = jnp.asarray([0, 1, 2], jnp.int32)
    st_x = dict(st_x, t=stag)
    st_s = {"t": stag, "k_all": st_x["k"], "v_all": st_x["v"]}
    it = jnp.asarray([3, 4, 5], jnp.int32)
    lp_x, _ = model.step(params, ctx, st_x, it)
    lp_s, _ = stack_step(ctx, st_s, it)
    np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_x),
                               rtol=2e-5, atol=2e-5)
