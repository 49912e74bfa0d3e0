"""Cross-framework parity: independent torch implementations of the
reference equations vs the JAX models after weight conversion — greedy
decode must be TOKEN-IDENTICAL (the SURVEY.md §7.2 step-2 milestone)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu import models
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.models.base import Features
from unpaired_image_captioning_tpu.models.convert import (convert_fc_model,
                                                          convert_topdown_model)

V, E, H, FC, ATT, AHID, T = 25, 12, 16, 20, 14, 10, 7
B, N = 3, 5


class TorchMaxoutCell(nn.Module):
    """The documented fused maxout cell (FCModel_NMT.py:14-52 equations)."""

    def __init__(self, in_dim, h):
        super().__init__()
        self.h = h
        self.i2h = nn.Linear(in_dim, 5 * h)
        self.h2h = nn.Linear(h, 5 * h)

    def forward(self, x, state):
        h0, c0 = state
        g = self.i2h(x) + self.h2h(h0)
        sig = torch.sigmoid(g[:, : 3 * self.h])
        i, f, o = sig.chunk(3, 1)
        m = torch.max(g[:, 3 * self.h: 4 * self.h], g[:, 4 * self.h:])
        c = f * c0 + i * m
        hh = o * torch.tanh(c)
        return hh, (hh, c)


class TorchFC(nn.Module):
    def __init__(self):
        super().__init__()
        self.img_embed = nn.Linear(FC, E)
        self.embed = nn.Embedding(V + 1, E)
        self.core = TorchMaxoutCell(E, H)
        self.logit = nn.Linear(H, V + 1)

    def greedy(self, fc, steps):
        b = fc.shape[0]
        state = (torch.zeros(b, H), torch.zeros(b, H))
        _, state = self.core(self.img_embed(fc), state)
        it = torch.zeros(b, dtype=torch.long)
        out = []
        for _ in range(steps):
            h, state = self.core(self.embed(it), state)
            lp = F.log_softmax(self.logit(h), dim=-1)
            it = lp.argmax(-1)
            out.append(it.clone())
        # apply the finished-mask semantics (tokens after EOS -> 0)
        seq = torch.stack(out, 1).numpy()
        for r in seq:
            stop = False
            for j in range(len(r)):
                if stop:
                    r[j] = 0
                elif r[j] == 0:
                    stop = True
        return seq


def test_fc_greedy_token_identity():
    torch.manual_seed(0)
    tm = TorchFC().eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_fc_model(state)

    cfg = Config(caption_model="fc", vocab_size=V, rnn_size=H, num_layers=1,
                 input_encoding_size=E, fc_feat_size=FC, seq_length=T,
                 drop_prob_lm=0.0)
    model = models.setup(cfg)
    fc = np.random.RandomState(0).randn(B, FC).astype(np.float32)
    feats = Features(fc_feats=jnp.asarray(fc))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))

    ref = tm.greedy(torch.from_numpy(fc), T)
    np.testing.assert_array_equal(np.asarray(seq), ref)


class TorchTopDown(nn.Module):
    """TopDownCore equations (AttModel.py:421-446) + AttModel embeddings."""

    def __init__(self):
        super().__init__()
        self.embed = nn.Sequential(nn.Embedding(V + 1, E), nn.ReLU())
        self.fc_embed = nn.Sequential(nn.Linear(FC, H), nn.ReLU())
        self.att_embed = nn.Sequential(nn.Linear(ATT, H), nn.ReLU())
        self.ctx2att = nn.Linear(H, AHID)
        self.logit = nn.Linear(H, V + 1)
        self.att_lstm = nn.LSTMCell(E + 2 * H, H)
        self.lang_lstm = nn.LSTMCell(2 * H, H)
        self.h2att = nn.Linear(H, AHID)
        self.alpha_net = nn.Linear(AHID, 1)

    def attention(self, h, att_emb, p_att, masks):
        dot = torch.tanh(p_att + self.h2att(h).unsqueeze(1))
        w = F.softmax(self.alpha_net(dot).squeeze(-1), dim=1)
        w = w * masks
        w = w / w.sum(1, keepdim=True)
        return torch.bmm(w.unsqueeze(1), att_emb).squeeze(1)

    def greedy(self, fc, att, masks, steps):
        b = fc.shape[0]
        fc_e = self.fc_embed(fc)
        att_e = self.att_embed(att)
        p_att = self.ctx2att(att_e)
        h1 = torch.zeros(b, H)
        c1 = torch.zeros(b, H)
        h2 = torch.zeros(b, H)
        c2 = torch.zeros(b, H)
        it = torch.zeros(b, dtype=torch.long)
        out = []
        for _ in range(steps):
            xt = self.embed(it)
            h1, c1 = self.att_lstm(torch.cat([h2, fc_e, xt], 1), (h1, c1))
            a = self.attention(h1, att_e, p_att, masks)
            h2, c2 = self.lang_lstm(torch.cat([a, h1], 1), (h2, c2))
            lp = F.log_softmax(self.logit(h2), dim=-1)
            it = lp.argmax(-1)
            out.append(it.clone())
        seq = torch.stack(out, 1).numpy()
        for r in seq:
            stop = False
            for j in range(len(r)):
                if stop:
                    r[j] = 0
                elif r[j] == 0:
                    stop = True
        return seq


def test_topdown_greedy_token_identity():
    torch.manual_seed(1)
    tm = TorchTopDown().eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # remap to the reference's state_dict names expected by the converter
    renamed = {}
    for k, v in state.items():
        k = (k.replace("embed.0.", "embed.0.")
             .replace("fc_embed.0.", "fc_embed.0.")
             .replace("att_embed.0.", "att_embed.0.")
             .replace("att_lstm.", "core.att_lstm.")
             .replace("lang_lstm.", "core.lang_lstm.")
             .replace("h2att.", "core.attention.h2att.")
             .replace("alpha_net.", "core.attention.alpha_net."))
        renamed[k] = v
    params = convert_topdown_model(renamed)

    cfg = Config(caption_model="topdown", vocab_size=V, rnn_size=H,
                 num_layers=1, input_encoding_size=E, fc_feat_size=FC,
                 att_feat_size=ATT, att_hid_size=AHID, seq_length=T,
                 drop_prob_lm=0.0)
    model = models.setup(cfg)
    rng = np.random.RandomState(1)
    fc = rng.randn(B, FC).astype(np.float32)
    att = rng.randn(B, N, ATT).astype(np.float32)
    masks = np.ones((B, N), np.float32)
    masks[0, 3:] = 0
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))

    ref = tm.greedy(torch.from_numpy(fc), torch.from_numpy(att),
                    torch.from_numpy(masks), T)
    np.testing.assert_array_equal(np.asarray(seq), ref)


def test_topdown_use_bn_conversion_token_identity():
    """use_bn=2 checkpoints: the converter maps the shifted att_embed layout
    (BN at 0, Linear at 1, trailing BN at 4 — AttModel.py:79-84) including
    the TRAINED running stats, and eval-mode greedy decode stays
    token-identical (VERDICT r1 weak #5)."""
    torch.manual_seed(2)

    class TorchTopDownBN(TorchTopDown):
        def __init__(self):
            super().__init__()
            self.att_embed = nn.Sequential(
                nn.BatchNorm1d(ATT), nn.Linear(ATT, H), nn.ReLU(),
                nn.Dropout(0.0), nn.BatchNorm1d(H))

        def greedy(self, fc, att, masks, steps):
            b, n, _ = att.shape
            fc_e = self.fc_embed(fc)
            att_e = self.att_embed(att.reshape(-1, ATT)).reshape(b, n, H)
            p_att = self.ctx2att(att_e)
            h1 = c1 = h2 = c2 = torch.zeros(b, H)
            it = torch.zeros(b, dtype=torch.long)
            out = []
            for _ in range(steps):
                xt = self.embed(it)
                h1, c1 = self.att_lstm(torch.cat([h2, fc_e, xt], 1), (h1, c1))
                a = self.attention(h1, att_e, p_att, masks)
                h2, c2 = self.lang_lstm(torch.cat([a, h1], 1), (h2, c2))
                it = F.log_softmax(self.logit(h2), dim=-1).argmax(-1)
                out.append(it.clone())
            seq = torch.stack(out, 1).numpy()
            for r in seq:
                stop = False
                for j in range(len(r)):
                    if stop:
                        r[j] = 0
                    elif r[j] == 0:
                        stop = True
            return seq

    tm = TorchTopDownBN()
    # give the BNs nontrivial running stats via train-mode passes
    tm.train()
    gen = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for _ in range(4):
            tm.att_embed(torch.randn(64, ATT, generator=gen) * 2.0 + 1.0)
    tm = tm.eval()
    assert float(tm.att_embed[0].running_mean.abs().max()) > 0.1

    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    renamed = {}
    for k, v in state.items():
        k = (k.replace("att_lstm.", "core.att_lstm.")
             .replace("lang_lstm.", "core.lang_lstm.")
             .replace("h2att.", "core.attention.h2att.")
             .replace("alpha_net.", "core.attention.alpha_net."))
        renamed[k] = v
    params = convert_topdown_model(renamed)
    assert "bn0" in params and "bn1" in params
    np.testing.assert_allclose(np.asarray(params["bn0"]["mean"]),
                               tm.att_embed[0].running_mean.numpy())

    cfg = Config(caption_model="topdown", vocab_size=V, rnn_size=H,
                 num_layers=1, input_encoding_size=E, fc_feat_size=FC,
                 att_feat_size=ATT, att_hid_size=AHID, seq_length=T,
                 drop_prob_lm=0.0, use_bn=2)
    model = models.setup(cfg)
    rng = np.random.RandomState(4)
    fc = rng.randn(B, FC).astype(np.float32)
    att = rng.randn(B, N, ATT).astype(np.float32)
    masks = np.ones((B, N), np.float32)
    masks[0, 3:] = 0
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))
    ref = tm.greedy(torch.from_numpy(fc), torch.from_numpy(att),
                    torch.from_numpy(masks), T)
    np.testing.assert_array_equal(np.asarray(seq), ref)
