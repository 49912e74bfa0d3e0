"""Cross-framework BEAM parity for the flagship caption family.

Torch transcriptions of the reference equations (DenseAttCore,
AttModel.py:489-526 + LSTMCore FCModel.py:26-42 + Attention
AttModel.py:529-558) driven by a host beam implementing the reference
CaptionModel.beam_search semantics (flat candidate sort with python
stability, UNK -1000 on the last vocab slot, dead-slot -1000 after EOS,
live beams recorded at the final step, finished ranked by total logprob —
CaptionModel.py:33-177) vs this framework's compiled [batch, beam] program
on CONVERTED weights. Sequences and scores must be token-identical at
beam 5 and under diverse groups (group_size=2, time-staggered, per-group
diversity penalty — CaptionModel.py:100-176). VERDICT r1 "Next" #3.
"""

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
from unpaired_image_captioning_tpu.models.convert import convert_stack_dense_model

V, E, H, FC, ATT, AHID, T = 23, 12, 16, 20, 14, 10, 7
B, N, K = 3, 5, 5


class TorchLSTMCore(nn.Module):
    """Maxout cell (FCModel.py:14-42), dropout off at eval."""

    def __init__(self, in_dim, h):
        super().__init__()
        self.h = h
        self.i2h = nn.Linear(in_dim, 5 * h)
        self.h2h = nn.Linear(h, 5 * h)

    def forward(self, x, h0, c0):
        g = self.i2h(x) + self.h2h(h0)
        i, f, o = torch.sigmoid(g[:, : 3 * self.h]).chunk(3, 1)
        m = torch.max(g[:, 3 * self.h: 4 * self.h], g[:, 4 * self.h:])
        c = f * c0 + i * m
        return o * torch.tanh(c), c


class TorchAttention(nn.Module):
    """Additive attention with masked renormalize (AttModel.py:529-558)."""

    def __init__(self):
        super().__init__()
        self.h2att = nn.Linear(H, AHID)
        self.alpha_net = nn.Linear(AHID, 1)

    def forward(self, h, att_e, p_att, masks):
        dot = torch.tanh(p_att + self.h2att(h).unsqueeze(1))
        w = F.softmax(self.alpha_net(dot).squeeze(-1), dim=1)
        if masks is not None:
            w = w * masks
            w = w / w.sum(1, keepdim=True)
        return torch.bmm(w.unsqueeze(1), att_e).squeeze(1)


class TorchDenseCore(nn.Module):
    def __init__(self):
        super().__init__()
        self.lstm0 = TorchLSTMCore(E + H, H)
        self.lstm1 = TorchLSTMCore(2 * H, H)
        self.lstm2 = TorchLSTMCore(2 * H, H)
        self.att1 = TorchAttention()
        self.att2 = TorchAttention()
        self.emb2 = nn.Linear(H, H)
        self.fusion1 = nn.Sequential(nn.Linear(2 * H, H), nn.ReLU())
        self.fusion2 = nn.Sequential(nn.Linear(3 * H, H), nn.ReLU())

    def forward(self, xt, fc_e, att_e, p_att, masks, state):
        h, c = state  # [b, 3, H] each
        h0, c0 = self.lstm0(torch.cat([xt, fc_e], 1), h[:, 0], c[:, 0])
        a1 = self.att1(h0, att_e, p_att, masks)
        h1, c1 = self.lstm1(torch.cat([h0, a1], 1), h[:, 1], c[:, 1])
        a2 = self.att2(h1 + self.emb2(a1), att_e, p_att, masks)
        h2, c2 = self.lstm2(
            torch.cat([self.fusion1(torch.cat([h0, h1], 1)), a2], 1),
            h[:, 2], c[:, 2])
        out = self.fusion2(torch.cat([h0, h1, h2], 1))
        return out, (torch.stack([h0, h1, h2], 1),
                     torch.stack([c0, c1, c2], 1))


class TorchDenseAtt(nn.Module):
    def __init__(self):
        super().__init__()
        self.embed = nn.Sequential(nn.Embedding(V + 1, E), nn.ReLU())
        self.fc_embed = nn.Sequential(nn.Linear(FC, H), nn.ReLU())
        self.att_embed = nn.Sequential(nn.Linear(ATT, H), nn.ReLU())
        self.ctx2att = nn.Linear(H, AHID)
        self.logit = nn.Linear(H, V + 1)
        self.core = TorchDenseCore()

    def prepare(self, fc, att, masks):
        fc_e = self.fc_embed(fc)
        att_e = self.att_embed(att)
        return fc_e, att_e, self.ctx2att(att_e), masks

    def step(self, it, ctx, state):
        fc_e, att_e, p_att, masks = ctx
        out, state = self.core(self.embed(it), fc_e, att_e, p_att, masks,
                               state)
        return F.log_softmax(self.logit(out), dim=-1), state


def _zero_state(b):
    return (torch.zeros(b, 3, H), torch.zeros(b, 3, H))


def host_beam(model, ctx_b, *, beam_size, seq_length, suppress_unk=True,
              zero_state=None):
    """Reference-semantics beam for ONE image (ctx_b tensors have batch 1).
    Mirrors tests/test_beam_search.py::naive_beam, stepping the torch model
    and forking its state by backpointer."""
    zero_state = zero_state or _zero_state
    beams = [{"seq": [], "sum": 0.0, "it": 0, "state": zero_state(1)}]
    finished = []
    with torch.no_grad():
        for t in range(seq_length):
            rows = beams if t > 0 else beams[:1]
            cands = []
            lps = []
            for qi, bm in enumerate(rows):
                lp, new_state = model.step(
                    torch.tensor([bm["it"]]), ctx_b, bm["state"])
                lp = lp[0].numpy().astype(np.float64).copy()
                if suppress_unk:
                    lp[V] -= 1000.0
                lps.append((lp, new_state))
                for w in range(V + 1):
                    cands.append((bm["sum"] + lp[w], qi, w, lp[w]))
            cands.sort(key=lambda cnd: -cnd[0])
            new_beams = []
            for score, qi, w, tok_lp in cands[:beam_size]:
                src = rows[qi]
                lp, new_state = lps[qi]
                nb = {"seq": src["seq"] + [w], "sum": src["sum"] + tok_lp,
                      "it": w, "state": new_state}
                if w == 0 or t == seq_length - 1:
                    finished.append({"seq": nb["seq"], "score": nb["sum"]})
                    nb["sum"] = -1000.0
                new_beams.append(nb)
            beams = new_beams
    finished.sort(key=lambda f: -f["score"])
    out = []
    for f in finished[:beam_size]:
        seq = f["seq"] + [0] * (seq_length - len(f["seq"]))
        out.append((seq, f["score"]))
    return out


def _rename_for_converter(state):
    # torch state_dict names -> the reference checkpoint names the
    # converter expects (att1/att2 live under core.*)
    return {k: v.detach().numpy() for k, v in state.items()}


@pytest.fixture(scope="module")
def dense_pair():
    torch.manual_seed(7)
    tm = TorchDenseAtt().eval()
    params = convert_stack_dense_model(_rename_for_converter(tm.state_dict()))
    cfg = Config(caption_model="denseatt", vocab_size=V, rnn_size=H,
                 num_layers=1, input_encoding_size=E, fc_feat_size=FC,
                 att_feat_size=ATT, att_hid_size=AHID, seq_length=T,
                 drop_prob_lm=0.0)
    model = models.setup(cfg)
    rng = np.random.RandomState(3)
    fc = rng.randn(B, FC).astype(np.float32)
    att = rng.randn(B, N, ATT).astype(np.float32)
    masks = np.ones((B, N), np.float32)
    masks[0, 3:] = 0
    return tm, model, params, fc, att, masks


def test_denseatt_greedy_token_identity(dense_pair):
    tm, model, params, fc, att, masks = dense_pair
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))
    seq = np.asarray(seq)

    ctx = tm.prepare(torch.from_numpy(fc), torch.from_numpy(att),
                     torch.from_numpy(masks))
    state = _zero_state(B)
    it = torch.zeros(B, dtype=torch.long)
    ref = []
    with torch.no_grad():
        for _ in range(T):
            lp, state = tm.step(it, ctx, state)
            it = lp.argmax(-1)
            ref.append(it.numpy().copy())
    ref = np.stack(ref, 1)
    for r in ref:  # tokens after first EOS -> 0
        stop = False
        for j in range(len(r)):
            if stop:
                r[j] = 0
            elif r[j] == 0:
                stop = True
    np.testing.assert_array_equal(seq, ref)


def test_denseatt_beam5_token_identity(dense_pair):
    tm, model, params, fc, att, masks = dense_pair
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    res = model.sample_beam(params, feats, beam_size=K)
    seqs = np.asarray(res.seq)
    scores = np.asarray(res.scores)

    for b in range(B):
        ctx = tm.prepare(torch.from_numpy(fc[b:b + 1]),
                         torch.from_numpy(att[b:b + 1]),
                         torch.from_numpy(masks[b:b + 1]))
        ref = host_beam(tm, ctx, beam_size=K, seq_length=T)
        for k, (ref_seq, ref_score) in enumerate(ref):
            np.testing.assert_array_equal(
                seqs[b, k], ref_seq,
                err_msg=f"b={b} k={k}: {seqs[b, k].tolist()} vs {ref_seq}")
            np.testing.assert_allclose(scores[b, k], ref_score, atol=1e-4)


def host_diverse_beam(model, ctx_b, *, beam_size, group_size, seq_length,
                      diversity_lambda, suppress_unk=True):
    """Staggered diverse groups over the torch stepper (CaptionModel.py:
    100-176 semantics; mirrors naive_diverse_beam in test_beam_search.py)."""
    bd = beam_size // group_size
    groups = [{"beams": [{"seq": [], "sum": 0.0, "it": 0,
                          "state": _zero_state(1)}], "done": []}
              for _ in range(group_size)]
    with torch.no_grad():
        for t in range(seq_length + group_size - 1):
            for g, grp in enumerate(groups):
                lt = t - g  # group g's local time
                if lt < 0 or lt >= seq_length:
                    continue
                rows = grp["beams"] if lt > 0 else grp["beams"][:1]
                # diversity penalty: previous groups' CURRENT tokens
                penalty = np.zeros(V + 1)
                for p in range(g):
                    for pb in groups[p]["beams"]:
                        if len(pb["seq"]) > lt:
                            penalty[pb["seq"][lt]] += 1.0
                cands = []
                lps = []
                for qi, bm in enumerate(rows):
                    lp, new_state = model.step(
                        torch.tensor([bm["it"]]), ctx_b, bm["state"])
                    lp = lp[0].numpy().astype(np.float64).copy()
                    if suppress_unk:
                        lp[V] -= 1000.0
                    aug = lp - diversity_lambda * penalty
                    lps.append((lp, new_state))
                    for w in range(V + 1):
                        # rank AND accumulate the augmented logprob
                        # (reference beam_logprobs_sum = v['p'])
                        cands.append((bm["sum"] + aug[w], qi, w, aug[w]))
                cands.sort(key=lambda cnd: -cnd[0])
                new_beams = []
                for _, qi, w, tok_lp in cands[:bd]:
                    src = rows[qi]
                    lp, new_state = lps[qi]
                    nb = {"seq": src["seq"] + [w],
                          "sum": src["sum"] + tok_lp, "it": w,
                          "state": new_state}
                    if w == 0 or lt == seq_length - 1:
                        grp["done"].append(
                            {"seq": nb["seq"], "score": nb["sum"]})
                        nb["sum"] = -1000.0
                    new_beams.append(nb)
                grp["beams"] = new_beams
    out = []
    for grp in groups:
        done = sorted(grp["done"], key=lambda f: -f["score"])[:bd]
        for f in done:
            seq = f["seq"] + [0] * (seq_length - len(f["seq"]))
            out.append((seq, f["score"]))
    return out


def test_denseatt_diverse_beam_token_identity(dense_pair):
    tm, model, params, fc, att, masks = dense_pair
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    res = model.sample_beam(params, feats, beam_size=4, group_size=2,
                            diversity_lambda=0.7)
    seqs = np.asarray(res.seq)
    scores = np.asarray(res.scores)

    for b in range(B):
        ctx = tm.prepare(torch.from_numpy(fc[b:b + 1]),
                         torch.from_numpy(att[b:b + 1]),
                         torch.from_numpy(masks[b:b + 1]))
        ref = host_diverse_beam(tm, ctx, beam_size=4, group_size=2,
                                seq_length=T, diversity_lambda=0.7)
        for k, (ref_seq, ref_score) in enumerate(ref):
            np.testing.assert_array_equal(
                seqs[b, k], ref_seq,
                err_msg=f"b={b} k={k}: {seqs[b, k].tolist()} vs {ref_seq}")
            np.testing.assert_allclose(scores[b, k], ref_score, atol=1e-4)


# ---------------------------------------------------------------------------
# NMT beam-15: torch BiLSTM + input-feed decoder + onmt Beam semantics
# ---------------------------------------------------------------------------

SV, TV, NE, NH = 20, 18, 10, 12  # src/tgt vocab, word vec, rnn size
PAD, BOS, EOS = 0, 2, 3


class TorchNMT(nn.Module):
    """Reference NMT equations (NMT_Models.py:27-271): BiLSTM encoder with
    _fix_enc_hidden direction concat, input-feed single-layer StackedLSTM
    decoder, Luong dotprod GlobalAttention (GlobalAttention.py:112-167),
    generator Linear+log_softmax. Module names chosen so state_dict matches
    the reference checkpoint layout convert_nmt_model expects."""

    class _Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.embeddings = nn.Module()
            self.embeddings.word_lut = nn.Embedding(SV, NE, padding_idx=PAD)
            self.rnn = nn.LSTM(NE, NH // 2, num_layers=1, bidirectional=True)

    class _Attn(nn.Module):
        def __init__(self):
            super().__init__()
            self.linear_in = nn.Linear(NH, NH, bias=False)
            self.linear_out = nn.Linear(2 * NH, NH, bias=False)

    class _Dec(nn.Module):
        def __init__(self):
            super().__init__()
            self.embeddings = nn.Module()
            self.embeddings.word_lut = nn.Embedding(TV, NE, padding_idx=PAD)
            self.rnn = nn.Module()
            self.rnn.layers = nn.ModuleList([nn.LSTMCell(NE + NH, NH)])
            self.attn = TorchNMT._Attn()

    def __init__(self):
        super().__init__()
        self.encoder = self._Enc()
        self.decoder = self._Dec()
        self.generator = nn.Sequential(nn.Linear(NH, TV))

    def encode(self, src):
        """src [s] unpadded -> (context [s, NH], (h [1,NH], c [1,NH]))."""
        emb = self.encoder.embeddings.word_lut(src).unsqueeze(1)  # [s,1,E]
        out, (h, c) = self.encoder.rnn(emb)
        # _fix_enc_hidden (NMT_Models.py:284-287): interleaved directions
        fix = lambda x: torch.cat([x[0::2], x[1::2]], 2)
        return out.squeeze(1), (fix(h).squeeze(0), fix(c).squeeze(0))

    def step(self, it, context, state):
        """One input-feed decode step for K beams over one sentence."""
        h, c, feed = state
        emb = self.decoder.embeddings.word_lut(it)
        x = torch.cat([emb, feed], 1)
        h, c = self.decoder.rnn.layers[0](x, (h, c))
        q = self.decoder.attn.linear_in(h)                 # [K, H]
        scores = q @ context.t()                           # [K, s]
        attn = F.softmax(scores, dim=1)
        weighted = attn @ context                          # [K, H]
        out = torch.tanh(self.decoder.attn.linear_out(
            torch.cat([weighted, h], 1)))
        lp = F.log_softmax(self.generator(out), dim=-1)
        return lp, attn, (h, c, out)


def onmt_host_translate(tm, src, K, max_len):
    """onmt/Beam.py:50-117 exactly: flat top-k, EOS rows keep extending,
    stop when EOS tops the beam, hyps via backtrace."""
    with torch.no_grad():
        context, (h0, c0) = tm.encode(src)
        scores = torch.zeros(K)
        prevKs = []
        nextYs = [torch.full((K,), PAD, dtype=torch.long)]
        nextYs[0][0] = BOS
        attns = []
        h = h0.repeat(K, 1)
        c = c0.repeat(K, 1)
        feed = torch.zeros(K, NH)
        t = 0
        while t < max_len:
            lp, attn, (h, c, feed) = tm.step(nextYs[-1], context, (h, c, feed))
            beamLk = lp[0] if t == 0 else lp + scores.unsqueeze(1)
            best, ids = beamLk.reshape(-1).topk(K)
            prevK = (ids // TV) if t > 0 else torch.zeros(K, dtype=torch.long)
            tok = ids - prevK * TV
            scores = best
            prevKs.append(prevK)
            nextYs.append(tok)
            attns.append(attn[prevK])
            h, c, feed = h[prevK], c[prevK], feed[prevK]
            t += 1
            if tok[0] == EOS:
                break
        hyps = []
        for k0 in range(K):
            k = k0
            hyp, at = [], []
            for j in range(len(prevKs) - 1, -1, -1):
                hyp.append(int(nextYs[j + 1][k]))
                at.append(attns[j][k])
                k = int(prevKs[j][k])
            hyps.append((hyp[::-1], float(scores[k0]),
                         [int(a.argmax()) for a in at[::-1]]))
        return hyps, t


def test_nmt_beam15_token_identity():
    from unpaired_image_captioning_tpu.models.convert import convert_nmt_model
    from unpaired_image_captioning_tpu.models.nmt import NMTModel

    torch.manual_seed(11)
    tm = TorchNMT().eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_nmt_model(state, layers=1, brnn=True)
    model = NMTModel(src_vocab_size=SV, tgt_vocab_size=TV, word_vec_size=NE,
                     rnn_size=NH, layers=1, dropout=0.0)

    rng = np.random.RandomState(5)
    Bn, S, K, MAXL = 3, 6, 15, 8
    lens = np.array([6, 4, 5], np.int32)
    src = np.zeros((Bn, S), np.int32)
    for i, ln in enumerate(lens):
        src[i, :ln] = rng.randint(4, SV, size=ln)

    res = model.translate_batch(params, jnp.asarray(src), jnp.asarray(lens),
                                beam_size=K, max_len=MAXL)
    seqs = np.asarray(res.seq)
    scores = np.asarray(res.scores)
    aux = np.asarray(res.aux)

    for b in range(Bn):
        ref, t_stop = onmt_host_translate(
            tm, torch.from_numpy(src[b, :lens[b]].astype(np.int64)), K, MAXL)
        for k, (ref_hyp, ref_score, ref_attn) in enumerate(ref):
            got = seqs[b, k, :t_stop].tolist()
            np.testing.assert_array_equal(
                got, ref_hyp, err_msg=f"b={b} k={k}: {got} vs {ref_hyp}")
            np.testing.assert_allclose(scores[b, k], ref_score, atol=1e-4)
            # frozen tail stays PAD
            assert (seqs[b, k, t_stop:] == PAD).all()
            # attention argmax trace (UNK-replacement input) matches
            np.testing.assert_array_equal(aux[b, k, :t_stop].tolist(),
                                          ref_attn, err_msg=f"b={b} k={k}")


# ---------------------------------------------------------------------------
# Transformer: torch transcription of TransformerModel.py + beam parity
# ---------------------------------------------------------------------------

TD, TH, TFF, TL, TATT = 16, 4, 24, 2, 12  # d_model, heads, d_ff, layers, att


class TorchTLayerNorm(nn.Module):
    """a_2*(x-mean)/(std+eps)+b_2, UNBIASED std (TransformerModel.py:96-105)."""

    def __init__(self, d):
        super().__init__()
        self.a_2 = nn.Parameter(torch.ones(d))
        self.b_2 = nn.Parameter(torch.zeros(d))

    def forward(self, x):
        mean = x.mean(-1, keepdim=True)
        std = x.std(-1, keepdim=True)
        return self.a_2 * (x - mean) / (std + 1e-6) + self.b_2


class TorchMHA(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h = h
        self.d_k = d // h
        self.linears = nn.ModuleList([nn.Linear(d, d) for _ in range(4)])

    def forward(self, q, k, v, mask):
        b = q.size(0)
        qh, kh, vh = [l(x).view(b, -1, self.h, self.d_k).transpose(1, 2)
                      for l, x in zip(self.linears, (q, k, v))]
        scores = qh @ kh.transpose(-2, -1) / (self.d_k ** 0.5)
        if mask is not None:
            scores = scores.masked_fill(mask.unsqueeze(1) == 0, -1e9)
        attn = F.softmax(scores, dim=-1)
        out = (attn @ vh).transpose(1, 2).reshape(b, -1, self.h * self.d_k)
        return self.linears[3](out)


class TorchFFN(nn.Module):
    def __init__(self, d, dff):
        super().__init__()
        self.w_1 = nn.Linear(d, dff)
        self.w_2 = nn.Linear(dff, d)

    def forward(self, x):
        return self.w_2(F.relu(self.w_1(x)))


class _Sub(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.norm = TorchTLayerNorm(d)


class TorchTransCaption(nn.Module):
    """Reference TransformerModel assembly with matching state_dict names."""

    def __init__(self):
        super().__init__()
        d = TD
        self.att_embed = nn.Sequential(nn.Linear(TATT, d), nn.ReLU())
        self.model = nn.Module()
        enc = nn.Module()
        enc.layers = nn.ModuleList()
        for _ in range(TL):
            lay = nn.Module()
            lay.self_attn = TorchMHA(d, TH)
            lay.feed_forward = TorchFFN(d, TFF)
            lay.sublayer = nn.ModuleList([_Sub(d) for _ in range(2)])
            enc.layers.append(lay)
        enc.norm = TorchTLayerNorm(d)
        dec = nn.Module()
        dec.layers = nn.ModuleList()
        for _ in range(TL):
            lay = nn.Module()
            lay.self_attn = TorchMHA(d, TH)
            lay.src_attn = TorchMHA(d, TH)
            lay.feed_forward = TorchFFN(d, TFF)
            lay.sublayer = nn.ModuleList([_Sub(d) for _ in range(3)])
            dec.layers.append(lay)
        dec.norm = TorchTLayerNorm(d)
        self.model.encoder = enc
        self.model.decoder = dec
        tgt_embed = nn.Module()
        tgt_embed.lut = nn.Embedding(V + 1, d)
        self.model.tgt_embed = nn.ModuleList([tgt_embed])
        gen = nn.Module()
        gen.proj = nn.Linear(d, V + 1)
        self.model.generator = gen

    def encode(self, att, src_mask):
        x = self.att_embed(att)
        for lay in self.model.encoder.layers:
            y = lay.sublayer[0].norm(x)
            x = x + lay.self_attn(y, y, y, src_mask)
            y = lay.sublayer[1].norm(x)
            x = x + lay.feed_forward(y)
        return self.model.encoder.norm(x)

    def decode(self, memory, src_mask, ys):
        d = TD
        t = ys.size(1)
        x = self.model.tgt_embed[0].lut(ys) * (d ** 0.5)
        pe = torch.zeros(t, d)
        pos = torch.arange(t).float().unsqueeze(1)
        div = torch.exp(torch.arange(0, d, 2).float() * -(np.log(10000.0) / d))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        x = x + pe.unsqueeze(0)
        causal = torch.tril(torch.ones(t, t, dtype=torch.bool)).unsqueeze(0)
        for lay in self.model.decoder.layers:
            y = lay.sublayer[0].norm(x)
            x = x + lay.self_attn(y, y, y, causal)
            y = lay.sublayer[1].norm(x)
            x = x + lay.src_attn(y, memory, memory, src_mask)
            y = lay.sublayer[2].norm(x)
            x = x + lay.feed_forward(y)
        x = self.model.decoder.norm(x)
        return F.log_softmax(self.model.generator.proj(x), dim=-1)

    def prepare(self, att, masks):
        return (self.encode(att, masks.unsqueeze(-2)), masks.unsqueeze(-2))

    def step(self, it, ctx, state):
        """state = grown ys (TransformerModel.py:436-446)."""
        memory, src_mask = ctx
        ys = torch.cat([state, it.unsqueeze(1)], 1) if state is not None \
            else it.unsqueeze(1)
        lp = self.decode(memory, src_mask, ys)[:, -1]
        return lp, ys


@pytest.fixture(scope="module")
def trans_pair():
    from unpaired_image_captioning_tpu.models.convert import (
        convert_transformer_model)

    torch.manual_seed(13)
    tm = TorchTransCaption().eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_transformer_model(state, num_layers=TL)
    cfg = Config(caption_model="transformer", vocab_size=V, rnn_size=TFF,
                 num_layers=TL, input_encoding_size=TD, att_feat_size=TATT,
                 fc_feat_size=FC, seq_length=T, drop_prob_lm=0.0,
                 num_heads=TH)
    model = models.setup(cfg)
    rng = np.random.RandomState(9)
    att = rng.randn(B, N, TATT).astype(np.float32)
    masks = np.ones((B, N), np.float32)
    masks[1, 4:] = 0
    fc = rng.randn(B, FC).astype(np.float32)
    return tm, model, params, fc, att, masks


def test_transformer_greedy_token_identity(trans_pair):
    tm, model, params, fc, att, masks = trans_pair
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))
    seq = np.asarray(seq)

    with torch.no_grad():
        ctx = tm.prepare(torch.from_numpy(att), torch.from_numpy(masks))
        it = torch.zeros(B, dtype=torch.long)
        state = None
        ref = []
        for _ in range(T):
            lp, state = tm.step(it, ctx, state)
            it = lp.argmax(-1)
            ref.append(it.numpy().copy())
    ref = np.stack(ref, 1)
    for r in ref:
        stop = False
        for j in range(len(r)):
            if stop:
                r[j] = 0
            elif r[j] == 0:
                stop = True
    np.testing.assert_array_equal(seq, ref)


def test_transformer_beam5_token_identity(trans_pair):
    tm, model, params, fc, att, masks = trans_pair
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    res = model.sample_beam(params, feats, beam_size=K)
    seqs = np.asarray(res.seq)
    scores = np.asarray(res.scores)

    class _Stepper:
        def step(self, it, ctx, state):
            return tm.step(it, ctx, state)

    for b in range(B):
        with torch.no_grad():
            ctx = tm.prepare(torch.from_numpy(att[b:b + 1]),
                             torch.from_numpy(masks[b:b + 1]))
        st = _Stepper()
        # host_beam drives any stepper whose state forks by value; the
        # transformer's state is the grown ys tensor (beam fork == copy)
        beams = [{"seq": [], "sum": 0.0, "it": 0, "state": None}]
        finished = []
        with torch.no_grad():
            for t in range(T):
                rows = beams if t > 0 else beams[:1]
                cands, lps = [], []
                for qi, bm in enumerate(rows):
                    lp, new_state = st.step(torch.tensor([bm["it"]]), ctx,
                                            bm["state"])
                    lp = lp[0].numpy().astype(np.float64).copy()
                    lp[V] -= 1000.0
                    lps.append((lp, new_state))
                    for w in range(V + 1):
                        cands.append((bm["sum"] + lp[w], qi, w, lp[w]))
                cands.sort(key=lambda cnd: -cnd[0])
                new_beams = []
                for score, qi, w, tok_lp in cands[:K]:
                    src_bm = rows[qi]
                    _, new_state = lps[qi]
                    nb = {"seq": src_bm["seq"] + [w],
                          "sum": src_bm["sum"] + tok_lp, "it": w,
                          "state": new_state.clone()}
                    if w == 0 or t == T - 1:
                        finished.append({"seq": nb["seq"], "score": nb["sum"]})
                        nb["sum"] = -1000.0
                    new_beams.append(nb)
                beams = new_beams
        finished.sort(key=lambda f: -f["score"])
        for k, f in enumerate(finished[:K]):
            ref_seq = f["seq"] + [0] * (T - len(f["seq"]))
            np.testing.assert_array_equal(
                seqs[b, k], ref_seq,
                err_msg=f"b={b} k={k}: {seqs[b, k].tolist()} vs {ref_seq}")
            np.testing.assert_allclose(scores[b, k], f["score"], atol=1e-4)


# ---------------------------------------------------------------------------
# TopDown family (a 4th beam-parity family: 2-LSTM up-down core,
# AttModel.py:421-446, torch transcription shared with tests/test_convert.py)
# ---------------------------------------------------------------------------

class TorchTopDownBeam(nn.Module):
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

    def attention(self, h, att_e, p_att, masks):
        dot = torch.tanh(p_att + self.h2att(h).unsqueeze(1))
        w = F.softmax(self.alpha_net(dot).squeeze(-1), dim=1)
        w = w * masks
        w = w / w.sum(1, keepdim=True)
        return torch.bmm(w.unsqueeze(1), att_e).squeeze(1)

    def prepare(self, fc, att, masks):
        att_e = self.att_embed(att)
        return self.fc_embed(fc), att_e, self.ctx2att(att_e), masks

    def step(self, it, ctx, state):
        fc_e, att_e, p_att, masks = ctx
        h1, c1, h2, c2 = state
        xt = self.embed(it)
        h1, c1 = self.att_lstm(torch.cat([h2, fc_e, xt], 1), (h1, c1))
        a = self.attention(h1, att_e, p_att, masks)
        h2, c2 = self.lang_lstm(torch.cat([a, h1], 1), (h2, c2))
        return (F.log_softmax(self.logit(h2), dim=-1), (h1, c1, h2, c2))


def _topdown_zero_state(b):
    return tuple(torch.zeros(b, H) for _ in range(4))


def test_topdown_beam5_token_identity():
    from unpaired_image_captioning_tpu.models.convert import (
        convert_topdown_model)

    torch.manual_seed(11)
    tm = TorchTopDownBeam().eval()
    renamed = {}
    for k, v in tm.state_dict().items():
        k = (k.replace("att_lstm.", "core.att_lstm.")
             .replace("lang_lstm.", "core.lang_lstm.")
             .replace("h2att.", "core.attention.h2att.")
             .replace("alpha_net.", "core.attention.alpha_net."))
        renamed[k] = v.detach().numpy()
    params = convert_topdown_model(renamed)
    cfg = Config(caption_model="topdown", vocab_size=V, rnn_size=H,
                 num_layers=1, input_encoding_size=E, fc_feat_size=FC,
                 att_feat_size=ATT, att_hid_size=AHID, seq_length=T,
                 drop_prob_lm=0.0)
    model = models.setup(cfg)
    rng = np.random.RandomState(5)
    fc = rng.randn(B, FC).astype(np.float32)
    att = rng.randn(B, N, ATT).astype(np.float32)
    masks = np.ones((B, N), np.float32)
    masks[1, 2:] = 0
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    res = model.sample_beam(params, feats, beam_size=K)
    seqs = np.asarray(res.seq)
    scores = np.asarray(res.scores)

    for b in range(B):
        ctx = tm.prepare(torch.from_numpy(fc[b:b + 1]),
                         torch.from_numpy(att[b:b + 1]),
                         torch.from_numpy(masks[b:b + 1]))
        ref = host_beam(tm, ctx, beam_size=K, seq_length=T,
                        zero_state=_topdown_zero_state)
        for k, (ref_seq, ref_score) in enumerate(ref):
            np.testing.assert_array_equal(
                seqs[b, k], ref_seq,
                err_msg=f"b={b} k={k}: {seqs[b, k].tolist()} vs {ref_seq}")
            np.testing.assert_allclose(scores[b, k], ref_score, atol=1e-4)
