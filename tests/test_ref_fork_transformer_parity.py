"""Fork-transformer parity against the REFERENCE'S OWN sources (r4 Next #3).

The vendored OpenNMT fork's `-encoder_layer transformer -decoder_layer
transformer` option (onmt/modules/Transformer.py:1-110, MultiHeadedAttn.py:
9-88, onmt/Models.py:197-200,257-261,324-327,386-424) is a post-norm
architecture our production `models/nmt_transformer.py` deliberately does
NOT share (it is the modern pre-norm AIAYN). `models/fork_transformer.py`
is the fork-faithful twin; here the fork's own sources are exec'd (the same
sys.modules wiring as tests/test_ref_source_parity.py's NMT fixture) and

- the Encoder transformer branch's context,
- the Decoder transformer branch's outputs + last-layer attention
  (previous_input concat + output slicing included), and
- greedy decode token identity through the fork's own full-prefix re-run
  (TransformerDecoderState)

are pinned against converted state_dicts. torch-0.3 compat shims (no model
logic altered):
- `.cuda()` -> identity (monkeypatched; Embeddings.pe and the decoder's
  subsequent-mask buffer call it unconditionally);
- `if state.previous_input:` (Models.py:387,417) is multi-element tensor
  truthiness — illegal on modern torch AND on 0.3 once the prefix exceeds
  one token; pinned as `is not None` (the only reading under which the
  fork's own decode path runs at all);
- Variable -> tensor identity (as in the NMT fixture).
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu.models.convert import (
    convert_fork_transformer)
from unpaired_image_captioning_tpu.models.fork_transformer import (
    ForkTransformerNMT, fork_positional_encoding)

NFORK = Path("/root/reference/pivot_based_eccv2018/misc/OpenNMT-py-dalegebit/onmt")

pytestmark = pytest.mark.skipif(not NFORK.exists(),
                                reason="reference checkout not present")

SV, TV, D, L = 19, 17, 16, 2  # vocabs, d_model (heads=8 fixed), layers
BOS, EOS, PAD = 2, 3, 0


class _VariableMeta(type):
    def __instancecheck__(cls, obj):
        return isinstance(obj, torch.Tensor)


class _Variable(metaclass=_VariableMeta):
    def __new__(cls, data, volatile=False, requires_grad=False):
        return data


def _exec_shimmed(path, ns, strip=(), subs=()):
    src = Path(path).read_text()
    for s in strip:
        assert s in src, f"shim target {s!r} not found in {path}"
        src = src.replace(s, "")
    for old, new in subs:
        assert old in src, f"shim target {old!r} not found in {path}"
        src = src.replace(old, new)
    exec(compile(src, str(path), "exec"), ns)
    return ns


@pytest.fixture(autouse=True)
def _cpu_cuda_shim(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)


@pytest.fixture(scope="module")
def fork_ns():
    import torch.nn as nn

    names = ("onmt", "onmt.Constants", "onmt.modules", "onmt.modules.Util",
             "onmt.modules.activations", "onmt.modules.GlobalAttention",
             "onmt.modules.Gate", "evaluation")
    saved = {k: sys.modules.get(k) for k in names}
    # module construction needs .cuda() too (decoder subsequent-mask buffer,
    # Embeddings.pe) and the fixture monkeypatch is function-scoped
    saved_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        const_ns = _exec_shimmed(NFORK / "Constants.py", {})
        mod_const = types.ModuleType("onmt.Constants")
        mod_const.__dict__.update(const_ns)
        mod_onmt = types.ModuleType("onmt")
        mod_onmt.Constants = mod_const
        mod_modules = types.ModuleType("onmt.modules")
        mod_onmt.modules = mod_modules

        util_ns = _exec_shimmed(NFORK / "modules/Util.py", {})
        mod_util = types.ModuleType("onmt.modules.Util")
        mod_util.__dict__.update(util_ns)
        for k in ("aeq", "Bottle", "BottleLinear", "BottleLayerNorm",
                  "BottleSoftmax"):
            setattr(mod_modules, k, util_ns[k])

        mod_act = types.ModuleType("onmt.modules.activations")
        mod_act.Softmax = nn.Softmax
        for name in ("Sparsemax", "ConstrainedSoftmax",
                     "ConstrainedSparsemax"):
            setattr(mod_act, name, type(name, (nn.Module,), {}))

        sys.modules["onmt"] = mod_onmt
        sys.modules["onmt.Constants"] = mod_const
        sys.modules["onmt.modules"] = mod_modules
        sys.modules["onmt.modules.Util"] = mod_util
        sys.modules["onmt.modules.activations"] = mod_act

        ga_ns = _exec_shimmed(
            NFORK / "modules/GlobalAttention.py", {},
            strip=("from torch.autograd import Variable\n",))
        ga_ns["Variable"] = _Variable
        mod_modules.GlobalAttention = ga_ns["GlobalAttention"]
        mod_ga = types.ModuleType("onmt.modules.GlobalAttention")
        mod_ga.__dict__.update(ga_ns)
        sys.modules["onmt.modules.GlobalAttention"] = mod_ga

        srnn_ns = _exec_shimmed(NFORK / "modules/StackedRNN.py", {})
        mod_modules.StackedLSTM = srnn_ns["StackedLSTM"]
        mod_modules.StackedGRU = srnn_ns["StackedGRU"]

        gate_ns = _exec_shimmed(NFORK / "modules/Gate.py", {})
        mod_gate = types.ModuleType("onmt.modules.Gate")
        mod_gate.__dict__.update(gate_ns)
        sys.modules["onmt.modules.Gate"] = mod_gate

        mha_ns = _exec_shimmed(
            NFORK / "modules/MultiHeadedAttn.py", {},
            strip=("from torch.autograd import Variable\n",))
        mha_ns["Variable"] = _Variable
        mod_modules.MultiHeadedAttention = mha_ns["MultiHeadedAttention"]

        tf_ns = _exec_shimmed(NFORK / "modules/Transformer.py", {})
        mod_modules.TransformerEncoder = tf_ns["TransformerEncoder"]
        mod_modules.TransformerDecoder = tf_ns["TransformerDecoder"]

        sys.modules["evaluation"] = types.ModuleType("evaluation")

        models_ns = _exec_shimmed(
            NFORK / "Models.py", {},
            strip=("from torch.autograd import Variable\n",),
            subs=(("if state.previous_input:",
                   "if state.previous_input is not None:"),))
        models_ns["Variable"] = _Variable
        yield models_ns
    finally:
        torch.Tensor.cuda = saved_cuda
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


class _TinyDict:
    def __init__(self, n):
        self._n = n

    def size(self):
        return self._n


def _opt():
    return types.SimpleNamespace(
        layers=L, brnn=False, rnn_size=D, word_vec_size=D, dropout=0.0,
        rnn_type="LSTM", encoder_layer="transformer",
        decoder_layer="transformer", position_encoding=True,
        feature_vec_size=8, input_feed=0, coverage_attn=False,
        exhaustion_loss=False, supervised_fertility=None, fertility=2,
        predict_fertility=False, guided_fertility=None, context_gate=None,
        attention_type="dotprod", attn_transform="softmax", c_attn=0.0,
        copy_attn=False)


@pytest.fixture(scope="module")
def fork_pair(fork_ns):
    import torch.nn as nn

    torch.manual_seed(51)
    opt = _opt()
    enc = fork_ns["Encoder"](opt, _TinyDict(SV))
    dec = fork_ns["Decoder"](opt, _TinyDict(TV))
    gen = nn.Sequential(nn.Linear(D, TV), nn.LogSoftmax(dim=-1))
    with torch.no_grad():
        for p in list(enc.parameters()) + list(dec.parameters()):
            p.mul_(1.5)
        gen[0].bias[EOS] += 1.0  # terminate greedy decodes
    enc.eval(), dec.eval(), gen.eval()
    state = {}
    for prefix, m in (("encoder", enc), ("decoder", dec), ("generator", gen)):
        for k, v in m.state_dict().items():
            state[f"{prefix}.{k}"] = v.detach().numpy()
    params = convert_fork_transformer(state, num_layers=L)
    ours = ForkTransformerNMT(src_vocab_size=SV, tgt_vocab_size=TV,
                              d_model=D, d_inner=2048, num_layers=L,
                              num_heads=8, position_encoding=True)
    return fork_ns, enc, dec, gen, ours, params


def test_fork_positional_encoding_matches_source(fork_pair):
    """Models.py:128-134 per-index sin/cos table."""
    fork_ns, enc, *_ = fork_pair
    ref = enc.embeddings.make_positional_encodings(D, 12).numpy()[:, 0, :]
    np.testing.assert_allclose(np.asarray(fork_positional_encoding(12, D)),
                               ref, rtol=1e-5, atol=1e-6)


def _src(lens, seed=7):
    rng = np.random.RandomState(seed)
    b, s = len(lens), max(lens)
    ids = np.zeros((b, s), np.int64)
    for i, ln in enumerate(lens):
        ids[i, :ln] = rng.randint(4, SV, ln)
    return ids


def test_fork_encoder_context_vs_source(fork_pair):
    """Encoder transformer branch (Models.py:257-261): L post-norm layers
    over word_lut+pe embeddings, pad mask from the raw word ids."""
    _, enc, dec, gen, ours, params = fork_pair
    ids = _src([5, 3])
    src = torch.from_numpy(ids.T[:, :, None])            # len x batch x 1
    with torch.no_grad():
        _, context = enc(src)
    got = ours.encode(params, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got),
                               context.numpy().transpose(1, 0, 2),
                               rtol=2e-4, atol=2e-4)


def test_fork_decoder_outputs_and_attn_vs_source(fork_pair):
    """Decoder transformer branch (Models.py:406-424) incl. the
    previous_input concat + output/attn slicing on a second call."""
    fork_ns, enc, dec, gen, ours, params = fork_pair
    ids = _src([5, 4])
    tgt = np.zeros((2, 6), np.int64)
    tgt[:, 0] = BOS
    tgt[:, 1:] = np.random.RandomState(9).randint(4, TV, (2, 5))
    src = torch.from_numpy(ids.T[:, :, None])
    with torch.no_grad():
        _, context = enc(src)
        state = fork_ns["TransformerDecoderState"]()
        out_t, state, attns, _ub = dec(torch.from_numpy(tgt.T), src, context,
                                  state)
    got, attn = ours.decode(params, ours.encode(
        params, jnp.asarray(ids.astype(np.int32))),
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(tgt.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got),
                               out_t.numpy().transpose(1, 0, 2),
                               rtol=2e-4, atol=2e-4)
    # fork attns["std"]: last layer's post-softmax weights [B*h, T, S]
    ref_attn = attns["std"].numpy().reshape(2, 8, tgt.shape[1], ids.shape[1])
    np.testing.assert_allclose(np.asarray(attn), ref_attn,
                               rtol=2e-4, atol=2e-4)

    # incremental second call: previous_input concat, sliced outputs
    with torch.no_grad():
        nxt = torch.from_numpy(
            np.random.RandomState(11).randint(4, TV, (1, 2)))
        out2, state, attns2, _ub = dec(nxt, src, context, state)
    assert out2.shape[0] == 1  # only the NEW position comes back
    full = np.concatenate([tgt, nxt.numpy().T], axis=1)
    got2, _ = ours.decode(params, ours.encode(
        params, jnp.asarray(ids.astype(np.int32))),
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(full.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got2)[:, -1],
                               out2.numpy()[0], rtol=2e-4, atol=2e-4)


def test_fork_greedy_decode_token_identity(fork_pair):
    """Greedy decode through the fork's own full-prefix re-run
    (TransformerDecoderState previous_input accumulation) == our
    translate_greedy, token for token."""
    fork_ns, enc, dec, gen, ours, params = fork_pair
    for lens, seed in ([[6], 3], [[4], 13]):
        ids = _src(lens, seed=seed)
        src = torch.from_numpy(ids.T[:, :, None])
        with torch.no_grad():
            _, context = enc(src)
            state = fork_ns["TransformerDecoderState"]()
            it = torch.full((1, 1), BOS, dtype=torch.long)
            ref_toks = []
            for _ in range(12):
                out, state, _, _ub = dec(it, src, context, state)
                lp = gen(out[-1])
                nxt = int(lp.argmax(-1)[0])
                ref_toks.append(nxt)
                if nxt == EOS:
                    break
                it = torch.full((1, 1), nxt, dtype=torch.long)
        got = np.asarray(ours.translate_greedy(
            params, jnp.asarray(ids.astype(np.int32)), max_len=13))[0]
        n = len(ref_toks)
        np.testing.assert_array_equal(got[:n], ref_toks,
                                      err_msg=f"lens={lens}")
        assert (got[n:] == PAD).all()
