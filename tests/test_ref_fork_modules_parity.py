"""Fork-module VALUE parity against the vendored onmt package's own exec'd
sources (round 5): the attention-transform math that previous rounds pinned
only by properties / finite-difference checks.

- MatrixTree (onmt/modules/StructuredAttention.py): edge + root marginals
  of the matrix-tree structured attention vs ops.attention_transforms.
  matrix_tree_marginals (the reference stores root scores on the input
  diagonal and returns root marginals on the output diagonal).
- SparsemaxFunction forward/backward (onmt/modules/activations.py:76-110)
  vs ops.attention_transforms.sparsemax (+ its JAX gradient).
- constrained_softmax (activations.py:28-56, the numpy routine the
  autograd Function wraps) vs ops.attention_transforms.constrained_softmax.
- constrained_sparsemax (onmt/modules/constrained_sparsemax.py solver) vs
  ops.attention_transforms.constrained_sparsemax.

The onmt package loads through test_ref_nmt_source_parity's meta-path
shim (purely textual py2->py3 fixes + torch-0.3 device compat — no logic
changes). The old-style autograd Functions are invoked via their
forward/backward METHODS directly (modern torch refuses to __call__
legacy Functions; the methods themselves are untouched reference code).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_ref_nmt_source_parity import FORK, _OnmtFinder
from unpaired_image_captioning_tpu.ops import attention_transforms as at

pytestmark = pytest.mark.skipif(not FORK.exists(),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def onmt_modules():
    finder = _OnmtFinder()
    sys.meta_path.insert(0, finder)
    # onmt/Models.py:15 `import evaluation` (multi-bleu subprocess wrapper,
    # unused here) — stub, like test_ref_nmt_source_parity does
    saved_eval = sys.modules.get("evaluation")
    sys.modules["evaluation"] = types.ModuleType("evaluation")
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.ByteTensor = torch.ByteTensor
    try:
        import onmt.modules.activations as acts
        import onmt.modules.constrained_sparsemax as csp
        from onmt.modules.StructuredAttention import MatrixTree

        yield types.SimpleNamespace(acts=acts, csp=csp,
                                    MatrixTree=MatrixTree)
    finally:
        sys.meta_path.remove(finder)
        for k in [m for m in sys.modules
                  if m == "onmt" or m.startswith("onmt.")]:
            del sys.modules[k]
        if saved_eval is None:
            sys.modules.pop("evaluation", None)
        else:
            sys.modules["evaluation"] = saved_eval


def test_matrix_tree_marginals_vs_fork_source(onmt_modules):
    b, n = 3, 5
    rng = np.random.RandomState(0)
    scores = rng.randn(b, n, n).astype(np.float32)
    roots = rng.randn(b, n).astype(np.float32)
    ref_in = scores.copy()
    for i in range(b):
        np.fill_diagonal(ref_in[i], roots[i])
    with torch.no_grad():
        ref_out = onmt_modules.MatrixTree()(
            torch.from_numpy(ref_in)).numpy()
    marg, root_marg = at.matrix_tree_marginals(jnp.asarray(scores),
                                               jnp.asarray(roots))
    marg, root_marg = np.asarray(marg), np.asarray(root_marg)
    off = ~np.eye(n, dtype=bool)
    for i in range(b):
        np.testing.assert_allclose(marg[i][off], ref_out[i][off],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(root_marg[i], np.diag(ref_out[i]),
                                   rtol=1e-4, atol=1e-5)


class _Ctx:
    """Stand-in for the legacy autograd Function's self: modern torch no
    longer services save_for_backward/saved_tensors on a bare instance.
    The reference forward/backward METHODS run verbatim against this."""

    def save_for_backward(self, *tensors):
        self.saved_tensors = tensors


def test_sparsemax_forward_backward_vs_fork_source(onmt_modules):
    rng = np.random.RandomState(1)
    z = rng.randn(4, 9).astype(np.float64)
    F = onmt_modules.acts.SparsemaxFunction
    ctx = _Ctx()
    p_ref = F.forward(ctx, torch.from_numpy(z)).numpy()
    p_ours = np.asarray(at.sparsemax(jnp.asarray(z)))
    np.testing.assert_allclose(p_ours, p_ref, atol=1e-6)

    g = rng.randn(4, 9).astype(np.float64)
    dz_ref = F.backward(ctx, torch.from_numpy(g)).numpy()
    _, vjp = jax.vjp(at.sparsemax, jnp.asarray(z))
    (dz_ours,) = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(dz_ours), dz_ref, atol=1e-6)


def test_constrained_softmax_vs_fork_source(onmt_modules):
    rng = np.random.RandomState(2)
    z = rng.randn(6, 8).astype(np.float64)
    # valid bounds: nonnegative, sum >= 1 per row (the routine asserts it)
    u = (rng.rand(6, 8) + 0.2).astype(np.float64)
    p_ref = np.stack([onmt_modules.acts.constrained_softmax(
        z[i].copy(), u[i].copy())[0] for i in range(6)])
    p_ours = np.asarray(at.constrained_softmax(
        jnp.asarray(z), upper_bounds=jnp.asarray(u)))
    np.testing.assert_allclose(p_ours, p_ref, rtol=1e-5, atol=1e-6)


def test_constrained_sparsemax_vs_fork_source(onmt_modules):
    rng = np.random.RandomState(3)
    z = rng.randn(6, 8).astype(np.float64)
    u = (rng.rand(6, 8) + 0.2).astype(np.float64)
    refs = []
    for i in range(6):
        out = onmt_modules.csp.constrained_sparsemax(z[i].copy(),
                                                     u[i].copy())
        refs.append(np.asarray(out[0], dtype=np.float64))
    p_ref = np.stack(refs)
    p_ours = np.asarray(at.constrained_sparsemax(
        jnp.asarray(z), upper_bounds=jnp.asarray(u)))
    np.testing.assert_allclose(p_ours, p_ref, atol=1e-5)


def test_context_gates_vs_fork_source(onmt_modules):
    """All three ContextGate variants (onmt/modules/Gate.py) vs the gate
    math inside NMTDecoder.step (models/nmt.py) — weights converted from
    the reference module's state_dict."""
    import onmt.modules.Gate as gate_mod

    E_, H_ = 7, 11
    rng = np.random.RandomState(4)
    emb = rng.randn(5, E_).astype(np.float32)
    dec = rng.randn(5, H_).astype(np.float32)
    att = rng.randn(5, H_).astype(np.float32)

    for kind in ("source", "target", "both"):
        torch.manual_seed(97)
        ref = gate_mod.ContextGateFactory(kind, E_, H_, H_, H_).eval()
        st = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(emb), torch.from_numpy(dec),
                          torch.from_numpy(att)).numpy()

        def lin(prefix, x):
            w = jnp.asarray(st[prefix + ".weight"].T)
            b = jnp.asarray(st[prefix + ".bias"])
            return jnp.dot(jnp.asarray(x), w) + b

        # the same formulation NMTDecoder.step applies (models/nmt.py)
        zin = np.concatenate([emb, dec, att], axis=-1)
        z = jax.nn.sigmoid(lin("context_gate.gate", zin))
        src_p = lin("context_gate.source_proj", att)
        tgt_p = lin("context_gate.target_proj",
                    np.concatenate([emb, dec], -1))
        if kind == "source":
            ours = jnp.tanh(tgt_p + z * src_p)
        elif kind == "target":
            ours = jnp.tanh(z * tgt_p + src_p)
        else:
            ours = jnp.tanh((1.0 - z) * tgt_p + z * src_p)
        np.testing.assert_allclose(np.asarray(ours), out_ref, atol=1e-5,
                                   err_msg=kind)


def test_featured_encoder_vs_fork_source(onmt_modules):
    """`word￨feat` source features through the fork's OWN exec'd Encoder
    (onmt/Models.py:95-166 Embeddings with feature LUTs + BottleLinear+ReLU
    merge, :170-268 Encoder) vs our NMTEncoder with feature_sizes — context
    and (interleave-fixed) finals identity via converted weights."""
    import onmt.Models as M

    from test_ref_nmt_source_parity import _FakeDict, _opt
    from unpaired_image_captioning_tpu.models.convert import convert_nmt_model
    from unpaired_image_captioning_tpu.models.nmt import NMTEncoder

    SV, NE, NH, FV = 20, 10, 12, 6
    F1, F2 = 9, 7
    opt = _opt()
    opt.word_vec_size = NE
    opt.rnn_size = NH
    opt.feature_vec_size = FV
    torch.manual_seed(59)
    holder = torch.nn.Module()
    holder.encoder = M.Encoder(opt, _FakeDict(SV),
                               [_FakeDict(F1), _FakeDict(F2)])
    holder.decoder = M.Decoder(opt, _FakeDict(SV))  # converter needs both
    holder.eval()
    ref = holder.encoder

    state = {k: v.detach().numpy() for k, v in holder.state_dict().items()}
    params = convert_nmt_model(state, layers=1, brnn=True)
    ours = NMTEncoder(vocab_size=SV, word_vec_size=NE, rnn_size=NH, layers=1,
                      brnn=True, dropout=0.0, feature_sizes=(F1, F2),
                      feature_vec_size=FV)

    rng = np.random.RandomState(21)
    B, S = 4, 6
    words = rng.randint(4, SV, (B, S)).astype(np.int64)
    feats = np.stack([rng.randint(1, F1, (B, S)),
                      rng.randint(1, F2, (B, S))], axis=-1).astype(np.int64)

    inp = torch.from_numpy(
        np.concatenate([words[..., None], feats], axis=-1).transpose(1, 0, 2))
    with torch.no_grad():
        hidden_t, outputs, _ = ref(inp)
    ref_ctx = outputs.numpy().transpose(1, 0, 2)            # [B, S, rnn]
    # _fix_enc_hidden (NMT_Models.py:284-287): interleaved directions ->
    # concatenated per layer
    ref_h = np.concatenate([hidden_t[0].numpy()[0::2],
                            hidden_t[0].numpy()[1::2]], axis=-1)
    ref_c = np.concatenate([hidden_t[1].numpy()[0::2],
                            hidden_t[1].numpy()[1::2]], axis=-1)

    ctx, (h, c) = ours.apply(params["encoder"], jnp.asarray(words, jnp.int32),
                             jnp.full((B,), S, jnp.int32),
                             src_feats=jnp.asarray(feats, jnp.int32))
    np.testing.assert_allclose(np.asarray(ctx), ref_ctx, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), ref_h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), ref_c, atol=1e-5)


def test_predict_fertility_encoder_vs_fork_source(onmt_modules):
    """Predicted-fertility head through the fork's OWN exec'd Encoder
    (onmt/Models.py:214-222 head init, :275-287 1+exp(MLP([out; emb])))
    vs NMTEncoder(predict_fertility=True) — context + fertility-value
    identity via converted weights. B=1: the fork reshapes the S-major
    flat head output with .view(n_batch, s_len) (:286), which only
    round-trips at batch 1; our side is per-position [B, S] by
    construction (models/nmt.py NMTEncoder.fertility_values)."""
    import onmt.Models as M

    from test_ref_nmt_source_parity import _FakeDict, _opt
    from unpaired_image_captioning_tpu.models.convert import convert_nmt_model
    from unpaired_image_captioning_tpu.models.nmt import NMTEncoder

    SV, NE, NH = 20, 10, 12
    opt = _opt()
    opt.word_vec_size = NE
    opt.rnn_size = NH
    opt.predict_fertility = True
    opt.attn_transform = "constrained_softmax"
    torch.manual_seed(61)
    holder = torch.nn.Module()
    holder.encoder = M.Encoder(opt, _FakeDict(SV))
    holder.decoder = M.Decoder(opt, _FakeDict(SV))
    holder.eval()
    ref = holder.encoder

    state = {k: v.detach().numpy() for k, v in holder.state_dict().items()}
    params = convert_nmt_model(state, layers=1, brnn=True)
    ours = NMTEncoder(vocab_size=SV, word_vec_size=NE, rnn_size=NH, layers=1,
                      brnn=True, dropout=0.0, predict_fertility=True)

    rng = np.random.RandomState(33)
    S = 7
    words = rng.randint(4, SV, (1, S)).astype(np.int64)
    inp = torch.from_numpy(words[..., None].transpose(1, 0, 2))
    with torch.no_grad():
        _, outputs, fert_ref = ref(inp)
    ref_ctx = outputs.numpy().transpose(1, 0, 2)

    ctx, _, fert = ours.apply(params["encoder"],
                              jnp.asarray(words, jnp.int32),
                              jnp.full((1,), S, jnp.int32),
                              with_fertility=True)
    np.testing.assert_allclose(np.asarray(ctx), ref_ctx, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fert), fert_ref.numpy(),
                               rtol=2e-5)


def test_guided_fertility_table_vs_fork_source(onmt_modules):
    """Guided-fertility alignment tables vs the fork's OWN exec'd
    evaluation.py get_fert_dict/getBatchFertilities (:147-191) on
    single-alignment-per-word fixtures (where the reference's
    last-pair `fertility_i[a]` indexing slip, :173, coincides with the
    intended per-word fold — utils/fertility.py docstring)."""
    import importlib.util as ilu

    from test_ref_nmt_source_parity import FORK, _shim
    from unpaired_image_captioning_tpu.utils.fertility import (
        alignment_fertilities, batch_fertilities)

    src = _shim((FORK / "evaluation.py").read_text())
    # py2-only interpreter state tweaks at module top (evaluation.py:5-6)
    src = src.replace("reload(sys)", "")
    src = src.replace('sys.setdefaultencoding("utf-8")', "")
    ns = {}
    # evaluation.py imports matplotlib/pylab at module top for its heatmap
    # helper — exec only through the fertility functions (they sit above
    # main()) with stubbed heavies
    import types as _t
    for heavy in ("matplotlib", "matplotlib.pyplot", "pylab", "seaborn"):
        sys.modules.setdefault(heavy, _t.ModuleType(heavy))
    sys.modules["matplotlib"].use = lambda *a, **k: None
    exec(compile(src, str(FORK / "evaluation.py"), "exec"), ns)

    class _D:
        def __init__(self, words):
            self.labelToIdx = {w: i for i, w in enumerate(words)}
        def size(self):
            return len(self.labelToIdx)
        def convertToIdx(self, line, unk):
            return [self.labelToIdx.get(w, 0) for w in line]

    words = ["w%d" % i for i in range(8)]
    d = _D(words)
    train = ["w1 w2 w3", "w4 w5", "w2 w6 w7"]
    # one alignment pair per source word -> both readings coincide
    aligns = ["0-0 1-1 2-2", "0-0 1-0", "0-1 1-0 2-2"]

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        tf, af = os.path.join(td, "t.src"), os.path.join(td, "a.txt")
        open(tf, "w").write("\n".join(train))
        open(af, "w").write("\n".join(aligns))
        ref_dict = ns["get_fert_dict"](af, tf, d)

    ids = [[d.labelToIdx[w] for w in line.split()] for line in train]
    table = alignment_fertilities(aligns, ids, d.size())
    for idx, fert in ref_dict.items():
        np.testing.assert_allclose(table[idx], fert, err_msg=str(idx))

    batch = np.array([[1, 2, 3], [4, 5, 0]], np.int64)
    ref_b = ns["getBatchFertilities"](ref_dict,
                                      torch.from_numpy(batch)).numpy()
    np.testing.assert_allclose(batch_fertilities(table, batch), ref_b)
