"""TRAIN-side loss parity against the fork's OWN exec'd Loss.py (round 5):
`onmt.Loss.MemoryEfficientLoss` — the sharded training criterion the fork's
train.py drives (Loss.py:100-213) — executed end-to-end, with loss VALUES,
Statistics (n_words / n_correct), and the INPUT GRADIENT d(loss/B)/d outputs
all pinned:

- std NLL shards (NMTCriterion: PAD-weight-0 NLLLoss, summed) vs our
  losses.criterion.nmt_loss;
- the exhaustion term (lambda_exhaust * per-SHARD last-timestep upper
  bounds minus the <SINK> column, Loss.py:190-205 — the value depends on
  max_generator_batches) vs criterion.ref_exhaustion_loss;
- the copy criterion (CopyGenerator UNK/PAD-masked probs + CopyCriterion's
  log(p_targ + g*attn*align + eps), Loss.py:143-147) vs
  NMTModel.copy_train_loss;
- the coverage term (lambda_coverage * sum(min(coverage, copy_attn)),
  Loss.py:186-188 — only executable WITH copy_loss, since `attn_t` is only
  sharded on the copy path) vs criterion.ref_coverage_loss.

The onmt package loads through test_ref_nmt_source_parity's meta-path shim
(purely textual py2->py3 + torch-0.3 scalar-read fixes — no logic changes).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_ref_nmt_source_parity import FORK, _OnmtFinder
from unpaired_image_captioning_tpu.losses.criterion import (
    nmt_loss, ref_coverage_loss, ref_exhaustion_loss)
from unpaired_image_captioning_tpu.models.nmt import NMTModel

pytestmark = pytest.mark.skipif(not FORK.exists(),
                                reason="reference checkout not present")

TV, NH = 17, 12
PAD = 0
B, T, S = 4, 9, 6          # T = target steps INCLUDING the BOS row
SHARD = 3                  # max_generator_batches: 8 output rows -> 3 shards


@pytest.fixture(scope="module")
def onmt_loss_mod():
    finder = _OnmtFinder()
    sys.meta_path.insert(0, finder)
    saved_eval = sys.modules.get("evaluation")
    sys.modules["evaluation"] = types.ModuleType("evaluation")
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.ByteTensor = torch.ByteTensor
    try:
        import onmt  # noqa: F401

        yield onmt
    finally:
        sys.meta_path.remove(finder)
        for k in [m for m in sys.modules
                  if m == "onmt" or m.startswith("onmt.")]:
            del sys.modules[k]
        if saved_eval is None:
            sys.modules.pop("evaluation", None)
        else:
            sys.modules["evaluation"] = saved_eval


def _opt(**kw):
    base = dict(max_generator_batches=SHARD, lambda_coverage=0.7,
                lambda_fertility=0.0, lambda_exhaust=0.013, gpus=[])
    base.update(kw)
    return types.SimpleNamespace(**base)


def _batch(rng, with_alignment=False):
    """tgt [T, B] long with BOS row + ragged PAD tails (time-major, the
    fork's layout); optional alignment [T, B, S] 0/1."""
    tgt = rng.randint(4, TV, size=(T, B))
    tgt[0] = 2  # BOS row (excluded by tgt[1:])
    tgt[-2:, 1] = PAD
    tgt[-1, 3] = PAD
    b = types.SimpleNamespace(tgt=torch.from_numpy(tgt.astype(np.int64)),
                              batchSize=B)
    if with_alignment:
        align = (rng.rand(T, B, S) < 0.25).astype(np.float32)
        b.alignment = torch.from_numpy(align)
    return b


def _grad_ours(fn, outputs):
    return np.asarray(jax.grad(fn)(jnp.asarray(outputs)))


def test_std_loss_stats_grads_vs_fork_source(onmt_loss_mod):
    onmt = onmt_loss_mod
    rng = np.random.RandomState(3)
    torch.manual_seed(5)
    gen = torch.nn.Sequential(torch.nn.Linear(NH, TV),
                              torch.nn.LogSoftmax(dim=-1))
    crit = onmt.Loss.NMTCriterion(TV, _opt())
    mel = onmt.Loss.MemoryEfficientLoss(_opt(), gen, crit)

    batch = _batch(rng)
    outputs = torch.randn(T - 1, B, NH, requires_grad=True)
    stats, inputs, grads = mel.loss(batch, outputs, {})
    assert inputs == [outputs] and len(grads) == 1

    w = np.asarray(gen[0].weight.detach()).T
    bb = np.asarray(gen[0].bias.detach())
    targ = jnp.asarray(batch.tgt.numpy()[1:].reshape(-1).astype(np.int32))

    def total(o):
        lp = jax.nn.log_softmax(
            (o.reshape(-1, NH) @ w + bb).astype(jnp.float32), axis=-1)
        return nmt_loss(lp, targ, already_log=True)[1].loss

    ours = nmt_loss(jax.nn.log_softmax(
        (jnp.asarray(outputs.detach().numpy()).reshape(-1, NH) @ w + bb),
        axis=-1), targ, already_log=True)[1]
    np.testing.assert_allclose(float(ours.loss), stats.loss, rtol=1e-5)
    assert int(ours.n_words) == int(stats.n_words)
    assert int(ours.n_correct) == int(stats.n_correct)

    g = _grad_ours(lambda o: total(o) / B, outputs.detach().numpy())
    np.testing.assert_allclose(g, grads[0].numpy(), atol=1e-6)


def test_exhaustion_term_vs_fork_source(onmt_loss_mod):
    """The exhaustion term is PER-SHARD last-timestep (Loss.py:199-205) —
    its value changes with max_generator_batches; ref_exhaustion_loss
    reproduces the sharding."""
    onmt = onmt_loss_mod
    rng = np.random.RandomState(7)
    torch.manual_seed(11)
    gen = torch.nn.Sequential(torch.nn.Linear(NH, TV),
                              torch.nn.LogSoftmax(dim=-1))
    opt = _opt()
    crit = onmt.Loss.NMTCriterion(TV, opt)
    batch = _batch(rng)
    outputs = torch.randn(T - 1, B, NH, requires_grad=True)
    ub = rng.rand(T - 1, B, S).astype(np.float32) * 2.0

    base = onmt.Loss.MemoryEfficientLoss(opt, gen, crit)
    stats0, _, _ = base.loss(batch, outputs, {})

    mel = onmt.Loss.MemoryEfficientLoss(opt, gen, crit, exhaustion_loss=True)
    outputs2 = outputs.detach().clone().requires_grad_(True)
    stats, _, grads = mel.loss(
        batch, outputs2, {"upper_bounds": torch.from_numpy(ub)})

    ref_term = stats.loss - stats0.loss
    ours = ref_exhaustion_loss(
        jnp.asarray(ub.transpose(1, 0, 2)), shard_size=SHARD,
        lambda_exhaust=opt.lambda_exhaust)
    np.testing.assert_allclose(float(ours), ref_term, rtol=1e-4)
    # the term is outputs-independent: gradient identical to the std case
    w = np.asarray(gen[0].weight.detach()).T
    bb = np.asarray(gen[0].bias.detach())
    targ = jnp.asarray(batch.tgt.numpy()[1:].reshape(-1).astype(np.int32))
    g = _grad_ours(
        lambda o: nmt_loss((o.reshape(-1, NH) @ w + bb).astype(jnp.float32),
                           targ)[1].loss / B, outputs.detach().numpy())
    np.testing.assert_allclose(g, grads[0].numpy(), atol=1e-6)


def _copy_setup(onmt, seed):
    rng = np.random.RandomState(seed)
    torch.manual_seed(seed + 1)
    opt = _opt(rnn_size=NH)

    class _D:
        def __init__(self, n):
            self.n = n

        def size(self):
            return self.n

    gen = onmt.modules.CopyGenerator(opt, _D(TV), _D(TV))
    mel_kw = dict(copy_loss=True)
    batch = _batch(rng, with_alignment=True)
    outputs = torch.randn(T - 1, B, NH, requires_grad=True)
    cattn = rng.rand(T - 1, B, S).astype(np.float32)
    cattn /= cattn.sum(-1, keepdims=True)

    params = {"generator": {"w": jnp.asarray(
                  np.asarray(gen.linear.weight.detach()).T),
                  "b": jnp.asarray(np.asarray(gen.linear.bias.detach()))},
              "copy_gate": {"w": jnp.asarray(
                  np.asarray(gen.linear_copy.weight.detach()).T),
                  "b": jnp.asarray(
                      np.asarray(gen.linear_copy.bias.detach()))}}
    ours = NMTModel(src_vocab_size=TV, tgt_vocab_size=TV, word_vec_size=8,
                    rnn_size=NH, layers=1, copy_attn=True)
    return opt, gen, mel_kw, batch, outputs, cattn, params, ours


def test_copy_criterion_vs_fork_source(onmt_loss_mod):
    onmt = onmt_loss_mod
    opt, gen, mel_kw, batch, outputs, cattn, params, ours = _copy_setup(
        onmt, 13)
    mel = onmt.Loss.MemoryEfficientLoss(opt, gen, onmt.modules.CopyCriterion,
                                        **mel_kw)
    stats, _, grads = mel.loss(batch, outputs,
                               {"copy": torch.from_numpy(cattn)})

    targ = jnp.asarray(batch.tgt.numpy()[1:].transpose(1, 0)
                       .astype(np.int32))                       # [B, T-1]
    align = jnp.asarray(batch.alignment.numpy()[1:].transpose(1, 0, 2))
    ca = jnp.asarray(cattn.transpose(1, 0, 2))

    def total(o):
        return ours.copy_train_loss(
            params, jnp.moveaxis(o, 0, 1), ca, targ, align)[0]

    loss, st = ours.copy_train_loss(
        params, jnp.asarray(outputs.detach().numpy()).transpose(1, 0, 2),
        ca, targ, align)
    np.testing.assert_allclose(float(loss), stats.loss, rtol=1e-4)
    assert int(st.n_words) == int(stats.n_words)
    assert int(st.n_correct) == int(stats.n_correct)

    g = _grad_ours(lambda o: total(o) / B, outputs.detach().numpy())
    np.testing.assert_allclose(g, grads[0].numpy(), atol=1e-5)


def test_coverage_term_vs_fork_source(onmt_loss_mod):
    """Coverage only EXECUTES with copy_loss upstream (attn_t is sharded
    only there, Loss.py:166-168+186-188 — the penalty mins coverage
    against the COPY attention)."""
    onmt = onmt_loss_mod
    opt, gen, mel_kw, batch, outputs, cattn, params, ours = _copy_setup(
        onmt, 17)
    rng = np.random.RandomState(19)
    cov = rng.rand(T - 1, B, S).astype(np.float32) * 1.5

    mel0 = onmt.Loss.MemoryEfficientLoss(opt, gen,
                                         onmt.modules.CopyCriterion,
                                         **mel_kw)
    stats0, _, _ = mel0.loss(batch, outputs.detach().clone().requires_grad_(
        True), {"copy": torch.from_numpy(cattn)})
    mel = onmt.Loss.MemoryEfficientLoss(opt, gen,
                                        onmt.modules.CopyCriterion,
                                        coverage_loss=True, **mel_kw)
    stats, _, _ = mel.loss(batch, outputs,
                           {"copy": torch.from_numpy(cattn),
                            "coverage": torch.from_numpy(cov)})
    ref_term = stats.loss - stats0.loss
    got = ref_coverage_loss(jnp.asarray(cov.transpose(1, 0, 2)),
                            jnp.asarray(cattn.transpose(1, 0, 2)),
                            lambda_coverage=opt.lambda_coverage)
    np.testing.assert_allclose(float(got), ref_term, rtol=1e-4)
