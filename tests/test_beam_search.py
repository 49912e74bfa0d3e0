"""Beam-search parity: the vectorized [batch, group, beam] program vs a
naive host-side implementation of the reference semantics
(CaptionModel.beam_search / onmt.Beam flat top-k; SURVEY.md §7.3 names this
the #1 hard part)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu.ops.beam_search import beam_search

V = 12   # vocab (incl. 0 = EOS); UNK = V-1
T = 6
B = 3
K = 3


@pytest.fixture
def table(np_rng):
    # deterministic toy model: logprobs depend on (prev_token, t, batch)
    raw = np_rng.randn(B, T + 2, V) * 2.0
    return raw


def make_step(table):
    tbl = jnp.asarray(table, jnp.float32)

    def step_fn(params, ctx, state, it):
        t = state["t"]
        b = state["b"]
        logits = tbl[b, t] + 0.3 * jnp.asarray(it, jnp.float32)[:, None] * jnp.arange(V)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return lp, {"t": t + 1, "b": b}

    return step_fn


def naive_beam(table, b, *, beam_size, seq_length, suppress_unk=True):
    """Host-side beam with reference semantics: flat top-k over beam*vocab,
    UNK -1000 on the unaugmented scores, dead slot -1000 on EOS, record all
    live beams at the final step, finished ranked by total logprob."""
    import math

    def step_logprobs(it, t):
        logits = table[b, t] + 0.3 * it * np.arange(V)
        x = logits - logits.max()
        return x - math.log(np.exp(x).sum())

    beams = [{"seq": [], "logps": [], "sum": 0.0, "it": 0}]
    finished = []
    for t in range(seq_length):
        cands = []
        rows = beams if t > 0 else beams[:1]
        for qi, beam in enumerate(rows):
            if t > 0 and qi >= len(beams):
                break
            lp = step_logprobs(beam["it"], t).copy()
            if suppress_unk:
                lp[V - 1] -= 1000.0
            for w in range(V):
                cands.append((beam["sum"] + lp[w], qi, w, lp[w]))
        cands.sort(key=lambda c: -c[0])
        new_beams = []
        for score, qi, w, tok_lp in cands[:beam_size]:
            src = rows[qi]
            nb = {"seq": src["seq"] + [w], "logps": src["logps"] + [tok_lp],
                  "sum": src["sum"] + tok_lp, "it": w}
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


def test_beam_matches_naive_reference(table):
    step_fn = make_step(table)
    state0 = {"t": jnp.zeros((B,), jnp.int32), "b": jnp.arange(B, dtype=jnp.int32)}
    res = beam_search(step_fn, None, None, state0, beam_size=K, seq_length=T,
                      suppress_unk=True)
    seqs = np.asarray(res.seq)
    scores = np.asarray(res.scores)
    for b in range(B):
        ref = naive_beam(table, b, beam_size=K, seq_length=T)
        for k, (ref_seq, ref_score) in enumerate(ref):
            np.testing.assert_array_equal(
                seqs[b, k], ref_seq,
                err_msg=f"b={b} k={k}: {seqs[b, k]} vs {ref_seq}")
            np.testing.assert_allclose(scores[b, k], ref_score, atol=1e-4)


def test_beam_logps_consistent(table):
    """Recorded per-token logprobs must sum to the beam score."""
    step_fn = make_step(table)
    state0 = {"t": jnp.zeros((B,), jnp.int32), "b": jnp.arange(B, dtype=jnp.int32)}
    res = beam_search(step_fn, None, None, state0, beam_size=K, seq_length=T,
                      suppress_unk=False)
    seqs = np.asarray(res.seq)
    logps = np.asarray(res.logps)
    scores = np.asarray(res.scores)
    for b in range(B):
        for k in range(K):
            # tokens after the first EOS contribute nothing
            n = T
            if (seqs[b, k] == 0).any():
                n = int(np.argmax(seqs[b, k] == 0)) + 1
            np.testing.assert_allclose(logps[b, k, :n].sum(), scores[b, k],
                                       atol=1e-4)


def test_diverse_groups_penalize_repeats(table):
    step_fn = make_step(table)
    state0 = {"t": jnp.zeros((B,), jnp.int32), "b": jnp.arange(B, dtype=jnp.int32)}
    res = beam_search(step_fn, None, None, state0, beam_size=4, seq_length=T,
                      group_size=2, diversity_lambda=10.0, suppress_unk=False)
    seqs = np.asarray(res.seq)
    # with a huge diversity penalty, group 2's first token differs from
    # group 1's first token (unless forced by EOS)
    for b in range(B):
        g1_first = set(seqs[b, :2, 0].tolist())
        g2_first = seqs[b, 2, 0]
        if g2_first != 0:
            assert g2_first not in g1_first


def test_decoding_constraint_no_repeat(table):
    step_fn = make_step(table)
    state0 = {"t": jnp.zeros((B,), jnp.int32), "b": jnp.arange(B, dtype=jnp.int32)}
    res = beam_search(step_fn, None, None, state0, beam_size=2, seq_length=T,
                      decoding_constraint=True, suppress_unk=False)
    seqs = np.asarray(res.seq)
    for b in range(B):
        row = seqs[b, 0]
        for t in range(1, T):
            if row[t] != 0:
                assert row[t] != row[t - 1]


def naive_diverse_beam(table, b, *, beam_size, group_size, seq_length,
                       diversity_lambda):
    """Host-side staggered diverse groups (CaptionModel.py:100-176
    semantics): group g active at global t in [g, T+g); penalty counts
    previous groups' tokens at the same local time."""
    import math

    bd = beam_size // group_size

    def step_logprobs(it, t):
        logits = table[b, t] + 0.3 * it * np.arange(V)
        x = logits - logits.max()
        return x - math.log(np.exp(x).sum())

    groups = []
    for g in range(group_size):
        groups.append({"beams": [{"seq": [], "sum": 0.0, "it": 0}],
                       "finished": []})
    for t in range(seq_length + group_size - 1):
        for g, grp in enumerate(groups):
            lt = t - g
            if lt < 0 or lt >= seq_length:
                continue
            # diversity penalty from previous groups' tokens at local time lt
            penalty = np.zeros(V)
            for p in range(g):
                for pb in groups[p]["beams"]:
                    if len(pb["seq"]) > lt:
                        penalty[pb["seq"][lt]] += diversity_lambda
            cands = []
            rows = grp["beams"] if lt > 0 else grp["beams"][:1]
            for qi, beam in enumerate(rows):
                # each group's decoder state advances on its LOCAL time
                lp = step_logprobs(beam["it"], lt).copy()
                lp[V - 1] -= 1000.0  # UNK
                aug = lp - penalty
                for w in range(V):
                    # accumulate the AUGMENTED logprob (reference
                    # beam_logprobs_sum takes v['p'], CaptionModel.py:90)
                    cands.append((beam["sum"] + aug[w], qi, w, aug[w]))
            cands.sort(key=lambda c: -c[0])
            new_beams = []
            for score, qi, w, tok_lp in cands[:bd]:
                src = rows[qi]
                nb = {"seq": src["seq"] + [w], "sum": src["sum"] + tok_lp,
                      "it": w}
                if w == 0 or lt == seq_length - 1:
                    grp["finished"].append({"seq": nb["seq"], "score": nb["sum"]})
                    nb["sum"] = -1000.0
                new_beams.append(nb)
            grp["beams"] = new_beams
    out = []
    for grp in groups:
        fins = sorted(grp["finished"], key=lambda f: -f["score"])[:bd]
        for f in fins:
            seq = f["seq"] + [0] * (seq_length - len(f["seq"]))
            out.append((seq, f["score"]))
    return out


def test_diverse_beam_matches_naive(table):
    G, K = 2, 4
    step_fn = make_step(table)
    state0 = {"t": jnp.zeros((B,), jnp.int32),
              "b": jnp.arange(B, dtype=jnp.int32)}
    res = beam_search(step_fn, None, None, state0, beam_size=K, seq_length=T,
                      group_size=G, diversity_lambda=0.7, suppress_unk=True)
    seqs = np.asarray(res.seq)
    scores = np.asarray(res.scores)
    for b in range(B):
        ref = naive_diverse_beam(table, b, beam_size=K, group_size=G,
                                 seq_length=T, diversity_lambda=0.7)
        for k, (ref_seq, ref_score) in enumerate(ref):
            np.testing.assert_array_equal(
                seqs[b, k], ref_seq, err_msg=f"b={b} k={k}")
            np.testing.assert_allclose(scores[b, k], ref_score, atol=1e-4)
