"""Vectorized diverse beam search: one `[batch, group, beam]` tensor program.

Replaces three host-side beam implementations in the reference with a single
compiled scan:

- `CaptionModel.beam_search` (models/CaptionModel.py:33-177): diverse groups
  with per-group staggered start, diversity penalty `add_diversity`
  (:36-44), UNK suppression (−1000 on the last vocab slot, :133), optional
  `decoding_constraint` (no immediate word repeat), `max_ppl`
  length-normalized final ranking, EOS dead-slot semantics
  (`beam_logprobs_sum = −1000` after a beam emits EOS, :xx) and
  record-all-live-beams at the final step;
- `AttModel._sample_beam` (AttModel.py:167-196): the per-image Python loop
  over the batch is gone — batch is just a tensor dimension here;
- `onmt.Beam` / `NMTModel.translateBatch` (onmt/Beam.py:20-117,
  models/NMT_Models.py:322-395): flat top-k over `beam×vocab` with
  backpointers; here the same selection rule with BOS/EOS/PAD ids
  parameterized and optional per-step aux recording (source-attention argmax
  for UNK replacement, NMT_Models.py:312-320).

Semantics notes (parity with the reference):
- selection AND the accumulated beam score use the *augmented* logprobs
  (diversity penalty, constraint): `beam_logprobs_sum[vix] = v['p']` where
  p sums the sorted augmented values (CaptionModel.py:70-74,90). The
  per-token logp record uses the *unaugmented* values (v['r']); UNK
  suppression is part of the unaugmented values too (:133);
- the diversity penalty reads previous groups' beams AFTER their advance at
  the same global step (groups are processed in order inside one t;
  add_diversity reads the just-updated beam_seq_table, :36-44,127-138);
- at a group's local t=0 only beam 0 participates (all beams start equal);
- a beam that emits EOS is recorded into the finished set and its live score
  is set to exactly −1000 (it remains a selectable "dead slot", matching the
  reference's quirk);
- at local t = seq_length−1 every live beam is recorded;
- finished beams are ranked by total logprob, or logprob/length when
  `max_ppl` is set;
- groups are staggered in time: group g is active for global steps
  [g, seq_length+g), total steps = seq_length + group_size − 1.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e10
DEAD = -1000.0  # reference's dead-slot score


class BeamResult(NamedTuple):
    seq: jax.Array          # [B, K, T] int32 — per-group sorted, group-major
    logps: jax.Array        # [B, K, T] f32 per-token logprobs
    scores: jax.Array       # [B, K] f32 total logprob of each finished beam
    aux: Optional[jax.Array]  # [B, K, T] int32 recorded aux (or None)


def _expand_to_beams(tree, beam_size: int, no_expand=()):
    """[B, ...] -> [B*K, ...] with row b*K+k = row b.

    Top-level dict keys in `no_expand` are left at [B, ...]: memory-bound
    leaves (attention memories, encoder contexts) that are identical across
    beams stay unexpanded so each decode step reads them once per image
    instead of once per beam — the model's attention handles the
    [B*K] query vs [B] memory shape split."""
    def expand(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jnp.repeat(x, beam_size, axis=0)
        return x

    if (isinstance(tree, tuple) and no_expand
            and all(isinstance(ne, (tuple, list)) for ne in no_expand)):
        # ensemble: tuple of member ctx dicts with per-member no_expand
        return tuple(_expand_to_beams(t, beam_size, no_expand=ne)
                     for t, ne in zip(tree, no_expand))
    if isinstance(tree, dict) and no_expand:
        return {k: (v if k in no_expand else jax.tree.map(expand, v))
                for k, v in tree.items()}
    return jax.tree.map(expand, tree)


def _flat_topk(total_flat, k_rows: int, topn: int):
    """Per-image top-`topn` over `k_rows` beam rows of a flat `[B*K, V]`
    score matrix, without materializing a `[B, K*V]` relayout.

    Equivalent to `lax.top_k(total.reshape(B, K*V), topn)` INCLUDING tie
    semantics (value desc, flat index asc): per-row top-k orders equal
    values by column ascending, and the merge list is row-major so equal
    values across rows resolve to the lower beam row. At most `topn`
    winners can come from one row, so per-row top-`topn` is lossless.

    Why: reshaping the step's natural `[B*K, V]` logprob layout to
    `[B, K, V]` forces XLA relayout copies inside the decode loop
    (profiled at ~25% of non-attention step time on v5e); two-stage top-k
    keeps every heavy op on the natural layout. Returns
    (scores `[B, topn]` f32, flat indices `[B, topn]` i32 in `[0, K*V)`).
    """
    from .topk import row_topk

    rows, v = total_flat.shape
    batch = rows // k_rows
    rv, rc = row_topk(total_flat, topn)                   # [B*K, topn]
    rv2 = rv.reshape(batch, k_rows * topn)
    flat = (jnp.arange(k_rows, dtype=jnp.int32)[None, :, None] * v
            + rc.reshape(batch, k_rows, topn)).reshape(batch, k_rows * topn)
    sel, m = jax.lax.top_k(rv2, topn)                     # [B, topn]
    return sel, jnp.take_along_axis(flat, m, axis=1)


def beam_search(
    step_fn: Callable,
    params,
    ctx,
    state0,
    *,
    beam_size: int,
    seq_length: int,
    bos_token: int = 0,
    eos_token: int = 0,
    eos_is_zero: bool = True,
    group_size: int = 1,
    diversity_lambda: float = 0.5,
    decoding_constraint: bool = False,
    suppress_unk: bool = True,
    max_ppl: bool = False,
    record_aux_from_state: Optional[Callable[[Any], jax.Array]] = None,
    ctx_no_expand: tuple = (),
) -> BeamResult:
    """Run batched (diverse) beam search.

    step_fn(params, ctx, state, it[B*K]) -> (logprobs [B*K, V], state)
    ctx/state0 are per-example [B, ...] pytrees; they are expanded to beams
    here. ctx is never reordered (identical across beams of one example);
    state is reordered by backpointers every step.
    """
    assert beam_size % group_size == 0, "beam_size must be divisible by group_size"
    G = group_size
    bd = beam_size // G
    K = beam_size
    T = seq_length

    batch = jax.tree.leaves(state0)[0].shape[0]
    ctx = (_expand_to_beams(ctx, K, no_expand=ctx_no_expand)
           if ctx is not None else None)
    state = _expand_to_beams(state0, K)

    cum = jnp.zeros((batch, G, bd), jnp.float32)
    use_flat_select = G == 1  # single-group hot path (see _flat_topk)
    it = jnp.full((batch, G, bd), bos_token, jnp.int32)
    seq_buf = jnp.zeros((batch, G, bd, T), jnp.int32)
    logp_buf = jnp.zeros((batch, G, bd, T), jnp.float32)
    aux_buf = jnp.zeros((batch, G, bd, T), jnp.int32) if record_aux_from_state else None

    fin_rank = jnp.full((batch, G, bd), NEG_INF, jnp.float32)
    fin_score = jnp.full((batch, G, bd), NEG_INF, jnp.float32)
    fin_seq = jnp.zeros((batch, G, bd, T), jnp.int32)
    fin_logp = jnp.zeros((batch, G, bd, T), jnp.float32)
    fin_aux = jnp.zeros((batch, G, bd, T), jnp.int32) if record_aux_from_state else None

    t_total = T + G - 1
    arangeT = jnp.arange(T)

    def body(carry, t):
        (state, cum, it, seq_buf, logp_buf, aux_buf,
         fin_rank, fin_score, fin_seq, fin_logp, fin_aux) = carry[:11]

        it_flat = it.reshape(batch * K)
        logprobs_flat, new_state = step_fn(params, ctx, state, it_flat)
        V = logprobs_flat.shape[-1]
        lp = logprobs_flat.astype(jnp.float32).reshape(batch, G, bd, V)
        aux_flat = (record_aux_from_state(new_state).astype(jnp.int32)
                    if record_aux_from_state else None)
        aux_now = aux_flat.reshape(batch, G, bd) if aux_flat is not None else None

        if suppress_unk:
            # UNK is the LAST vocab slot in the caption convention
            # (CaptionModel.py:133); part of the *unaugmented* values.
            unk_col = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 1, V), 3) == (V - 1)
            lp = jnp.where(unk_col, lp - 1000.0, lp)

        parents = jnp.zeros((batch, G, bd), jnp.int32)
        toks = jnp.zeros((batch, G, bd), jnp.int32)
        new_cum = cum
        new_seq = seq_buf
        new_logp = logp_buf
        new_aux = aux_buf
        nfr, nfs, nfq, nfl, nfa = fin_rank, fin_score, fin_seq, fin_logp, fin_aux
        active_masks = []

        for g in range(G):
            local_t = t - g
            active = jnp.logical_and(local_t >= 0, local_t < T)
            lt = jnp.clip(local_t, 0, T - 1)
            active_masks.append(active)

            unaug = lp[:, g]  # [B, bd, V]
            aug = unaug

            # diversity penalty from previous groups' choices at this local
            # t — read from new_seq: groups advance in order within one
            # global step and add_diversity sees the just-updated tables
            # (CaptionModel.py:127-138)
            if g > 0 and diversity_lambda > 0.0:
                penalty = jnp.zeros((batch, V), jnp.float32)
                for p in range(g):
                    prev_tok = jnp.take_along_axis(
                        new_seq[:, p], jnp.broadcast_to(lt, (batch, bd))[..., None],
                        axis=-1)[..., 0]  # [B, bd]
                    penalty = penalty + jnp.sum(
                        jax.nn.one_hot(prev_tok, V, dtype=jnp.float32), axis=1)
                aug = aug - diversity_lambda * penalty[:, None, :]

            if decoding_constraint:
                # forbid repeating the previous token (selection only)
                prev_onehot = jax.nn.one_hot(it[:, g], V, dtype=jnp.float32)
                no_prev = jnp.where(lt > 0, NEG_INF, 0.0)
                aug = aug + prev_onehot * no_prev

            total = cum[:, g][..., None] + aug  # [B, bd, V]
            # local t=0: only beam 0 (all beams identical at start)
            beam_mask = jnp.where(
                lt == 0,
                jnp.where(jnp.arange(bd) == 0, 0.0, NEG_INF),
                jnp.zeros((bd,)),
            )
            total = total + beam_mask[None, :, None]

            flat = total.reshape(batch, bd * V)
            sel_score, sel_idx = jax.lax.top_k(flat, bd)      # [B, bd]
            parent = sel_idx // V
            tok = (sel_idx % V).astype(jnp.int32)

            # the accumulated beam score uses the AUGMENTED logprob
            # (reference beam_logprobs_sum, CaptionModel.py:70-74,90); the
            # per-token logp record keeps the UNAUGMENTED value (v['r']).
            # sel_idx == parent * V + tok, gather from the flat views.
            tok_unaug = jnp.take_along_axis(
                unaug.reshape(batch, bd * V), sel_idx, axis=1)
            tok_aug = jnp.take_along_axis(
                aug.reshape(batch, bd * V), sel_idx, axis=1)
            cum_g = jnp.take_along_axis(cum[:, g], parent, axis=1) + tok_aug

            # reorder buffers by parent, then write token at lt
            def reorder_write(buf_g, value):
                re = jnp.take_along_axis(buf_g, parent[..., None], axis=1)
                write = arangeT[None, None, :] == lt
                return jnp.where(write, value[..., None], re)

            seq_g = reorder_write(seq_buf[:, g], tok)
            logp_g = reorder_write(logp_buf[:, g], tok_unaug)

            # finishing beams: EOS token, or final local step
            is_eos = tok == eos_token
            is_final = lt == (T - 1)
            finishing = jnp.logical_and(active, jnp.logical_or(is_eos, is_final))
            length = (lt + 1).astype(jnp.float32)
            cand_score = jnp.where(finishing, cum_g, NEG_INF)
            cand_rank = cand_score / length if max_ppl else cand_score

            merged_rank = jnp.concatenate([fin_rank[:, g], cand_rank], axis=1)
            merged_score = jnp.concatenate([fin_score[:, g], cand_score], axis=1)
            merged_seq = jnp.concatenate([fin_seq[:, g], seq_g], axis=1)
            merged_logp = jnp.concatenate([fin_logp[:, g], logp_g], axis=1)
            top_rank, top_idx = jax.lax.top_k(merged_rank, bd)
            gather2 = lambda m: jnp.take_along_axis(m, top_idx, axis=1)
            gather3 = lambda m: jnp.take_along_axis(m, top_idx[..., None], axis=1)
            nfr = nfr.at[:, g].set(jnp.where(active, top_rank, fin_rank[:, g]))
            nfs = nfs.at[:, g].set(jnp.where(active, gather2(merged_score), fin_score[:, g]))
            nfq = nfq.at[:, g].set(jnp.where(active, gather3(merged_seq), fin_seq[:, g]))
            nfl = nfl.at[:, g].set(jnp.where(active, gather3(merged_logp), fin_logp[:, g]))

            if record_aux_from_state:
                aux_g = reorder_write(aux_buf[:, g], aux_now[:, g])
                merged_aux = jnp.concatenate([fin_aux[:, g], aux_g], axis=1)
                nfa = nfa.at[:, g].set(jnp.where(active, gather3(merged_aux), fin_aux[:, g]))
                new_aux = new_aux.at[:, g].set(jnp.where(active, aux_g, aux_buf[:, g]))

            # dead-slot: finished live beams get exactly -1000
            cum_g = jnp.where(jnp.logical_and(finishing, is_eos),
                              jnp.float32(DEAD), cum_g)
            cum_g = jnp.where(active, cum_g, cum[:, g])

            parents = parents.at[:, g].set(jnp.where(active, parent, jnp.arange(bd)[None, :]))
            toks = toks.at[:, g].set(jnp.where(active, tok, it[:, g]))
            new_cum = new_cum.at[:, g].set(cum_g)
            new_seq = new_seq.at[:, g].set(jnp.where(active, seq_g, seq_buf[:, g]))
            new_logp = new_logp.at[:, g].set(jnp.where(active, logp_g, logp_buf[:, g]))

        # one global state reorder: flat index = b*K + g*bd + parent
        active_row = jnp.stack(
            [jnp.broadcast_to(a, (batch, bd)) for a in active_masks], axis=1
        ).reshape(batch * K)
        base = (jnp.arange(batch) * K)[:, None, None]
        gather_idx = (base + jnp.arange(G)[None, :, None] * bd + parents).reshape(batch * K)

        def reorder_leaf(new_leaf, old_leaf):
            re = jnp.take(new_leaf, gather_idx, axis=0)
            mask = active_row.reshape((batch * K,) + (1,) * (re.ndim - 1))
            return jnp.where(mask, re, old_leaf)

        state_next = jax.tree.map(reorder_leaf, new_state, state)

        carry = (state_next, new_cum, toks, new_seq, new_logp, new_aux,
                 nfr, nfs, nfq, nfl, nfa)
        return carry, None

    def body_fast(carry, t):
        """G == 1 specialization of `body`: same semantics (g = 0, a single
        always-active group), but selection runs on the step's natural
        `[B*K, V]` layout via `_flat_topk` — no `[B, G, bd, V]` reshape, no
        relayout copies in the hot loop. Kept in lockstep with `body`;
        parity-tested against the naive reference in
        tests/test_beam_search.py."""
        (state, cum, it, seq_buf, logp_buf, aux_buf,
         fin_rank, fin_score, fin_seq, fin_logp, fin_aux) = carry[:11]

        it_flat = it.reshape(batch * K)
        logprobs_flat, new_state = step_fn(params, ctx, state, it_flat)
        V = logprobs_flat.shape[-1]
        lp_flat = logprobs_flat.astype(jnp.float32)       # [B*K, V]
        aux_now = (record_aux_from_state(new_state).astype(jnp.int32)
                   .reshape(batch, bd) if record_aux_from_state else None)

        if suppress_unk:
            # as a fused select, not .at[].add — a dynamic-update-slice of
            # the full [B*K, V] buffer forces a copy every decode step
            unk_col = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1) == (V - 1)
            lp_flat = jnp.where(unk_col, lp_flat - 1000.0, lp_flat)

        aug_flat = lp_flat
        if decoding_constraint:
            no_prev = jnp.where(t > 0, NEG_INF, 0.0)
            aug_flat = aug_flat.at[jnp.arange(batch * K), it_flat].add(no_prev)

        total_flat = aug_flat + cum.reshape(batch * K, 1)
        # local t=0: only beam 0 participates (all beams start equal)
        row_is_b0 = (jnp.arange(batch * K) % bd) == 0
        beam_mask = jnp.where(t == 0,
                              jnp.where(row_is_b0, 0.0, NEG_INF),
                              jnp.zeros((batch * K,)))
        total_flat = total_flat + beam_mask[:, None]

        sel_score, sel_idx = _flat_topk(total_flat, bd, bd)   # [B, bd]
        parent = sel_idx // V
        tok = (sel_idx % V).astype(jnp.int32)
        # total = lp (+constraint) + cum (+beam_mask); a selected entry never
        # carries the constraint's NEG_INF (V-1 unpenalized candidates per
        # row always beat it) and its beam_mask term is exactly 0.0, so
        # tok_unaug == tok_aug == sel_score - cum[parent] — an arithmetic
        # identity that kills the [B, bd*V] relayout + gather the old
        # take_along_axis path forced into the decode loop (xplane: 4.4 us
        # reshape + 1.9 us gather + the second [B*K, V] f32 materialization
        # per step at the bench shapes). Tokens and cum stay bit-identical
        # (cum_g == sel_score, same single rounding); recorded per-token
        # logps move by <= 1 ulp of cum and now telescope exactly to the
        # final score.
        cum_parent = jnp.take_along_axis(cum[:, 0], parent, axis=1)
        tok_unaug = sel_score - cum_parent
        cum_g = sel_score

        def reorder_write(buf_g, value):
            re = jnp.take_along_axis(buf_g, parent[..., None], axis=1)
            write = arangeT[None, None, :] == t
            return jnp.where(write, value[..., None], re)

        seq_g = reorder_write(seq_buf[:, 0], tok)
        logp_g = reorder_write(logp_buf[:, 0], tok_unaug)

        is_eos = tok == eos_token
        finishing = jnp.logical_or(is_eos, t == (T - 1))
        length = (t + 1).astype(jnp.float32)
        cand_score = jnp.where(finishing, cum_g, NEG_INF)
        cand_rank = cand_score / length if max_ppl else cand_score

        merged_rank = jnp.concatenate([fin_rank[:, 0], cand_rank], axis=1)
        merged_score = jnp.concatenate([fin_score[:, 0], cand_score], axis=1)
        merged_seq = jnp.concatenate([fin_seq[:, 0], seq_g], axis=1)
        merged_logp = jnp.concatenate([fin_logp[:, 0], logp_g], axis=1)
        top_rank, top_idx = jax.lax.top_k(merged_rank, bd)
        gather2 = lambda m: jnp.take_along_axis(m, top_idx, axis=1)
        gather3 = lambda m: jnp.take_along_axis(m, top_idx[..., None], axis=1)
        nfr = fin_rank.at[:, 0].set(top_rank)
        nfs = fin_score.at[:, 0].set(gather2(merged_score))
        nfq = fin_seq.at[:, 0].set(gather3(merged_seq))
        nfl = fin_logp.at[:, 0].set(gather3(merged_logp))

        new_aux = aux_buf
        nfa = fin_aux
        if record_aux_from_state:
            aux_g = reorder_write(aux_buf[:, 0], aux_now)
            merged_aux = jnp.concatenate([fin_aux[:, 0], aux_g], axis=1)
            nfa = fin_aux.at[:, 0].set(gather3(merged_aux))
            new_aux = aux_buf.at[:, 0].set(aux_g)

        cum_g = jnp.where(is_eos, jnp.float32(DEAD), cum_g)

        gather_idx = ((jnp.arange(batch) * K)[:, None] + parent).reshape(batch * K)
        state_next = jax.tree.map(
            lambda nl: jnp.take(nl, gather_idx, axis=0), new_state)

        carry = (state_next, cum.at[:, 0].set(cum_g), tok[:, None, :],
                 seq_buf.at[:, 0].set(seq_g), logp_buf.at[:, 0].set(logp_g),
                 new_aux, nfr, nfs, nfq, nfl, nfa)
        return carry, None

    if use_flat_select:
        body = body_fast

    carry0 = (state, cum, it, seq_buf, logp_buf, aux_buf,
              fin_rank, fin_score, fin_seq, fin_logp, fin_aux)

    # early-exit decode: stop once every live beam is a dead slot (all
    # finished via EOS) — the reference's python loop breaks the same way.
    # while_loop is legal here because all beam state lives in the carry.
    def cond(loop_carry):
        t, carry = loop_carry
        live_cum = carry[1]
        any_alive = jnp.any(live_cum > jnp.float32(DEAD) + 1e-3)
        return jnp.logical_and(t < t_total, any_alive)

    def loop_body(loop_carry):
        t, carry = loop_carry
        carry, _ = body(carry, t)
        return (t + 1, carry)

    _, carry = jax.lax.while_loop(cond, loop_body, (jnp.int32(0), carry0))
    (_, _, _, _, _, _, fin_rank, fin_score, fin_seq, fin_logp, fin_aux) = carry

    # group-major concatenation (reference: done_beams_table reduce-add)
    return BeamResult(
        seq=fin_seq.reshape(batch, K, T),
        logps=fin_logp.reshape(batch, K, T),
        scores=fin_score.reshape(batch, K),
        aux=fin_aux.reshape(batch, K, T) if fin_aux is not None else None,
    )


def onmt_beam_search(
    step_fn: Callable,
    params,
    ctx,
    state0,
    *,
    beam_size: int,
    seq_length: int,
    bos_token: int,
    eos_token: int,
    ctx_no_expand: tuple = (),
    record_aux_from_state: Optional[Callable[[Any], jax.Array]] = None,
    lazy_state: tuple = (),
    ancestry_key: Optional[str] = None,
) -> BeamResult:
    """Beam search with the vendored OpenNMT's exact semantics
    (onmt/Beam.py:50-88, NMT_Models.py:322-395) — these differ from the
    caption beam above and matter for token-identical translations:

    - rows that emit EOS are NOT dead-slotted: they stay in the beam and
      keep extending (scores keep accumulating); hypotheses are truncated at
      their FIRST EOS only at read-out (buildTargetTokens, :312-320);
    - a sentence finishes when EOS is at the TOP of its beam
      (Beam.py:83-85); finished sentences freeze;
    - at t=0 only row 0's scores participate (beamLk = wordLk[0]);
    - the result rows are the final beam rows sorted by current score
      (sortBest + getHyp backtrace == our reordered seq buffer).

    Cross-checked token-identical against a torch transcription in
    tests/test_beam_convert_parity.py.

    lazy_state / ancestry_key: lazy beam caches. State keys in
    `lazy_state` are APPEND-ONLY — their rows are never reordered by
    parent or frozen (their contents are only ever read through the
    ancestry mask, so stale rows are unreachable). The `ancestry_key`
    leaf must be an int32 [batch, T] dummy in state0; it is re-initialized
    here to each row's LOCAL beam index and updated each step as
    anc'[k, τ<=t] = anc[parent(k), τ], anc'[k, τ>t] = k — i.e. beam k's
    position-τ entry names the physical row that wrote it. The step_fn's
    kernel consults it instead of assuming physically reordered caches
    (ops/transformer_decode._layer_math). Token-identical to the eager
    path (tests/test_nmt_transformer.py).
    """
    K = beam_size
    T = seq_length
    batch = jax.tree.leaves(state0)[0].shape[0]
    ctx = (_expand_to_beams(ctx, K, no_expand=ctx_no_expand)
           if ctx is not None else None)
    state = _expand_to_beams(state0, K)
    local_row = (jnp.arange(batch * K) % K).astype(jnp.int32)
    if ancestry_key is not None:
        # each row starts as its own ancestor at every position (row r
        # writes its position-t K/V into physical slot r)
        state[ancestry_key] = jnp.broadcast_to(
            local_row[:, None], (batch * K, state[ancestry_key].shape[-1]))

    cum = jnp.zeros((batch, K), jnp.float32)
    it = jnp.full((batch, K), bos_token, jnp.int32)
    seq_buf = jnp.zeros((batch, K, T), jnp.int32)
    logp_buf = jnp.zeros((batch, K, T), jnp.float32)
    aux_buf = (jnp.zeros((batch, K, T), jnp.int32)
               if record_aux_from_state else None)
    done = jnp.zeros((batch,), bool)
    arangeT = jnp.arange(T)

    def body(carry):
        t, state, cum, it, seq_buf, logp_buf, aux_buf, done = carry
        lp_flat, new_state = step_fn(params, ctx, state, it.reshape(batch * K))
        V = lp_flat.shape[-1]
        lp_flat = lp_flat.astype(jnp.float32)             # [B*K, V]
        aux_now = (record_aux_from_state(new_state).astype(jnp.int32)
                   .reshape(batch, K) if record_aux_from_state else None)

        # t=0: beamLk = wordLk[0] only (Beam.py:66-68). Selection runs on
        # the step's natural [B*K, V] layout (_flat_topk) — the [B, K, V]
        # reshape forces relayout copies in the decode loop.
        row_is_b0 = (jnp.arange(batch * K) % K) == 0
        row_mask = jnp.where(
            t == 0, jnp.where(row_is_b0, 0.0, NEG_INF),
            jnp.zeros((batch * K,)))
        total_flat = lp_flat + cum.reshape(batch * K, 1) + row_mask[:, None]

        sel_score, sel_idx = _flat_topk(total_flat, K, K)
        parent = sel_idx // V
        tok = (sel_idx % V).astype(jnp.int32)
        # total = lp + cum + row_mask with row_mask exactly 0.0 on any
        # selectable entry, so tok_lp == sel_score - cum[parent] (see
        # body_fast) — no [B, K*V] relayout/gather in the decode loop.
        tok_lp = sel_score - jnp.take_along_axis(cum, parent, axis=1)

        def reorder_write(buf, value):
            re = jnp.take_along_axis(buf, parent[..., None], axis=1)
            write = arangeT[None, None, :] == t
            return jnp.where(write, value[..., None], re)

        new_seq = reorder_write(seq_buf, tok)
        new_logp = reorder_write(logp_buf, tok_lp)
        new_aux = (reorder_write(aux_buf,
                                 jnp.take_along_axis(aux_now, parent, axis=1))
                   if record_aux_from_state else None)

        frz = done[:, None]
        cum = jnp.where(frz, cum, sel_score)
        it = jnp.where(frz, it, tok)
        seq_buf = jnp.where(frz[..., None], seq_buf, new_seq)
        logp_buf = jnp.where(frz[..., None], logp_buf, new_logp)
        if record_aux_from_state:
            aux_buf = jnp.where(frz[..., None], aux_buf, new_aux)

        # global state reorder (frozen sentences keep stepping but their
        # rows are never read again)
        base = (jnp.arange(batch) * K)[:, None]
        gather_idx = (base + parent).reshape(batch * K)

        def reorder_leaf(new_leaf, old_leaf):
            re = jnp.take(new_leaf, gather_idx, axis=0)
            mask = jnp.repeat(done, K).reshape(
                (batch * K,) + (1,) * (re.ndim - 1))
            return jnp.where(mask, old_leaf, re)

        if lazy_state or ancestry_key is not None:
            state_next = {}
            for key, new_leaf in new_state.items():
                if key in lazy_state:
                    # append-only cache: rows never move; frozen sentences'
                    # writes land in rows nothing reads through anc again
                    state_next[key] = new_leaf
                elif key == ancestry_key:
                    re = jnp.take(new_leaf, gather_idx, axis=0)
                    # the anc buffer may be longer than seq_length (cache
                    # T padded to the sublane tile) — use its own length
                    upd = jnp.where(
                        jnp.arange(new_leaf.shape[-1])[None, :] <= t, re,
                        local_row[:, None])
                    frz_rows = jnp.repeat(done, K)[:, None]
                    state_next[key] = jnp.where(frz_rows, state[key], upd)
                else:
                    state_next[key] = jax.tree.map(
                        reorder_leaf, new_leaf, state[key])
            state = state_next
        else:
            state = jax.tree.map(reorder_leaf, new_state, state)
        # EOS at top-of-beam finishes the sentence (Beam.py:83-85)
        done = jnp.logical_or(done, tok[:, 0] == eos_token)
        return (t + 1, state, cum, it, seq_buf, logp_buf, aux_buf, done)

    def cond(carry):
        t, done = carry[0], carry[-1]
        return jnp.logical_and(t < T, ~jnp.all(done))

    carry = (jnp.int32(0), state, cum, it, seq_buf, logp_buf, aux_buf, done)
    carry = jax.lax.while_loop(cond, body, carry)
    (_, _, cum, _, seq_buf, logp_buf, aux_buf, _) = carry
    return BeamResult(seq=seq_buf, logps=logp_buf, scores=cum, aux=aux_buf)
