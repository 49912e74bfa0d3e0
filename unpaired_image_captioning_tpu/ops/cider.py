"""On-device CIDEr-D and BLEU-4 for SCST rewards.

The reference computes SCST rewards on host: sampled ids are copied to CPU,
stringified, and scored by the Python CiderD stack every step
(`misc/rewards.py:51-66`, `ciderD_scorer.py:116-197`) — a device→host
round-trip in the middle of the hot RL loop. Here the whole reward is a
tensor program:

- n-grams (n=1..4) are identified by two independent 32-bit rolling hashes
  of the token window (collision probability ~2^-64 per comparison — vocab
  and caption lengths make real collisions negligible);
- the `prepro_ngrams` document-frequency pickle becomes a device-resident
  open-addressing hash table (`DfTable`) probed inside the kernel;
- per-sentence tf counts, idf weights, norms, and the clipped tf-idf cosine
  of CIDEr-D (with its gaussian length penalty, sigma=6, ×10 scale) are
  O(T²) comparison matrices — trivially small for T<=20 and fully batched
  over [batch, refs].

Exact semantics mirrored from ciderD_scorer.py: vec[n][g] = tf * (log N -
log df), length = bigram tf total, sim uses min(vec_h, vec_r)·vec_r, score
= 10 × mean_n mean_refs.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_N = 4
SIGMA = 6.0
_P1 = np.uint32(1000003)
_P2 = np.uint32(16777619)
_PROBES = 16


def _host_hash(ngram: Tuple[int, ...]) -> Tuple[int, int]:
    mask = 0xFFFFFFFF
    p1, p2 = int(_P1), int(_P2)
    h1, h2 = 2166136261, 5381
    for tok in ngram:
        t = (tok + 1) & mask
        h1 = ((h1 * p1) & mask) ^ t
        h2 = ((h2 * p2) + t) & mask
    # mix in the n-gram order so (a,) and (a,pad) can't alias
    h1 = ((h1 * p1) & mask) ^ len(ngram)
    h2 = ((h2 * p2) + len(ngram)) & mask
    return h1, h2


class DfTable(NamedTuple):
    """Open-addressing df table as device tensors."""

    h1: jax.Array      # [M] uint32 key hash 1 (probe start)
    h2: jax.Array      # [M] uint32 key hash 2 (verify + probe step)
    df: jax.Array      # [M] float32 document frequency
    log_ref_len: float  # log(#reference docs) for idf

    @property
    def size(self) -> int:
        return self.h1.shape[0]


def build_df_table(document_frequency: Dict[Tuple[int, ...], float],
                   ref_len: float) -> DfTable:
    """Host-side: ngram-id-tuple -> df mapping to a device hash table.

    `document_frequency` is the prepro_ngrams artifact keyed by token-id
    tuples; `ref_len` is the raw document count N (idf uses log N - log df).
    """
    m = max(8, 1 << int(np.ceil(np.log2(max(1, len(document_frequency)) * 2 + 1))))
    h1s = np.zeros((m,), np.uint32)
    h2s = np.zeros((m,), np.uint32)
    dfs = np.zeros((m,), np.float32)
    used = np.zeros((m,), bool)
    for ngram, df in document_frequency.items():
        a, b = _host_hash(tuple(int(t) for t in ngram))
        idx = a % m
        step = (b | 1) % m or 1
        for _ in range(m):
            if not used[idx]:
                used[idx] = True
                h1s[idx] = a
                h2s[idx] = b
                dfs[idx] = df
                break
            if h1s[idx] == a and h2s[idx] == b:
                break  # duplicate key
            idx = (idx + step) % m
    return DfTable(jnp.asarray(h1s), jnp.asarray(h2s), jnp.asarray(dfs),
                   float(np.log(max(1.0, ref_len))))


def empty_df_table() -> DfTable:
    """Corpus-mode placeholder (df computed from the batch gts is NOT
    supported on device; train-time SCST always has the prepro table)."""
    return DfTable(jnp.zeros((8,), jnp.uint32), jnp.zeros((8,), jnp.uint32),
                   jnp.zeros((8,), jnp.float32), 0.0)


def _df_lookup(table: DfTable, h1, h2):
    """Batched probe: returns df (0.0 when absent). h1/h2: any shape uint32."""
    m = table.size

    def probe(i, state):
        found, idx = state
        k1 = table.h1[idx]
        k2 = table.h2[idx]
        hit = jnp.logical_and(k1 == h1, k2 == h2)
        val = jnp.where(hit, table.df[idx], found)
        step = (h2 | jnp.uint32(1)) % jnp.uint32(m)
        step = jnp.maximum(step, jnp.uint32(1))
        nxt = (idx + step) % jnp.uint32(m)
        return val, jnp.where(hit, idx, nxt)

    idx0 = (h1 % jnp.uint32(m)).astype(jnp.uint32)
    found0 = jnp.zeros(h1.shape, jnp.float32)
    val, _ = jax.lax.fori_loop(0, _PROBES, probe, (found0, idx0))
    return val


def ngram_hashes(seq, n: int):
    """seq: [..., T] int32 (0-padded). Returns (h1, h2, valid) each [..., T]
    where position i covers tokens i..i+n-1."""
    t = seq.shape[-1]
    h1 = jnp.full(seq.shape, 2166136261, jnp.uint32)
    h2 = jnp.full(seq.shape, 5381, jnp.uint32)
    valid = jnp.ones(seq.shape, bool)
    for j in range(n):
        tok = jnp.roll(seq, -j, axis=-1) if j else seq
        # positions beyond T-j wrap — masked below via index bound
        tu = (tok + 1).astype(jnp.uint32)
        h1 = (h1 * _P1) ^ tu
        h2 = (h2 * _P2) + tu
        valid = jnp.logical_and(valid, tok > 0)
    h1 = (h1 * _P1) ^ jnp.uint32(n)
    h2 = (h2 * _P2) + jnp.uint32(n)
    pos_ok = jnp.arange(t) <= t - n
    valid = jnp.logical_and(valid, pos_ok)
    return h1, h2, valid


def _sentence_stats(seq, n: int, table: DfTable):
    """Per-sentence n-gram stats. seq: [B, T].

    Returns dict with h1,h2 [B,T], canonical tf counts, idf-weighted vec
    values g [B,T] (0 at non-canonical/invalid slots), norm [B], and the
    tf-weight per slot.
    """
    h1, h2, valid = ngram_hashes(seq, n)
    eq = jnp.logical_and(h1[..., :, None] == h1[..., None, :],
                         h2[..., :, None] == h2[..., None, :])
    eq = jnp.logical_and(eq, valid[..., None, :])
    eq = jnp.logical_and(eq, valid[..., :, None])
    tf = jnp.sum(eq, axis=-1).astype(jnp.float32)            # [B, T]
    t = seq.shape[-1]
    lower = jnp.tril(jnp.ones((t, t), bool), k=-1)
    dup_before = jnp.any(jnp.logical_and(eq, lower), axis=-1)
    canonical = jnp.logical_and(valid, jnp.logical_not(dup_before))
    df = _df_lookup(table, h1, h2)
    idf = table.log_ref_len - jnp.log(jnp.maximum(1.0, df))
    g = jnp.where(canonical, tf * idf, 0.0)                  # [B, T]
    norm = jnp.sqrt(jnp.sum(g * g, axis=-1))
    return {"h1": h1, "h2": h2, "canonical": canonical, "tf": tf,
            "idf": idf, "g": g, "norm": norm, "valid": valid}


def _pair_sim(cand, ref):
    """Clipped tf-idf dot between candidate and reference stats ([B,T] each).

    For each canonical candidate slot, find the matching canonical ref slot
    (same n-gram) and accumulate min(g_c, g_r) * g_r.
    """
    match = jnp.logical_and(
        cand["h1"][..., :, None] == ref["h1"][..., None, :],
        cand["h2"][..., :, None] == ref["h2"][..., None, :])
    match = jnp.logical_and(match, ref["canonical"][..., None, :])
    match = jnp.logical_and(match, cand["canonical"][..., :, None])
    tf_r = jnp.sum(jnp.where(match, ref["tf"][..., None, :], 0.0), axis=-1)
    g_r = tf_r * cand["idf"]     # same ngram -> same idf
    num = jnp.sum(jnp.minimum(cand["g"], g_r) * g_r, axis=-1)
    denom = cand["norm"] * ref["norm"]
    return jnp.where(denom > 0, num / jnp.maximum(denom, 1e-12), 0.0)


def cider_d(cand_seq, ref_seqs, ref_mask, table: DfTable):
    """CIDEr-D scores. cand_seq: [B, T]; ref_seqs: [B, R, Tr]; ref_mask:
    [B, R] 1 for real references. Returns [B] float32 (×10 scaled)."""
    b, r = ref_seqs.shape[:2]
    score = jnp.zeros((b,), jnp.float32)
    # length for the gaussian penalty = bigram tf total (ciderD parity)
    _, _, c_bi = ngram_hashes(cand_seq, 2)
    len_c = jnp.sum(c_bi, axis=-1).astype(jnp.float32)
    for n in range(1, MAX_N + 1):
        c = _sentence_stats(cand_seq, n, table)
        rs = _sentence_stats(ref_seqs.reshape(b * r, -1), n, table)
        rs = jax.tree.map(lambda x: x.reshape((b, r) + x.shape[1:]), rs)
        _, _, r_bi = ngram_hashes(ref_seqs.reshape(b * r, -1), 2)
        len_r = jnp.sum(r_bi, axis=-1).astype(jnp.float32).reshape(b, r)
        c_exp = jax.tree.map(lambda x: jnp.broadcast_to(
            x[:, None], (b, r) + x.shape[1:]), c)
        sim = _pair_sim(c_exp, rs)                           # [B, R]
        delta = len_c[:, None] - len_r
        sim = sim * jnp.exp(-(delta ** 2) / (2 * SIGMA ** 2))
        sim = jnp.where(ref_mask > 0, sim, 0.0)
        n_refs = jnp.maximum(jnp.sum(ref_mask, axis=-1), 1.0)
        score = score + jnp.sum(sim, axis=-1) / n_refs
    return score / MAX_N * 10.0


def bleu4(cand_seq, ref_seqs, ref_mask):
    """Per-sentence smoothed BLEU-4 on device (reward use; the reference's
    Bleu(4) per-image scores use +1 smoothing for n>=2)."""
    b, r = ref_seqs.shape[:2]
    tiny = 1e-9
    logsum = jnp.zeros((b,), jnp.float32)
    bleu = None
    # lengths
    len_c = jnp.sum(cand_seq > 0, axis=-1).astype(jnp.float32)
    len_r = jnp.sum(ref_seqs > 0, axis=-1).astype(jnp.float32)  # [B, R]
    big = jnp.where(ref_mask > 0, jnp.abs(len_r - len_c[:, None]), 1e9)
    closest = jnp.take_along_axis(len_r, jnp.argmin(big, -1)[:, None], 1)[:, 0]
    for n in range(1, MAX_N + 1):
        c1, c2, cv = ngram_hashes(cand_seq, n)
        r1, r2, rv = ngram_hashes(ref_seqs.reshape(b * r, -1), n)
        r1 = r1.reshape(b, r, -1)
        r2 = r2.reshape(b, r, -1)
        rv = rv.reshape(b, r, -1)
        # candidate tf and canonical slots
        eq = jnp.logical_and(c1[:, :, None] == c1[:, None, :],
                             c2[:, :, None] == c2[:, None, :])
        eq = jnp.logical_and(jnp.logical_and(eq, cv[:, None, :]), cv[:, :, None])
        tf_c = jnp.sum(eq, -1).astype(jnp.float32)
        t = cand_seq.shape[-1]
        lower = jnp.tril(jnp.ones((t, t), bool), k=-1)
        canon = jnp.logical_and(cv, ~jnp.any(jnp.logical_and(eq, lower), -1))
        # per-ref tf of each candidate ngram, clipped count = max over refs
        m = jnp.logical_and(c1[:, None, :, None] == r1[:, :, None, :],
                            c2[:, None, :, None] == r2[:, :, None, :])
        m = jnp.logical_and(m, rv[:, :, None, :])
        tf_r = jnp.sum(m, -1).astype(jnp.float32)            # [B, R, T]
        tf_r = jnp.where(ref_mask[..., None] > 0, tf_r, 0.0)
        tf_max = jnp.max(tf_r, axis=1)                       # [B, T]
        clipped = jnp.sum(jnp.where(canon, jnp.minimum(tf_c, tf_max), 0.0), -1)
        total = jnp.sum(cv, -1).astype(jnp.float32)
        add = 1.0 if n >= 2 else 0.0
        p = (clipped + add) / jnp.maximum(total + add, tiny)
        p = jnp.where(total > 0, p, tiny)
        logsum = logsum + jnp.log(jnp.maximum(p, tiny))
        if n == MAX_N:
            ratio = len_c / jnp.maximum(closest, tiny)
            bp = jnp.where(ratio > 1.0, 1.0, jnp.exp(1.0 - 1.0 / jnp.maximum(ratio, tiny)))
            bleu = jnp.exp(logsum / MAX_N) * bp
    return bleu
