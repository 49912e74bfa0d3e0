"""BLEU: COCO-caption-style corpus BLEU-1..4.

Behavioral parity with `coco-caption/pycocoevalcap/bleu/bleu_scorer.py`
(Chin-Yew Lin's "closest reference length" corpus BLEU with the COCO
`option='closest'` and the small-ratio smoothing on per-image scores):

- corpus level: clipped n-gram precision p_n = Σ_i clip_i / Σ_i count_i,
  brevity penalty from Σ closest-ref-lengths, score_n = BP · (Π p_k)^(1/n);
- per-image scores use +1 smoothing on numerator/denominator for n >= 2
  (the `small` constant path), matching the `ratio` trick in the COCO code.

Also exposes `sentence_bleu` (used by SelfBleu, misc/cal_self_bleu.py) and
`corpus_bleu` in multi-bleu.perl style (used by the NMT eval wrapper,
misc/OpenNMT-py-dalegebit/evaluation.py:29-48).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence, Tuple


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def _clip_counts(hyp: Sequence[str], refs: List[Sequence[str]], n: int):
    h = _ngrams(hyp, n)
    if not h:
        return 0, 0
    r: Counter = Counter()
    for ref in refs:
        for k, v in _ngrams(ref, n).items():
            r[k] = max(r[k], v)
    clipped = sum(min(v, r.get(k, 0)) for k, v in h.items())
    return clipped, sum(h.values())


def _closest_ref_len(hyp_len: int, ref_lens: List[int]) -> int:
    return min(ref_lens, key=lambda rl: (abs(rl - hyp_len), rl))


class Bleu:
    """COCO-caption API: compute_score(gts, res) -> (list of 4 floats,
    list of 4 per-image lists)."""

    def __init__(self, n: int = 4):
        self.n = n

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[List[float], List[List[float]]]:
        assert sorted(gts.keys()) == sorted(res.keys())
        ids = sorted(gts.keys())
        small = 1e-9
        tiny = 1e-15

        totals = [[0, 0] for _ in range(self.n)]  # clipped, total per n
        hyp_len_sum = 0
        ref_len_sum = 0
        per_image: List[List[float]] = [[] for _ in range(self.n)]

        stats = []
        for iid in ids:
            hyp = res[iid][0].split()
            refs = [r.split() for r in gts[iid]]
            row = []
            for k in range(self.n):
                c, t = _clip_counts(hyp, refs, k + 1)
                totals[k][0] += c
                totals[k][1] += t
                row.append((c, t))
            hl = len(hyp)
            rl = _closest_ref_len(hl, [len(r) for r in refs])
            hyp_len_sum += hl
            ref_len_sum += rl
            stats.append((row, hl, rl))

        # per-image scores (+1 smoothing for n>=2, COCO bleu_scorer ratio trick)
        for row, hl, rl in stats:
            ratio = hl / (rl + tiny)
            bp = 1.0 if ratio > 1.0 else math.exp(1 - 1 / (ratio + tiny))
            logsum = 0.0
            for k, (c, t) in enumerate(row):
                add = 1 if k >= 1 else 0
                p = (c + add) / (t + add + tiny) if (t + add) > 0 else 0.0
                logsum += math.log(max(p, tiny))
                per_image[k].append(math.exp(logsum / (k + 1)) * bp)

        ratio = hyp_len_sum / (ref_len_sum + tiny)
        bp = 1.0 if ratio > 1.0 else math.exp(1 - 1 / (ratio + tiny))
        scores = []
        logsum = 0.0
        for k in range(self.n):
            c, t = totals[k]
            p = c / (t + tiny) if t > 0 else 0.0
            logsum += math.log(max(p, tiny))
            scores.append(math.exp(logsum / (k + 1)) * bp)
        return scores, per_image

    def method(self):
        return "Bleu"


def sentence_bleu(hyp: Sequence[str], refs: List[Sequence[str]], n: int = 4,
                  smooth: float = 1.0) -> float:
    """Smoothed sentence BLEU (SelfBleu parity, misc/utils.py:85-103 uses
    nltk method1-style smoothing: +eps on zero counts)."""
    if not hyp:
        return 0.0
    logsum = 0.0
    for k in range(1, n + 1):
        c, t = _clip_counts(hyp, refs, k)
        if t == 0:
            return 0.0
        p = c / t if c > 0 else smooth / t
        logsum += math.log(p)
    rl = _closest_ref_len(len(hyp), [len(r) for r in refs])
    bp = 1.0 if len(hyp) >= rl else math.exp(1 - rl / len(hyp))
    return bp * math.exp(logsum / n)


def corpus_bleu(hyps: List[Sequence[str]], refs_list: List[List[Sequence[str]]],
                n: int = 4) -> Tuple[float, List[float]]:
    """multi-bleu.perl-style corpus BLEU. Returns (bleu, [p_1..p_n])."""
    tiny = 1e-15
    clipped = [0] * n
    total = [0] * n
    hyp_len = 0
    ref_len = 0
    for hyp, refs in zip(hyps, refs_list):
        for k in range(1, n + 1):
            c, t = _clip_counts(hyp, refs, k)
            clipped[k - 1] += c
            total[k - 1] += t
        hyp_len += len(hyp)
        ref_len += _closest_ref_len(len(hyp), [len(r) for r in refs])
    precisions = [clipped[k] / (total[k] + tiny) for k in range(n)]
    if min(precisions) <= 0:
        return 0.0, precisions
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    bleu = bp * math.exp(sum(math.log(p) for p in precisions) / n)
    return bleu, precisions
