"""ROUGE-L scorer.

Behavioral parity with `coco-caption/pycocoevalcap/rouge/rouge.py`:
LCS-based F-measure with beta=1.2, per image the max over references.
"""

from __future__ import annotations

from typing import Dict, List, Tuple


def _lcs_len(a: List[str], b: List[str]) -> int:
    if not a or not b:
        return 0
    # O(len(a)*len(b)) DP with two rows
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


class Rouge:
    def __init__(self, beta: float = 1.2):
        self.beta = beta

    def calc_score(self, candidate: List[str], refs: List[str]) -> float:
        hyp = candidate[0].split()
        best = 0.0
        for ref in refs:
            r = ref.split()
            lcs = _lcs_len(hyp, r)
            prec = lcs / len(hyp) if hyp else 0.0
            rec = lcs / len(r) if r else 0.0
            if prec != 0 and rec != 0:
                score = ((1 + self.beta ** 2) * prec * rec
                         / (rec + self.beta ** 2 * prec))
            else:
                score = 0.0
            best = max(best, score)
        return best

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        ids = sorted(gts.keys())
        scores = [self.calc_score(res[i], gts[i]) for i in ids]
        return sum(scores) / max(len(scores), 1), scores

    def method(self):
        return "Rouge"
