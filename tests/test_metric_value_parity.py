"""Metric VALUE parity against the reference's own vendored scorers.

The reference vendors pure-Python BLEU / CIDEr / ROUGE-L
(`coco-caption/pycocoevalcap/{bleu/bleu_scorer.py,cider/cider_scorer.py,
rouge/rouge.py}`). These are python-2 sources, so a small textual shim
(xrange -> range, .iteritems() -> .items(), print stmt -> fn) loads them
into py3 namespaces — NO logic is changed, the executed code is the
reference's own. Our scorers must match to 1e-9 on a few hundred varied
caption pairs, with our PTB tokenizer in the loop producing the shared
token streams (the reference's Java tokenizer jar is stripped upstream, so
tokenization itself is pinned by tests/test_native.py golden cases; here
both sides score identical tokenized inputs). VERDICT r1 "Next" #2.
"""

import math
import re
from pathlib import Path

import numpy as np
import pytest

from unpaired_image_captioning_tpu.eval.metrics.bleu import Bleu
from unpaired_image_captioning_tpu.eval.metrics.cider import Cider
from unpaired_image_captioning_tpu.eval.metrics.rouge import Rouge
from unpaired_image_captioning_tpu.native import ptb_tokenize

REF = Path("/root/reference/pivot_based_eccv2018/coco-caption/pycocoevalcap")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not present")


def _load_ref_module(relpath: str, inject=None) -> dict:
    """Exec a reference py2 scorer source in a py3 namespace via a purely
    textual shim; returns the module namespace."""
    src = (REF / relpath).read_text()
    src = src.replace("xrange", "range")
    src = src.replace(".iteritems()", ".items()")
    # py2 print statements appear only on debug paths; make them py3-legal
    src = re.sub(r"^(\s*)print ([^(].*)$", r"\1print(\2)", src, flags=re.M)
    # py2 tuple parameter (bleu_scorer.py:60) -> explicit unpack
    src = src.replace(
        "def cook_test(test, (reflen, refmaxcounts), eff=None, n=4):",
        "def cook_test(test, _packed, eff=None, n=4):\n"
        "    (reflen, refmaxcounts) = _packed")
    ns = dict(inject or {})
    exec(compile(src, str(REF / relpath), "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def ref_scorers():
    bleu_ns = _load_ref_module("bleu/bleu_scorer.py")
    cider_ns = _load_ref_module("cider/cider_scorer.py")
    rouge_ns = _load_ref_module("rouge/rouge.py")
    return {"BleuScorer": bleu_ns["BleuScorer"],
            "CiderScorer": cider_ns["CiderScorer"],
            "Rouge": rouge_ns["Rouge"]}


WORDS = ("a the man woman dog cat red blue holding riding on in of with "
         "street park ball frisbee table plate food pizza skis snow water "
         "group people standing sitting next to near large small two three "
         "white black green train bus car sign tree sky grass field room").split()
PUNCT_TAILS = ["", ".", " .", "!", ", really.", " (maybe)", '"quoted"',
               "; done", " -- yes", "'s"]


def _make_pairs(n_images=250, seed=7):
    """Varied caption pairs incl. edge cases: 1-word hyps, hyp == ref,
    unseen words, long/short mismatches, repeated tokens, punctuation
    through the PTB tokenizer."""
    rng = np.random.RandomState(seed)
    gts, res = {}, {}
    for i in range(n_images):
        key = str(i)
        n_refs = int(rng.randint(1, 6))

        def sent(lo=1, hi=18):
            k = int(rng.randint(lo, hi))
            toks = [WORDS[j] for j in rng.randint(0, len(WORDS), k)]
            if rng.rand() < 0.2:  # repeated-token runs
                toks = toks + toks[: max(1, k // 2)]
            raw = " ".join(toks) + PUNCT_TAILS[int(rng.randint(len(PUNCT_TAILS)))]
            return ptb_tokenize(raw)

        refs = [sent() for _ in range(n_refs)]
        if i % 17 == 0:
            hyp = refs[0]                      # exact match
        elif i % 17 == 1:
            hyp = ptb_tokenize("zebra")        # 1 word, unseen in refs
        elif i % 17 == 2:
            hyp = sent(1, 3)                   # much shorter than refs
        elif i % 17 == 3:
            hyp = sent(15, 20)                 # long
        else:
            hyp = sent()
        gts[key] = refs
        res[key] = [hyp]
    return gts, res


@pytest.fixture(scope="module")
def pairs():
    return _make_pairs()


def test_bleu_value_parity(ref_scorers, pairs):
    gts, res = pairs
    # reference calling convention (bleu.py:38-59): sorted ids, closest len
    scorer = ref_scorers["BleuScorer"](n=4)
    for k in sorted(gts.keys()):
        scorer += (res[k][0], gts[k])
    ref_score, ref_scores = scorer.compute_score(option="closest", verbose=0)
    our_score, our_scores = Bleu(4).compute_score(gts, res)
    for n in range(4):
        assert math.isclose(our_score[n], ref_score[n], rel_tol=0, abs_tol=1e-9), (
            f"Bleu_{n + 1}: {our_score[n]} vs {ref_score[n]}")
        np.testing.assert_allclose(np.asarray(our_scores[n]),
                                   np.asarray(ref_scores[n]), atol=1e-9)


def test_cider_value_parity(ref_scorers, pairs):
    gts, res = pairs
    scorer = ref_scorers["CiderScorer"](n=4, sigma=6.0)
    for k in sorted(gts.keys()):
        scorer += (res[k][0], gts[k])
    ref_score, ref_scores = scorer.compute_score()
    our_score, our_scores = Cider().compute_score(gts, res)
    assert math.isclose(our_score, ref_score, rel_tol=0, abs_tol=1e-9), (
        f"CIDEr: {our_score} vs {ref_score}")
    np.testing.assert_allclose(np.asarray(our_scores),
                               np.asarray(ref_scores), atol=1e-9)


def test_rouge_value_parity(ref_scorers, pairs):
    gts, res = pairs
    ref_score, ref_scores = ref_scorers["Rouge"]().compute_score(
        {k: gts[k] for k in sorted(gts)}, {k: res[k] for k in sorted(res)})
    our_score, our_scores = Rouge().compute_score(gts, res)
    assert math.isclose(our_score, ref_score, rel_tol=0, abs_tol=1e-9), (
        f"ROUGE_L: {our_score} vs {ref_score}")
    np.testing.assert_allclose(np.asarray(our_scores),
                               np.asarray(ref_scores), atol=1e-9)
