"""C++ native library tests: PTB tokenizer, BLEU counts, METEOR align,
integral-image query — C++ vs Python fallback parity."""

import numpy as np
import pytest

from unpaired_image_captioning_tpu import native


def test_native_builds():
    assert native.has_native(), "libuic_native.so should build via make"


def test_ptb_tokenize():
    out = native.ptb_tokenize("A man's hat, isn't it?")
    toks = out.split()
    assert "man" in toks and "'s" in toks
    assert "n't" in toks
    # ',' '?' are in the coco PUNCTUATIONS drop list
    assert "," not in toks and "?" not in toks
    assert toks[0] == "a"  # lowercased


def test_ptb_tokenize_drops_coco_punct():
    out = native.ptb_tokenize("hello , world . okay")
    assert out == "hello world okay"


def test_ptb_tokenizer_api():
    tok = native.PTBTokenizer()
    out = tok.tokenize({1: [{"caption": "A Dog runs."}]})
    assert out[1] == ["a dog runs"]


def test_bleu_counts_matches_python():
    hyp = [1, 2, 3, 4, 2, 3]
    refs = [[1, 2, 3, 5], [2, 3, 4, 2]]
    c, t, closest = native.bleu_counts(hyp, refs)
    # manual: unigram hyp counts {1:1,2:2,3:2,4:1}; ref max {1:1,2:2,3:1,4:1,5:1}
    assert t[0] == 6 and c[0] == 1 + 2 + 1 + 1
    assert closest in (4,)
    # cross-check against the pure-python scorer
    from unpaired_image_captioning_tpu.eval.metrics.bleu import _clip_counts

    hl = [str(x) for x in hyp]
    rl = [[str(x) for x in r] for r in refs]
    for n in range(1, 5):
        cc, tt = _clip_counts(hl, rl, n)
        assert c[n - 1] == cc and t[n - 1] == tt


def test_meteor_align():
    m, ch = native.meteor_align([1, 2, 3, 9], [1, 2, 3, 4])
    assert m == 3 and ch == 1
    m, ch = native.meteor_align([3, 1, 2], [1, 2, 3])
    assert m == 3 and ch == 2


def test_query_integral_image():
    # occupancy image: a 10x10 grid with a filled 5x5 top-left block
    occ = np.zeros((10, 10), np.uint32)
    occ[:5, :5] = 1
    integral = occ.cumsum(0).cumsum(1).astype(np.uint32)
    pos = native.query_integral_image(integral, 3, 3, 0)
    assert pos is not None
    x, y = pos
    # box must not overlap the filled block
    assert x + 3 >= 5 or y + 3 >= 5 or (x >= 5 or y >= 5)
    # full image -> no position
    occ2 = np.ones((8, 8), np.uint32)
    integral2 = occ2.cumsum(0).cumsum(1).astype(np.uint32)
    assert native.query_integral_image(integral2, 3, 3, 0) is None
