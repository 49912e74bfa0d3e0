from unpaired_image_captioning_tpu.eval.metrics.ter import Ter, corpus_ter, ter


def test_exact_match_zero():
    assert ter("a b c".split(), ["a b c".split()]) == 0.0


def test_substitution():
    # one substitution over 4 ref tokens
    assert abs(ter("a b x d".split(), ["a b c d".split()]) - 0.25) < 1e-9


def test_shift_cheaper_than_edits():
    # "c d a b" -> shift block [c d] = 1 shift vs 4 subs
    score = ter("c d a b".split(), ["a b c d".split()])
    assert abs(score - 0.25) < 1e-9


def test_multi_reference_takes_best():
    refs = ["a b c".split(), "x y z w".split()]
    assert ter("x y z w".split(), refs) == 0.0


def test_corpus_and_api():
    hyps = ["a b c".split(), "x y".split()]
    refs = [["a b c".split()], ["x z".split()]]
    c = corpus_ter(hyps, refs)
    assert abs(c - (0 + 1) / (3 + 2)) < 1e-9
    mean, per = Ter().compute_score({1: ["a b"], 2: ["c d"]},
                                    {1: ["a b"], 2: ["c x"]})
    assert per[0] == 0.0 and abs(per[1] - 0.5) < 1e-9
