"""Metric stack tests: python scorers sanity + device CIDEr-D parity with
the host scorer (the golden-test pattern from SURVEY.md §4)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from unpaired_image_captioning_tpu.eval.metrics import (Bleu, Cider, CiderD,
                                                        Meteor, Rouge,
                                                        corpus_bleu,
                                                        sentence_bleu)
from unpaired_image_captioning_tpu.eval.metrics.cider import (compute_doc_freq,
                                                              precook)
from unpaired_image_captioning_tpu.ops import cider as dev_cider

GTS = {
    1: ["a man is riding a horse", "a person rides a brown horse",
        "a man on a horse"],
    2: ["two dogs play in the park", "dogs playing on grass"],
    3: ["a cat sits on a mat", "the cat is on the mat"],
}
RES = {
    1: ["a man is riding a horse"],
    2: ["a dog plays in the park"],
    3: ["a dog sits on the grass"],
}


def test_bleu_perfect_match_is_high():
    bleu = Bleu(4)
    scores, per_img = bleu.compute_score({1: GTS[1]}, {1: RES[1]})
    assert scores[0] > 0.99 and scores[3] > 0.99
    assert len(per_img[0]) == 1


def test_bleu_orders_quality():
    scores, per_img = Bleu(4).compute_score(GTS, RES)
    # exact match image should outscore the others per-image
    assert per_img[3][0] > per_img[3][1]
    assert per_img[3][0] > per_img[3][2]
    assert all(0 <= s <= 1 for s in scores)


def test_sentence_and_corpus_bleu():
    h = "a man is riding a horse".split()
    refs = [g.split() for g in GTS[1]]
    assert sentence_bleu(h, refs) > 0.99
    b, ps = corpus_bleu([h], [refs])
    assert b > 0.99 and len(ps) == 4


def test_rouge():
    mean, scores = Rouge().compute_score(GTS, RES)
    assert scores[0] > 0.99
    assert 0 < mean <= 1


def test_meteor():
    mean, scores = Meteor().compute_score(GTS, RES)
    assert scores[0] > 0.9
    assert scores[0] > scores[1]


def test_cider_exact_match_highest():
    mean, scores = CiderD().compute_score(GTS, RES)
    assert scores[0] == max(scores)
    mean2, scores2 = Cider().compute_score(GTS, RES)
    assert scores2[0] == max(scores2)


def _encode(sent, w2i, t=12):
    out = np.zeros((t,), np.int32)
    for i, w in enumerate(sent.split()[:t]):
        out[i] = w2i[w]
    return out


def test_device_cider_matches_host():
    """On-device hashed CIDEr-D == host dict-based CIDEr-D (same df table)."""
    vocab = sorted({w for v in list(GTS.values()) + list(RES.values())
                    for s in v for w in s.split()})
    w2i = {w: i + 1 for i, w in enumerate(vocab)}

    # df over the gts (like prepro_ngrams builds it over training refs)
    crefs = [[precook(r) for r in GTS[i]] for i in sorted(GTS)]
    df_words = compute_doc_freq(crefs)
    ref_len = float(len(crefs))
    host = CiderD(df=df_words, ref_len=math.log(ref_len))
    _, host_scores = host.compute_score(GTS, RES)

    df_ids = {tuple(w2i[w] for w in ng): v for ng, v in df_words.items()}
    table = dev_cider.build_df_table(df_ids, ref_len)

    ids = sorted(GTS)
    maxr = max(len(GTS[i]) for i in ids)
    cand = np.stack([_encode(RES[i][0], w2i) for i in ids])
    refs = np.zeros((len(ids), maxr, 12), np.int32)
    mask = np.zeros((len(ids), maxr), np.float32)
    for bi, i in enumerate(ids):
        for ri, rsent in enumerate(GTS[i]):
            refs[bi, ri] = _encode(rsent, w2i)
            mask[bi, ri] = 1.0
    dev_scores = dev_cider.cider_d(jnp.asarray(cand), jnp.asarray(refs),
                                   jnp.asarray(mask), table)
    np.testing.assert_allclose(np.asarray(dev_scores), host_scores,
                               rtol=1e-4, atol=1e-4)


def test_device_bleu_reasonable():
    vocab = sorted({w for v in list(GTS.values()) + list(RES.values())
                    for s in v for w in s.split()})
    w2i = {w: i + 1 for i, w in enumerate(vocab)}
    ids = sorted(GTS)
    maxr = max(len(GTS[i]) for i in ids)
    cand = np.stack([_encode(RES[i][0], w2i) for i in ids])
    refs = np.zeros((len(ids), maxr, 12), np.int32)
    mask = np.zeros((len(ids), maxr), np.float32)
    for bi, i in enumerate(ids):
        for ri, rsent in enumerate(GTS[i]):
            refs[bi, ri] = _encode(rsent, w2i)
            mask[bi, ri] = 1.0
    b = np.asarray(dev_cider.bleu4(jnp.asarray(cand), jnp.asarray(refs),
                                   jnp.asarray(mask)))
    assert b[0] > 0.99          # exact match
    assert (b >= 0).all() and (b <= 1).all()
    assert b[0] > b[1]


def test_scst_advantage():
    from unpaired_image_captioning_tpu.losses.rewards import (
        get_self_critical_reward)

    vocab = sorted({w for v in list(GTS.values()) + list(RES.values())
                    for s in v for w in s.split()})
    w2i = {w: i + 1 for i, w in enumerate(vocab)}
    crefs = [[precook(r) for r in GTS[i]] for i in sorted(GTS)]
    df_words = compute_doc_freq(crefs)
    df_ids = {tuple(w2i[w] for w in ng): v for ng, v in df_words.items()}
    table = dev_cider.build_df_table(df_ids, float(len(crefs)))

    ids = sorted(GTS)
    maxr = max(len(GTS[i]) for i in ids)
    refs = np.zeros((len(ids), maxr, 12), np.int32)
    mask = np.zeros((len(ids), maxr), np.float32)
    for bi, i in enumerate(ids):
        for ri, rsent in enumerate(GTS[i]):
            refs[bi, ri] = _encode(rsent, w2i)
            mask[bi, ri] = 1.0
    # sample = exact match, greedy = a worse caption
    sample = np.stack([_encode(GTS[i][0], w2i) for i in ids])
    greedy = np.stack([_encode("a a a", w2i) for i in ids])
    adv, rs = get_self_critical_reward(jnp.asarray(sample), jnp.asarray(greedy),
                                       jnp.asarray(refs), jnp.asarray(mask),
                                       table)
    assert adv.shape == sample.shape
    assert (np.asarray(adv)[:, 0] > 0).all()   # sample better than greedy
    assert (np.asarray(rs) > 0).all()


def test_spice_standin():
    from unpaired_image_captioning_tpu.eval.metrics.spice import Spice, _tuples

    t = _tuples("a furry cat sits on the red mat")
    assert ("cat",) in t and ("mat", "red") in t
    assert any(len(x) == 3 and x[1] == "on" for x in t)
    mean, per = Spice().compute_score(GTS, RES)
    # exact match scores highest (F1 < 1 because recall is vs the tuple
    # UNION over references, as in SPICE proper)
    assert per[0] == max(per) and per[0] > 0.5
    assert 0 <= mean <= 1


def test_meteor_synonym_paraphrase_stages(tmp_path):
    """METEOR stages 3/4: synonym matches via shared synset groups,
    paraphrase matches over multi-word spans; empty tables leave scores at
    the exact+stem baseline; file loaders round-trip."""
    from unpaired_image_captioning_tpu.eval.metrics.meteor import (
        Meteor, build_paraphrase_table, build_synonym_groups,
        load_paraphrases, load_synonyms, meteor_score)

    refs = ["a large dog runs across the field"]
    hyp_syn = "a big dog runs across the field"       # big ~ large
    hyp_par = "a large dog runs across the meadow of grass"  # paraphrase

    base_syn = meteor_score(hyp_syn, refs)
    syn = build_synonym_groups([["big", "large", "huge"]])
    assert meteor_score(hyp_syn, refs, synonyms=syn) > base_syn
    # unrelated synsets do not match
    syn2 = build_synonym_groups([["big", "huge"], ["large", "vast"]])
    assert meteor_score(hyp_syn, refs, synonyms=syn2) == base_syn

    base_par = meteor_score(hyp_par, refs)
    par = build_paraphrase_table([("field", "meadow of grass")])
    s_par = meteor_score(hyp_par, refs, paraphrases=par)
    assert s_par > base_par
    # symmetric: swapping hyp/ref phrase directions also matches
    assert meteor_score("a large dog runs across the field",
                        ["a large dog runs across the meadow of grass"],
                        paraphrases=par) > base_par

    # file loaders
    sp = tmp_path / "syn.txt"
    sp.write_text("big large huge\n")
    pp = tmp_path / "par.tsv"
    pp.write_text("field\tmeadow of grass\n")
    m = Meteor(synonyms=load_synonyms(str(sp)),
               paraphrases=load_paraphrases(str(pp)))
    mean, scores = m.compute_score({0: refs}, {0: [hyp_syn]})
    assert mean == scores[0] > base_syn

    # perfect match still scores high and stays <= 1
    s = meteor_score("a large dog runs across the field", refs,
                     synonyms=syn, paraphrases=par)
    assert 0.9 < s <= 1.0


def test_porter_vectors():
    """Full Porter stemmer vs the published end-to-end vectors (Porter 1980
    examples run through the WHOLE algorithm, incl. the author's two
    standard departures bli->ble / logi->log)."""
    from unpaired_image_captioning_tpu.eval.metrics.porter import porter_stem

    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "radicalli": "radic", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin",
        "gyroscopic": "gyroscop", "adjustable": "adjust",
        "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "communism": "commun",
        "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
        "abilities": "abil", "running": "run", "riding": "ride",
        "skiing": "ski", "women": "women",
    }
    bad = {w: (porter_stem(w), want) for w, want in vectors.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_meteor_default_mini_tables():
    """Meteor() ships with the bundled mini synonym/paraphrase tables so
    stages 3/4 are exercised by default; {} disables them."""
    refs = ["a large dog is sitting next to a bicycle"]
    hyp = "a big dog sits beside a bike"
    on = Meteor()
    off = Meteor(synonyms={}, paraphrases={})
    s_on = on.compute_score({0: refs}, {0: [hyp]})[0]
    s_off = off.compute_score({0: refs}, {0: [hyp]})[0]
    assert s_on > s_off  # big~large, bicycle~bike, "next to"~"beside"
