"""Golden format test: our cached eval jsons carry the same schema as the
reference's checked-in artifacts (eval_results/*.json — overall +
imgToEval with the same metric keys), so downstream tooling ports 1:1.
SURVEY.md §7.2 step 3."""

import json

from unpaired_image_captioning_tpu.eval.eval_utils import language_eval

REFERENCE_OVERALL_KEYS = {"CIDEr", "Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                          "ROUGE_L", "METEOR"}


def test_eval_results_schema(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    refs = {10: ["a man rides a horse", "a person on a horse"],
            11: ["two dogs play"]}
    preds = [{"image_id": 10, "caption": "a man rides a horse"},
             {"image_id": 11, "caption": "two dogs run"}]
    overall = language_eval("zh", preds, "golden", "val", references=refs)

    assert REFERENCE_OVERALL_KEYS <= set(overall.keys())
    cached = json.load(open("eval_results/zh_golden_val.json"))
    assert set(cached.keys()) == {"overall", "imgToEval"}
    assert REFERENCE_OVERALL_KEYS <= set(cached["overall"].keys())
    for iid, entry in cached["imgToEval"].items():
        # same per-image keys as the reference artifacts (incl. image_id)
        assert REFERENCE_OVERALL_KEYS | {"image_id"} <= set(entry.keys())


def test_eval_results_schema_with_spice(tmp_path, monkeypatch):
    """spice=True (the coco route's flag) adds the SPICE column to overall
    AND per-image entries (ref pycocoevalcap/eval.py:9-40); off by default
    since our Spice is a documented stand-in."""
    monkeypatch.chdir(tmp_path)
    refs = {10: ["a man rides a horse"], 11: ["two dogs play"]}
    preds = [{"image_id": 10, "caption": "a man rides a horse"},
             {"image_id": 11, "caption": "two dogs run"}]
    overall = language_eval("coco", preds, "golden", "val", references=refs,
                            spice=True)
    assert "SPICE" in overall
    cached = json.load(open("eval_results/coco_golden_val.json"))
    for entry in cached["imgToEval"].values():
        assert "SPICE" in entry
    # default off
    overall2 = language_eval("coco", preds, "golden2", "val", references=refs)
    assert "SPICE" not in overall2


def test_aggregation_matches_reference_artifacts(tmp_path, monkeypatch):
    """Value-level aggregation pinning vs the reference's checked-in
    denseatt artifact (eval_results/20180101-094617_denseatt_val.json):
    CIDEr/ROUGE_L overall == mean(per-image); METEOR and BLEU overall come
    from POOLED statistics (the artifact shows METEOR 0.417 overall vs
    0.445 per-image mean). Our language_eval must aggregate the same way."""
    import os

    import numpy as np

    ref_art = ("/root/reference/pivot_based_eccv2018/eval_results/"
               "20180101-094617_denseatt_val.json")
    if os.path.exists(ref_art):
        d = json.load(open(ref_art))
        per = d["imgToEval"].values()
        for k in ("CIDEr", "ROUGE_L"):  # mean-aggregated in the reference
            mean = float(np.mean([e[k] for e in per]))
            assert abs(mean - d["overall"][k]) < 2e-3, k
        # METEOR overall is NOT the per-image mean (pooled statistics)
        m_mean = float(np.mean([e["METEOR"] for e in d["imgToEval"].values()]))
        assert abs(m_mean - d["overall"]["METEOR"]) > 0.01

    monkeypatch.chdir(tmp_path)
    refs = {i: ["a man rides a brown horse", "a person on a horse"]
            for i in range(6)}
    preds = [{"image_id": 0, "caption": "a man rides a brown horse"},
             {"image_id": 1, "caption": "a man rides"},
             {"image_id": 2, "caption": "a horse and a man"},
             {"image_id": 3, "caption": "two dogs play outside"},
             {"image_id": 4, "caption": "a person on a horse"},
             {"image_id": 5, "caption": "a brown horse"}]
    overall = language_eval("coco", preds, "agg", "val", references=refs)
    cached = json.load(open("eval_results/coco_agg_val.json"))
    per = [cached["imgToEval"][str(i)] for i in range(6)]
    for k in ("CIDEr", "ROUGE_L"):
        assert abs(np.mean([e[k] for e in per]) - overall[k]) < 1e-9
    # pooled-statistics metrics: overall differs from the per-image mean
    assert abs(np.mean([e["METEOR"] for e in per]) - overall["METEOR"]) > 1e-4
    assert abs(np.mean([e["Bleu_4"] for e in per]) - overall["Bleu_4"]) > 1e-4
