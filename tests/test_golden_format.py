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
