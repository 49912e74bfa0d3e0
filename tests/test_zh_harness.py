"""zh metric-harness robustness tests with fixture-style cases.

Parity: the reference's only real unit tests are the AI_Challenger zh
scorer's unittest fixtures (run_evaluations_test.py:28-50 — right data,
null data, key errors, wrong counts; SURVEY.md §4). Same cases against
`language_eval`, which mirrors the scorer's `{'error': 1}` contract
(run_evaluations.py:33-43)."""

import numpy as np
import pytest

from unpaired_image_captioning_tpu.eval.eval_utils import language_eval
from unpaired_image_captioning_tpu.pivot import captions_to_nmt_batch
from unpaired_image_captioning_tpu import constants as C

REFS = {
    "img1": ["一个 男人 在 骑 马", "男人 骑 在 马 上"],
    "img2": ["两只 狗 在 草地 上 玩"],
}


def test_right_data(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    preds = [{"image_id": "img1", "caption": "一个 男人 在 骑 马"},
             {"image_id": "img2", "caption": "两只 狗 在 玩"}]
    overall = language_eval("zh", preds, "m", "val", references=REFS)
    assert overall["Bleu_1"] > 0.5
    assert "CIDEr" in overall


def test_key_error_ids_skipped(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    preds = [{"image_id": "missing", "caption": "一个 男人"},
             {"image_id": "img1", "caption": "一个 男人 在 骑 马"}]
    overall = language_eval("zh", preds, "m", "val", references=REFS)
    assert overall.get("error") != 1  # scored on the overlapping id


def test_no_overlap_returns_error(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    preds = [{"image_id": "nope", "caption": "x"}]
    assert language_eval("zh", preds, "m", "val", references=REFS) == {"error": 1}


def test_null_captions_dont_crash(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    preds = [{"image_id": "img1", "caption": ""},
             {"image_id": "img2", "caption": ""}]
    overall = language_eval("zh", preds, "m", "val", references=REFS)
    assert overall["Bleu_4"] < 1e-6


def test_captions_to_nmt_batch():
    import jax.numpy as jnp

    cap2nmt = jnp.asarray(np.array([0, 10, 11, 12], np.int32))
    seqs = jnp.asarray(np.array([[1, 2, 3, 0, 0], [2, 0, 0, 0, 0]], np.int32))
    src, lengths = captions_to_nmt_batch(seqs, cap2nmt)
    np.testing.assert_array_equal(np.asarray(src),
                                  [[10, 11, 12, 0, 0], [11, 0, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(lengths), [3, 1])

    tgt, tlen = captions_to_nmt_batch(seqs, cap2nmt, add_bos_eos=True)
    row = np.asarray(tgt)[0]
    assert row[0] == C.BOS and row[4] == C.EOS and (row[5:] == C.PAD).all()
    np.testing.assert_array_equal(np.asarray(tlen), [5, 3])


def test_unsegmented_zh_matches_presegmented(tmp_path, monkeypatch):
    """The zh route segments raw (space-free) zh captions itself, like the
    AI_Challenger scorer stack; raw and pre-segmented inputs score
    identically (VERDICT r1 weak #6)."""
    from unpaired_image_captioning_tpu.scripts.prepro_split_tokenize import (
        segment_zh)

    monkeypatch.chdir(tmp_path)
    raw_refs = {"img1": ["一个男人在骑马", "男人骑在马上"],
                "img2": ["两只狗在草地上玩"]}
    raw_preds = [{"image_id": "img1", "caption": "一个男人在骑马"},
                 {"image_id": "img2", "caption": "两只狗在玩"}]
    seg_refs = {k: [" ".join(segment_zh(r)) for r in v]
                for k, v in raw_refs.items()}
    seg_preds = [dict(p, caption=" ".join(segment_zh(p["caption"])))
                 for p in raw_preds]
    a = language_eval("zh", seg_preds, "a", "val", references=seg_refs)
    b = language_eval("zh", raw_preds, "b", "val", references=raw_refs)
    assert a["Bleu_1"] > 0.3  # segmentation produced real tokens
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, (k, a[k], b[k])


def test_per_char_fallback_segmentation(monkeypatch):
    """segment_zh falls back to per-character splitting (ascii words kept
    whole) when jieba is unavailable (ref prepro jieba soft-dep)."""
    import builtins
    import sys

    from unpaired_image_captioning_tpu.scripts import prepro_split_tokenize

    real_import = builtins.__import__

    def no_jieba(name, *a, **k):
        if name == "jieba":
            raise ImportError("jieba disabled for test")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "jieba", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_jieba)
    toks = prepro_split_tokenize.segment_zh("一个abc男人")
    assert "abc" in toks
    assert "一" in toks and "个" in toks and "男" in toks
