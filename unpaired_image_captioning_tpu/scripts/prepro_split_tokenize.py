"""Merge + tokenize AIC annotation JSONs and assign train/val/test splits.

Parity: reference `scripts/prepro_split_tokenize.py` — merge train+val
annotation files, segment Chinese captions with jieba (:37-41; jieba is a
soft dependency — per-character fallback segmentation otherwise, which is a
standard zh baseline), random split.

Input: AIC-style [{"image_id": str, "caption": [str, ...]}, ...].
Output: [{"id", "split", "file_path", "captions"}] consumable by
prepro_labels.
"""

from __future__ import annotations

import argparse
import json
import random
from typing import List


def segment_zh(text: str) -> List[str]:
    try:
        import jieba  # soft dep (reference vendors it)

        return [w for w in jieba.cut(text.strip()) if w.strip()]
    except ImportError:
        # per-character fallback: ascii words kept whole
        out, cur = [], ""
        for ch in text.strip():
            if ch.isascii() and (ch.isalnum() or ch in "'-"):
                cur += ch
            else:
                if cur:
                    out.append(cur)
                    cur = ""
                if not ch.isspace():
                    out.append(ch)
        if cur:
            out.append(cur)
        return out


def main(argv=None):
    p = argparse.ArgumentParser("prepro_split_tokenize")
    p.add_argument("--inputs", nargs="+", required=True,
                   help="AIC annotation jsons to merge")
    p.add_argument("--output", required=True)
    p.add_argument("--num_val", type=int, default=10000)
    p.add_argument("--num_test", type=int, default=10000)
    p.add_argument("--seed", type=int, default=123)
    a = p.parse_args(argv)

    anns = []
    for path in a.inputs:
        with open(path, encoding="utf-8") as f:
            anns.extend(json.load(f))

    random.seed(a.seed)
    random.shuffle(anns)
    out = []
    for i, ann in enumerate(anns):
        split = ("val" if i < a.num_val
                 else "test" if i < a.num_val + a.num_test else "train")
        caps = ann.get("caption") or ann.get("captions") or []
        if isinstance(caps, str):
            caps = [caps]
        out.append({
            "id": i,
            "split": split,
            "file_path": ann.get("image_id", ann.get("file_path", str(i))),
            "captions": [segment_zh(c) for c in caps],
        })
    with open(a.output, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False)
    print(f"wrote {a.output}: {len(out)} images "
          f"({a.num_val} val / {a.num_test} test)")


if __name__ == "__main__":
    main()
