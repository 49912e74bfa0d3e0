"""Build the zh evaluation reference JSON for the AIC scorer.

Parity: reference `scripts/prepro_reference_json.py` — convert the split's
ground-truth captions into the COCO-annotation shape consumed by the zh
metric stack ({'annotations': [{'image_id', 'id', 'caption'}], 'images':
[...], 'type': 'captions'}).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    import h5py

    p = argparse.ArgumentParser("prepro_reference_json")
    p.add_argument("--input_json", required=True)
    p.add_argument("--input_label_h5", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--split", default="val")
    a = p.parse_args(argv)

    from ..vocab import CaptionVocab

    with open(a.input_json, encoding="utf-8") as f:
        info = json.load(f)
    vocab = CaptionVocab(info["ix_to_word"])
    with h5py.File(a.input_label_h5, "r") as f:
        labels = f["labels"][...]
        start = f["label_start_ix"][...]
        end = f["label_end_ix"][...]

    images, annotations = [], []
    ann_id = 0
    for ix, img in enumerate(info["images"]):
        if img.get("split", "train") != a.split:
            continue
        iid = img.get("id", ix)
        images.append({"id": iid, "file_name": img.get("file_path", "")})
        for cap in vocab.decode_sequence(labels[start[ix] - 1: end[ix]]):
            annotations.append({"image_id": iid, "id": ann_id, "caption": cap})
            ann_id += 1
    with open(a.output, "w", encoding="utf-8") as f:
        json.dump({"images": images, "annotations": annotations,
                   "type": "captions", "licenses": [], "info": {}},
                  f, ensure_ascii=False)
    print(f"wrote {a.output}: {len(images)} images, {ann_id} references")


if __name__ == "__main__":
    main()
