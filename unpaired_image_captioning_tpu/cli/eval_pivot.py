"""Pivot evaluation CLI (offline-style pipeline).

Parity: reference `eval_pivot.py` `eval_coco_offline` (:147-193) — the
reference decodes zh captions to json, converts json→txt, shells out to a
SEPARATE OpenNMT process with a pretrained zh2en checkpoint (:154-161),
converts back, and scores. Here the same pipeline stages exist for artifact
compatibility (tmp jsons/txts are still written) but the decode+translate
itself is the fused on-device path shared with eval_unpaired — no
subprocess, no second device context.
"""

from __future__ import annotations

import json
import os
import tempfile


def main(argv=None):
    from ..utils.text import cocojson2text
    from .eval_unpaired import main as unpaired_main

    # The fused path already produces both zh and en predictions; keep the
    # offline artifact trail the reference's tooling expects.
    tmp = tempfile.mkdtemp(prefix="pivot_")
    print(f"pivot eval (fused on-device path); artifacts in {tmp}")
    unpaired_main(argv)
    # mirror reference tmp artifacts when the unpaired eval wrote results
    for name in os.listdir("eval_results"):
        if name.startswith("unpaired_") and name.endswith("_test.json"):
            path = os.path.join("eval_results", name)
            with open(path) as f:
                out = json.load(f)
            zh_json = os.path.join(tmp, "zh_captions.json")
            with open(zh_json, "w") as f:
                json.dump(out.get("zh_predictions", []), f)
            en_json = os.path.join(tmp, "en_captions.json")
            with open(en_json, "w") as f:
                json.dump(out.get("en_predictions", []), f)
            if out.get("zh_predictions"):
                cocojson2text(zh_json, os.path.join(tmp, "zh_captions.txt"))
            if out.get("en_predictions"):
                cocojson2text(en_json, os.path.join(tmp, "en_captions.txt"))
            print("artifacts:", os.listdir(tmp))
            break


if __name__ == "__main__":
    main()
