"""Pivot evaluation CLI — STAGE-SEPARATED offline pipeline.

Parity: reference `eval_pivot.py` `eval_coco_offline` (:147-193):

  1. i2t_eval (:195-227): decode zh captions for the eval images (from
     precomputed features, or from a raw ``--image_folder`` through the
     on-the-fly ResNet, :204-210) and dump ``tmp/<id>_zh_<dataset>.json``;
  2. cocojson2text: json -> one caption per line (:152-153);
  3. the STANDALONE translate CLI runs on the text file with the NMT
     checkpoint (the reference shells out to a separate OpenNMT process,
     :154-161 — here the same ``cli.translate`` entry point runs in-process,
     consuming the run dir's nmt_config.json/dicts/msgpack exactly as a
     separate invocation would);
  4. text2cocojson: hypotheses + image ids -> predictions json (:186-190);
  5. ``language_eval('coco', ...)`` scores vs the COCO refs (:191-193).

Every stage writes its artifact, so any stage can be re-run standalone —
unlike round-1's thin wrapper, the translation here really goes through the
translate CLI's file-in/file-out path (e2e-compared against the fused
on-device pivot in tests/test_pivot_offline.py).
"""

from __future__ import annotations

import json
import os


def main(argv=None):
    import jax

    from .. import models
    from ..config import Config, merge_checkpoint_config, parse_opt
    from ..eval.eval_utils import eval_split, language_eval
    from ..train.checkpoint import CheckpointManager
    from ..utils.text import cocojson2text, expand_contractions, text2cocojson
    from . import translate as translate_cli
    from .train import build_loader

    cfg = parse_opt(argv)
    assert cfg.start_from, "--start_from <run dir> is required"
    ckpt = CheckpointManager(cfg.start_from)
    best = bool(cfg.load_best_score)
    infos = ckpt.load_infos(best=best)
    cfg = merge_checkpoint_config(cfg, Config.from_dict(infos["opt"]))

    # ---- stage 1: i2t_eval -> zh json -------------------------------------
    if cfg.image_folder:
        from ..data.raw_images import RawImageLoader
        from ..vocab import CaptionVocab

        loader = RawImageLoader(
            folder_path=cfg.image_folder, batch_size=cfg.batch_size,
            image_size=cfg.image_size, depth=cfg.resnet_depth)
        with open(cfg.input_json) as f:
            loader.vocab = CaptionVocab(json.load(f)["ix_to_word"])
        cfg.vocab_size = loader.vocab.vocab_size
    else:
        loader = build_loader(cfg)
        cfg.vocab_size = loader.vocab.vocab_size
        cfg.seq_length = loader.seq_length

    cap_model = models.setup(cfg)
    cap_params = ckpt.load_params(
        "model_i2t", cap_model.init_params(jax.random.PRNGKey(0)), best=best)
    out = eval_split(cap_model, cap_params, loader, split="test",
                     num_images=cfg.val_images_use, beam_size=cfg.beam_size,
                     model_id=cfg.id)
    os.makedirs("tmp", exist_ok=True)
    zh_json = os.path.join("tmp", f"{cfg.id}_zh_coco.json")
    with open(zh_json, "w") as f:
        json.dump(out["predictions"], f)
    print(f"stage 1: {len(out['predictions'])} zh captions -> {zh_json}")

    # ---- stage 2: json -> txt ---------------------------------------------
    zh_txt = zh_json.replace(".json", ".txt")
    cocojson2text(zh_json, zh_txt)

    # ---- stage 3: standalone translate CLI --------------------------------
    en_txt = zh_txt.replace("_zh_", "_en_")
    translate_cli.main(["-model", cfg.start_from, "-src", zh_txt,
                        "-output", en_txt, "-beam_size", "15",
                        "-batch_size", str(cfg.batch_size)])
    print(f"stage 3: translated -> {en_txt}")

    # ---- stage 4: txt -> coco predictions json ----------------------------
    ids = [p["image_id"] for p in out["predictions"]]
    en_json = en_txt.replace(".txt", ".json")
    text2cocojson(en_txt, ids, en_json)
    with open(en_json) as f:
        en_preds = json.load(f)
    # the reference post-edits the pivot output before scoring
    # (eval_utils.py:417-420); expand_contractions covers the "'s" fixups
    for p in en_preds:
        p["caption"] = expand_contractions(p["caption"])

    # ---- stage 5: language_eval -------------------------------------------
    overall = None
    if cfg.language_eval and cfg.input_coco_json and os.path.exists(
            cfg.input_coco_json):
        with open(cfg.input_coco_json) as f:
            en_refs = {int(k): v for k, v in json.load(f).items()}
        overall = language_eval("coco", en_preds, cfg.id, "test",
                                references=en_refs, spice=bool(cfg.spice))
        print(json.dumps(overall, indent=1))

    os.makedirs("eval_results", exist_ok=True)
    path = os.path.join("eval_results", f"pivot_{cfg.id}_test.json")
    with open(path, "w") as f:
        json.dump({"zh_predictions": out["predictions"],
                   "en_predictions": en_preds, "overall": overall}, f,
                  indent=1)
    print("wrote", path)
    return {"zh_predictions": out["predictions"], "en_predictions": en_preds,
            "overall": overall}


if __name__ == "__main__":
    main()
