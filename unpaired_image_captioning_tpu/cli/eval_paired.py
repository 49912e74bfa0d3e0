"""Paired i2t evaluation CLI.

Parity: reference `eval_paired.py:17-123` — load the run's `infos-best`
sidecar, apply checkpoint-opts override with consistency asserts
(:81-91 → config.merge_checkpoint_config), load `model_i2t-best`, run
`eval_split`, dump predictions + scores json.
"""

from __future__ import annotations

import json
import os


def main(argv=None):
    import jax

    from .. import models
    from ..config import Config, merge_checkpoint_config, parse_opt
    from ..eval.eval_utils import eval_split
    from ..train.checkpoint import CheckpointManager
    from .train import build_loader

    cfg = parse_opt(argv)
    assert cfg.start_from, "--start_from <run dir> is required"
    ckpt = CheckpointManager(cfg.start_from)
    best = bool(cfg.load_best_score)
    infos = ckpt.load_infos(best=best)
    saved = Config.from_dict(infos["opt"])
    cfg = merge_checkpoint_config(cfg, saved)

    if cfg.image_folder:
        # raw-image route: folder of images -> on-the-fly ResNet features
        # (ref dataloaderraw.py:25-141 via eval_pivot.py:204-210); vocab
        # comes from the run's talk.json, captions are decoded without refs
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

    model = models.setup(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = ckpt.load_params("model_i2t", params, best=best)
    if cfg.bn_calibrate > 0 and not cfg.image_folder:
        # fill/refresh use_bn running stats from data (converted checkpoints
        # without tracked stats; ref AttModel train-mode BN :79-84)
        from ..models.att import calibrate_batch_norm

        params = calibrate_batch_norm(params, loader,
                                      n_batches=cfg.bn_calibrate)
        print(f"BN running stats calibrated on {cfg.bn_calibrate} batches")

    refs = None
    if cfg.language_eval and not cfg.image_folder:
        refs = {}
        for split in ("val", "test"):
            for ix in loader.split_ix[split]:
                i1 = loader.label_start_ix[ix] - 1
                i2 = loader.label_end_ix[ix] - 1
                iid = loader.images[ix].get("id", ix)
                refs[iid] = loader.vocab.decode_sequence(loader.labels[i1:i2 + 1])

    mesh = None
    if cfg.num_devices != 1 and len(jax.devices()) > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(cfg.num_devices, "data")
    out = eval_split(model, params, loader, split="test",
                     num_images=cfg.val_images_use, beam_size=cfg.beam_size,
                     language_eval_refs=refs, model_id=cfg.id, mesh=mesh,
                     verbose=True, spice=bool(cfg.spice))
    os.makedirs("eval_results", exist_ok=True)
    path = os.path.join("eval_results", f"paired_{cfg.id}_test.json")
    with open(path, "w") as f:
        json.dump({"loss": out["loss"], "predictions": out["predictions"],
                   "overall": out["lang_stats"]}, f, indent=1)
    print("loss:", out["loss"])
    if out["lang_stats"]:
        print(json.dumps(out["lang_stats"], indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
