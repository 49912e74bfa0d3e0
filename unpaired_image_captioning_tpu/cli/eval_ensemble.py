"""Ensemble evaluation CLI.

Parity: reference `eval_ensemble.py:89-157` — load N checkpoints (`--ids`
run dirs), wrap in AttEnsemble (probability-space averaging), beam-decode,
score with eval_split_coco_paired semantics.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from .. import models
    from ..config import Config
    from ..models.base import Features
    from ..models.ensemble import AttEnsemble
    from ..eval.eval_utils import language_eval
    from ..train.checkpoint import CheckpointManager
    from ..utils.text import decode_sequence
    from .train import build_loader

    p = argparse.ArgumentParser("eval_ensemble")
    p.add_argument("--ids", nargs="+", required=True, help="run dirs")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--num_images", type=int, default=-1)
    p.add_argument("--language_eval", type=int, default=0)
    args, rest = p.parse_known_args(argv)

    members = []
    params_list = []
    cfg0 = None
    for run_dir in args.ids:
        ckpt = CheckpointManager(run_dir)
        infos = ckpt.load_infos(best=True)
        cfg = Config.from_dict(infos["opt"])
        m = models.setup(cfg)
        prm = ckpt.load_params("model_i2t", m.init_params(jax.random.PRNGKey(0)),
                               best=True)
        members.append(m)
        params_list.append(prm)
        cfg0 = cfg0 or cfg
    ens = AttEnsemble(tuple(members))

    cfg0.batch_size = args.batch_size
    loader = build_loader(cfg0)
    loader.reset_iterator("test")
    budget = (len(loader.split_ix["test"]) if args.num_images <= 0
              else args.num_images)

    @jax.jit
    def decode(params_list, feats):
        return ens.sample_beam(params_list, feats,
                               beam_size=args.beam_size).seq[:, 0]

    preds, seen = [], set()
    while len(seen) < budget:
        data = loader.get_batch("test")
        spi = loader.seq_per_img
        first = np.arange(0, data["fc_feats"].shape[0], spi)
        feats = Features(fc_feats=jnp.asarray(data["fc_feats"][first]),
                         att_feats=jnp.asarray(data["att_feats"][first]),
                         attri_feats=jnp.asarray(data["attri_feats"][first]),
                         att_masks=jnp.asarray(data["att_masks"][first]))
        seq = decode(params_list, feats)
        caps = decode_sequence(loader.vocab.ix_to_word, np.asarray(seq))
        for info, cap in zip(data["infos"], caps):
            if info["id"] not in seen:
                seen.add(info["id"])
                preds.append({"image_id": info["id"], "caption": cap})
        if data["bounds"]["wrapped"]:
            break
    preds = preds[:budget]

    out = {"predictions": preds}
    if args.language_eval:
        refs = {}
        for ix in loader.split_ix["test"]:
            i1 = loader.label_start_ix[ix] - 1
            i2 = loader.label_end_ix[ix] - 1
            iid = loader.images[ix].get("id", ix)
            refs[iid] = loader.vocab.decode_sequence(loader.labels[i1:i2 + 1])
        out["overall"] = language_eval("ensemble", preds, "ensemble", "test",
                                       references=refs)
        print(json.dumps(out["overall"], indent=1))
    os.makedirs("eval_results", exist_ok=True)
    path = "eval_results/ensemble_test.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
