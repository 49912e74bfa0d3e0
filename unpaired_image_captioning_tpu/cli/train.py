"""Training CLI.

Parity: reference `train.py:16-156` — init (seed, loaders, resume from the
infos sidecar with compat asserts), infinite loop: get_batch → trainer.train
→ metric logging every `losses_log_every` → eval + checkpoint (+`-best`
dual-track) every `save_checkpoint_every` → stop at `max_epochs`; the SCST
phase switch at `self_critical_after` epochs (train.sh recipe).

Usage:
    python -m unpaired_image_captioning_tpu.cli.train \
        --caption_model denseatt --input_json data/chinese_talk.json \
        --input_label_h5 data/chinese_talk_label.h5 --i2t_train_flag true ...
"""

from __future__ import annotations

import os
import time
import numpy as np


def build_loader(cfg, nmt_dataset=None):
    from ..data.dataloader import CaptionDataLoader

    return CaptionDataLoader(
        input_json=cfg.input_json, input_label_h5=cfg.input_label_h5,
        input_fc_dir=cfg.input_fc_dir, input_att_dir=cfg.input_att_dir,
        input_box_dir=cfg.input_box_dir,
        input_box_cls_prob_dir=cfg.input_box_cls_prob_dir,
        batch_size=cfg.batch_size, seq_per_img=cfg.seq_per_img,
        use_box=cfg.use_box, norm_att_feat=cfg.norm_att_feat,
        norm_box_feat=cfg.norm_box_feat,
        use_box_cls_prob=cfg.use_box_cls_prob,
        att_feat_size=cfg.att_feat_size, attri_feat_size=cfg.attri_feat_size,
        nmt_dataset=nmt_dataset, seed=cfg.seed)


def load_df_table(cfg):
    """Load the prepro_ngrams document-frequency cache for SCST
    (reference: --cached_tokens, rewards.py init_scorer)."""
    from ..ops.cider import build_df_table, empty_df_table

    path = cfg.cached_tokens
    for cand in (path, path + ".npz"):
        if cand and os.path.exists(cand) and cand.endswith(".npz"):
            blob = np.load(cand, allow_pickle=True)
            df = {tuple(int(t) for t in k): float(v)
                  for k, v in zip(blob["ngrams"], blob["dfs"])}
            return build_df_table(df, float(blob["ref_len"]))
    return empty_df_table()


def main(argv=None):
    import jax

    from ..config import parse_opt
    from ..data.nmt_dataset import NMTDataset
    from ..parallel.mesh import make_mesh
    from ..train.logging import MetricLogger
    from ..train.trainer import Trainer

    cfg = parse_opt(argv)
    np.random.seed(cfg.seed)

    nmt_dataset = None
    nmt_valid = None
    nmt_dicts = {}
    if cfg.nmt_train_flag and cfg.input_nmt_h5:
        nmt_dataset = NMTDataset.from_h5(
            cfg.input_nmt_h5, cfg.batch_size, shuffle=True, seed=cfg.seed,
            curriculum=getattr(cfg, "curriculum", 0),
            batch_shuffle=getattr(cfg, "extra_shuffle", False))
        valid_path = cfg.input_nmt_h5.replace("train", "valid")
        if valid_path != cfg.input_nmt_h5 and os.path.exists(valid_path):
            nmt_valid = NMTDataset.from_h5(valid_path, cfg.batch_size)
        if cfg.input_nmt_dict:
            import json as _json

            from ..vocab import Dict as UDict

            with open(cfg.input_nmt_dict) as f:
                dicts = _json.load(f)
            nmt_dicts = {side: UDict.from_state_dict(dicts[side])
                         for side in ("src", "tgt")}
            cfg.nmt_src_vocab_size = nmt_dicts["src"].size()
            cfg.nmt_tgt_vocab_size = nmt_dicts["tgt"].size()
            # copy the dicts into the run dir: eval_unpaired and the
            # standalone translate CLI read them from there
            os.makedirs(cfg.checkpoint_path, exist_ok=True)
            for side in ("src", "tgt"):
                with open(os.path.join(cfg.checkpoint_path,
                                       f"{side}_dict.json"), "w") as f:
                    _json.dump(dicts[side], f)
        if not cfg.nmt_src_vocab_size:
            cfg.nmt_src_vocab_size = int(nmt_dataset.src.max()) + 1
            cfg.nmt_tgt_vocab_size = int(nmt_dataset.tgt.max()) + 1
        if nmt_dataset.src_feats is not None and not cfg.nmt_src_feature_sizes:
            # featured corpus (`word￨feat` preprocess artifacts): size each
            # feature LUT from the stream (fork train.py:370-384 sizes them
            # from dicts['src_features'])
            cfg.nmt_src_feature_sizes = tuple(
                int(nmt_dataset.src_feats[..., j].max()) + 1
                for j in range(nmt_dataset.src_feats.shape[-1]))
    loader = build_loader(cfg, nmt_dataset)
    cfg.vocab_size = loader.vocab.vocab_size
    cfg.seq_length = loader.seq_length

    mesh = None
    if cfg.num_devices != 1 and len(jax.devices()) > 1:
        mesh = make_mesh(cfg.num_devices, cfg.mesh_shape)

    # Weight_Trans embedding coupling: built whenever joint i2t+NMT training
    # has the dicts to align (the reference constructs it unconditionally at
    # trainer.py:95 from loader.nmt_dicts; criterion.py:313-353), plus the
    # target-side Weight_Trans_y when a frozen coco captioner embedding is
    # provided (criterion.py:366-434)
    import jax.numpy as jnp

    from .. import pivot

    joint_vocab = None
    joint_vocab_y = None
    if cfg.i2t_train_flag and cfg.nmt_train_flag and nmt_dicts:
        cap_rows, src_rows = pivot.build_joint_vocab(loader.vocab,
                                                     nmt_dicts["src"])
        if len(cap_rows):
            joint_vocab = (jnp.asarray(cap_rows), jnp.asarray(src_rows))
            print(f"Weight_Trans joint vocab: {len(cap_rows)} shared words")
        if cfg.input_coco_wemb and cfg.input_coco_json:
            import json as _json

            from ..vocab import CaptionVocab

            with open(cfg.input_coco_json) as f:
                coco_vocab = CaptionVocab(_json.load(f)["ix_to_word"])
            blob = np.load(cfg.input_coco_wemb)
            coco_rows, tgt_rows = pivot.build_joint_vocab(coco_vocab,
                                                          nmt_dicts["tgt"])
            if len(coco_rows):
                joint_vocab_y = (jnp.asarray(blob["embedding"]),
                                 jnp.asarray(coco_rows),
                                 jnp.asarray(tgt_rows))
                print(f"Weight_Trans_y joint vocab: {len(coco_rows)} "
                      "shared words")

    trainer = Trainer(cfg, mesh=mesh, df_table=load_df_table(cfg),
                      joint_vocab=joint_vocab, joint_vocab_y=joint_vocab_y)
    histories: dict = {"loss_history": {}, "lr_history": {},
                       "ss_prob_history": {}, "val_result_history": {}}
    if cfg.start_from and trainer.ckpt.has_checkpoint(best=bool(cfg.load_best_score)):
        infos = trainer.load(best=bool(cfg.load_best_score))
        if infos.get("loader_state"):
            loader.load_state_dict(infos["loader_state"])
        histories = trainer.ckpt.load_histories() or histories
        print(f"resumed from iter {trainer.iteration} epoch {trainer.epoch}")

    # multi-worker feature assembly (reference BlobFetcher role,
    # dataloader.py:338-408). The plan stream stays in this process, so
    # loader_state() below resumes from the next UNCONSUMED batch even with
    # workers ahead of the step.
    prefetcher = None
    if cfg.input_workers > 0:
        from ..data.prefetch import ProcessPrefetcher

        prefetcher = ProcessPrefetcher(loader, "train",
                                       num_workers=cfg.input_workers)

    def next_train_batch():
        return prefetcher.get() if prefetcher else loader.get_batch("train")

    def loader_state():
        return prefetcher.state_dict() if prefetcher else loader.state_dict()

    logger = MetricLogger(cfg.checkpoint_path)
    t_start = time.time()
    try:
        while True:
            sc_flag = (cfg.self_critical_after >= 0
                       and trainer.epoch >= cfg.self_critical_after)
            t0 = time.time()
            data = next_train_batch()
            read_t = time.time() - t0
            t0 = time.time()
            try:
                metrics = trainer.train(data, sc_flag=sc_flag)
            except Exception as e:
                # emergency checkpoint so the run is resumable after a crash
                # (SURVEY.md §5.3: the reference's only recovery is --start_from)
                trainer.ckpt.save(infos={"iter": trainer.iteration,
                                         "epoch": trainer.epoch,
                                         "epoch_nmt": trainer.epoch_nmt,
                                         "best_cider": trainer.best_cider,
                                         "best_nmt_acc": trainer.best_nmt_acc,
                                         "opt": cfg.to_dict(),
                                         "loader_state": loader_state(),
                                         "crash": repr(e)},
                                  i2t_params=trainer.i2t_params,
                                  nmt_params=trainer.nmt_params)
                print(f"FATAL at iter {trainer.iteration}: {e!r} — emergency "
                      f"checkpoint written to {cfg.checkpoint_path}")
                raise
            step_t = time.time() - t0

            if data["bounds"]["wrapped"]:
                trainer.epoch += 1
            if data.get("nmt_wrapped"):
                trainer.epoch_nmt += 1

            it = trainer.iteration
            if it % cfg.losses_log_every == 0:
                scalars = dict(metrics)
                scalars.update({"read_time": read_t, "step_time": step_t,
                                "epoch": trainer.epoch})
                if "nmt_words" in metrics and step_t > 0:
                    # tokens/sec console stat (Statistics.output parity,
                    # criterion.py:77-95)
                    scalars["nmt_tok_per_s"] = metrics["nmt_words"] / step_t
                logger.add_scalars(it, scalars)
                histories["loss_history"][str(it)] = metrics.get("total_loss")
                histories["lr_history"][str(it)] = metrics.get("lr_i2t")
                histories["ss_prob_history"][str(it)] = metrics.get("ss_prob")
                msg = " ".join(f"{k}={v:.4g}" for k, v in metrics.items())
                print(f"iter {it} (epoch {trainer.epoch}) {msg} "
                      f"read={read_t:.3f}s step={step_t:.3f}s")

            if it % cfg.save_checkpoint_every == 0:
                val = evaluate(trainer, loader, cfg, nmt_valid=nmt_valid)
                histories["val_result_history"][str(it)] = {
                    k: v for k, v in val.items() if k != "predictions"}
                logger.add_scalars(it, {"val_loss": val["loss"]})
                if val.get("nmt_stats"):
                    logger.add_scalars(it, val["nmt_stats"])
                    # best-NMT-acc dual track (trainer.py:212-215)
                    acc = val["nmt_stats"]["valid_acc"]
                    if trainer.best_nmt_acc is None or acc > trainer.best_nmt_acc:
                        trainer.best_nmt_acc = acc
                score = (val.get("lang_stats") or {}).get("CIDEr", -val["loss"])
                best = trainer.best_cider is None or score > trainer.best_cider
                if best:
                    trainer.best_cider = score
                trainer.save(loader_state=loader_state(),
                             histories=histories)
                if best:
                    trainer.save(loader_state=loader_state(),
                                 histories=histories, best=True)
                print(f"checkpoint @ iter {it}: val_loss={val['loss']:.4f} "
                      f"score={score:.4f} best={best}")

            if trainer.epoch >= cfg.max_epochs >= 0:
                # final checkpoint so short runs are always resumable/evaluable
                trainer.save(loader_state=loader_state(), histories=histories)
                if trainer.best_cider is None:
                    trainer.save(loader_state=loader_state(),
                                 histories=histories, best=True)
                print(f"done: {trainer.epoch} epochs, {it} iters, "
                      f"{time.time() - t_start:.1f}s")
                break
    finally:
        # close on EVERY exit path (clean break, crash-checkpoint
        # re-raise, KeyboardInterrupt): abandoned workers +
        # planned-but-unconsumed shared-memory segments otherwise
        # persist until interpreter teardown (round-3 review)
        if prefetcher is not None:
            prefetcher.close()


def evaluate(trainer, loader, cfg, nmt_valid=None) -> dict:
    from ..eval.eval_utils import eval_split

    refs = None
    if cfg.language_eval:
        refs = {}
        for ix in loader.split_ix["val"]:
            i1 = loader.label_start_ix[ix] - 1
            i2 = loader.label_end_ix[ix] - 1
            caps = loader.labels[i1: i2 + 1]
            iid = loader.images[ix].get("id", ix)
            refs[iid] = loader.vocab.decode_sequence(caps)
    return eval_split(trainer.i2t_model, trainer.i2t_params, loader,
                      split="val", num_images=cfg.val_images_use,
                      beam_size=cfg.beam_size, language_eval_refs=refs,
                      model_id=cfg.id, nmt_model=trainer.nmt_model,
                      nmt_params=trainer.nmt_params, nmt_valid=nmt_valid)


if __name__ == "__main__":
    main()
