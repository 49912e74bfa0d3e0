"""Worker process for tests/test_distributed.py — two-process DCN proof.

Launched as `python dcn_worker.py <pid> <nproc> <coordinator> <outdir>`.
Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent),
joins a `jax.distributed` job over gloo CPU collectives, and runs ONE
joint XE training step on a 2x4 data-x-model mesh where:
  - the 'data' axis spans the two PROCESSES (per-process input striping:
    each process contributes only its own half of the global batch via
    `jax.make_array_from_process_local_data` — nothing ships the full
    batch), and
  - the 'model' axis tensor-parallels the gate matmuls / vocab
    projections WITHIN each process.
Then it checkpoints the TP-sharded state (exercising the DCN
process_allgather + process-0-only-write path in train/checkpoint.py),
restores it into a fresh Trainer, and verifies the restore. Process 0
writes the step metrics + flattened updated params for the parent to
compare against a single-process 8-device control run.

This is the executable evidence for SURVEY.md §2.10's multi-host (DCN)
claim — the reference has no multi-node anything (its scale-out is
single-process torch DataParallel, trainer.py:74).
"""

import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, outdir = sys.argv[3], sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4, len(jax.local_devices())
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.data.dataloader import CaptionDataLoader
    from unpaired_image_captioning_tpu.data.nmt_dataset import NMTDataset
    from unpaired_image_captioning_tpu.data.synthetic import (
        make_caption_artifacts, make_nmt_corpus)
    from unpaired_image_captioning_tpu.parallel.mesh import (make_mesh,
                                                             param_sharding,
                                                             replicate)
    from unpaired_image_captioning_tpu.train.trainer import Trainer

    # identical (seeded) synthetic artifacts built per process
    mydir = os.path.join(outdir, f"proc{pid}")
    os.makedirs(mydir, exist_ok=True)
    jpath, h5path, mem = make_caption_artifacts(mydir, vocab_size=31)
    src, tgt = make_nmt_corpus()
    loader = CaptionDataLoader(
        input_json=jpath, input_label_h5=h5path, batch_size=4, seq_per_img=2,
        att_feat_size=24, attri_feat_size=16, in_memory=mem,
        nmt_dataset=NMTDataset(src, tgt, batch_size=4, shuffle=True),
        use_box_cls_prob=0)
    data = loader.get_batch("train")

    # 2x4 data-x-model mesh: jax.devices() orders process 0's devices first,
    # so the reshape(2, 4) puts the 'data' axis ACROSS the two processes
    mesh = make_mesh(8, "2x4")

    def to_global(x):
        """Per-process striping: contribute only this process's batch rows."""
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % nproc == 0:
            rows = x.shape[0] // nproc
            sh = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            return jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(x[pid * rows:(pid + 1) * rows]),
                global_shape=x.shape)
        return jax.device_put(x, NamedSharding(mesh, P()))

    batch = {k: to_global(v) for k, v in data.items()
             if k in ("fc_feats", "att_feats", "attri_feats", "att_masks",
                      "labels", "masks", "gts", "gts_masks")}
    batch["nmt"] = {k: to_global(v) for k, v in data["nmt"].items()}

    kw = dict(
        caption_model="fc", vocab_size=31, rnn_size=24, num_layers=1,
        input_encoding_size=16, att_hid_size=12, fc_feat_size=32,
        att_feat_size=24, attri_feat_size=16, seq_length=10,
        drop_prob_lm=0.0, batch_size=4, seq_per_img=2,
        i2t_train_flag=True, nmt_train_flag=True,
        nmt_src_vocab_size=32, nmt_tgt_vocab_size=32,
        word_vec_size=16, layers=1, dropout=0.0,
        i2t_learning_rate=1e-2, nmt_optim="adam", nmt_learning_rate=1e-2)
    cfg = Config(checkpoint_path=os.path.join(outdir, "ckpt"), **kw)

    tr = Trainer(cfg, mesh=mesh, rng=jax.random.PRNGKey(1))
    tp = lambda t: jax.device_put(t, param_sharding(t, mesh,
                                                    tensor_parallel=True))
    rep = lambda t: jax.device_put(
        t, jax.tree.map(lambda _: replicate(mesh), t))
    tr.i2t_params, tr.nmt_params = tp(tr.i2t_params), tp(tr.nmt_params)
    tr.optim.i2t_state = rep(tr.optim.i2t_state)
    tr.optim.nmt_state = rep(tr.optim.nmt_state)

    m = tr.train(batch)

    # multi-process checkpoint: TP-sharded leaves are NOT fully addressable
    # here, so save() gathers them over DCN and only process 0 writes
    from jax.experimental import multihost_utils

    tr.save(loader_state=loader.state_dict())
    multihost_utils.sync_global_devices("ckpt-written")

    tr2 = Trainer(cfg, mesh=mesh, rng=jax.random.PRNGKey(999))
    tr2.i2t_params, tr2.nmt_params = tp(tr2.i2t_params), tp(tr2.nmt_params)
    template_sh = [l.sharding for l in jax.tree.leaves(tr2.i2t_params)]
    tr2.load()
    assert tr2.iteration == 1
    # restored leaves carry the restoring trainer's TEMPLATE placement
    # (post-step `tr` leaves may differ: GSPMD picks output shardings),
    # and hold the same logical values as the state that was saved
    for a, b, sh in zip(jax.tree.leaves(tr.i2t_params),
                        jax.tree.leaves(tr2.i2t_params), template_sh):
        assert b.sharding == sh, (b.sharding, sh)
        got = np.asarray(multihost_utils.process_allgather(b, tiled=True))
        want = np.asarray(multihost_utils.process_allgather(a, tiled=True))
        np.testing.assert_array_equal(got, want)

    # metrics for the parent's single-process-equivalence check; the updated
    # params live in the checkpoint the save() above wrote — the parent
    # compares that FILE against its control run, which also proves the
    # multi-process gather wrote the right bytes
    if pid == 0:
        import json

        with open(os.path.join(outdir, "result.json"), "w") as f:
            json.dump({k: float(v) for k, v in m.items()}, f)

    multihost_utils.sync_global_devices("done")
    print(f"WORKER_OK {pid}")


if __name__ == "__main__":
    main()
