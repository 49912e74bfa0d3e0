"""Host input-pipeline throughput at protocol shapes.

Measures `CaptionDataLoader` batch assembly — the work the reference's
4-process BlobFetcher (misc/dataloader/dataloader.py:338-408) does — from
REAL on-disk artifacts (per-image .npz features like prepro_feats writes,
plus the fc/att h5 variant) at the training protocol shapes: batch 50,
196-slot x 2048-d att grid, 2048-d fc, seq labels from a label.h5.

Reports batches/s for: synchronous get_batch per backend, plan-only and
assemble-only phase splits, and ProcessPrefetcher consumption at 1/2/4
workers — against the measured device step rate (BASELINE.md: XE 117.1k
tokens/s at 850 predicted tokens/batch ~= 138 steps/s) so BASELINE.md can
carry an "input pipeline X vs step Y" line.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf/prof_input.py [--n_images 300]
(CPU-only; no TPU needed. NOTE this dev box has 1 core — worker scaling
numbers here are a lower bound; the reference's own BlobFetcher would be
equally starved.)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

import h5py
import numpy as np

from unpaired_image_captioning_tpu.data.dataloader import CaptionDataLoader
from unpaired_image_captioning_tpu.data.prefetch import ProcessPrefetcher

B, N_ATT, D_ATT, D_FC, L = 50, 196, 2048, 2048, 16
STEP_TOKENS_PER_S = 117_100.0           # BASELINE.md XE record
TOKENS_PER_BATCH = B * (L + 1)


def build_artifacts(root: str, n_images: int, dtype=np.float32):
    rng = np.random.RandomState(0)
    fc_dir = os.path.join(root, "fc")
    att_dir = os.path.join(root, "att")
    os.makedirs(fc_dir)
    os.makedirs(att_dir)
    images = []
    fc_h5 = os.path.join(root, "fc.h5")
    att_h5 = os.path.join(root, "att.h5")
    hf = h5py.File(fc_h5, "w")
    ha = h5py.File(att_h5, "w")
    dfc = hf.create_dataset("fc", (n_images, D_FC), dtype=dtype)
    datt = ha.create_dataset("att", (n_images, N_ATT, D_ATT), dtype=dtype)
    for i in range(n_images):
        fc = rng.randn(D_FC).astype(dtype)
        att = rng.randn(N_ATT, D_ATT).astype(dtype)
        np.savez(os.path.join(fc_dir, f"{i}.npz"), feat=fc)
        np.savez(os.path.join(att_dir, f"{i}.npz"), feat=att)
        dfc[i] = fc
        datt[i] = att
        images.append({"id": i, "split": "train", "file_path": f"{i}.jpg"})
    hf.close()
    ha.close()

    # labels h5 + talk json (5 caps/img)
    M = n_images * 5
    labels = rng.randint(1, 9000, (M, L)).astype(np.int32)
    lab_h5 = os.path.join(root, "label.h5")
    with h5py.File(lab_h5, "w") as h:
        h["labels"] = labels
        h["label_start_ix"] = np.arange(1, M + 1, 5, np.int64)
        h["label_end_ix"] = np.arange(5, M + 1, 5, np.int64)
    talk = os.path.join(root, "talk.json")
    with open(talk, "w") as f:
        json.dump({"ix_to_word": {str(i): f"w{i}" for i in range(1, 9488)},
                   "images": images}, f)
    return talk, lab_h5, fc_dir, att_dir, fc_h5, att_h5


def make_loader(talk, lab, *, fc_dir="", att_dir="", fc_h5="", att_h5="",
                feat_dtype="float32"):
    return CaptionDataLoader(
        input_json=talk, input_label_h5=lab, input_fc_dir=fc_dir,
        input_att_dir=att_dir, input_fc_h5=fc_h5, input_att_h5=att_h5,
        batch_size=B, seq_per_img=1, att_feat_size=D_ATT, max_att_len=N_ATT,
        feat_dtype=feat_dtype)


def timeit(fn, n: int) -> float:
    fn()  # warm (page cache, handles)
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=300)
    ap.add_argument("--iters", type=int, default=12)
    a = ap.parse_args()

    root = tempfile.mkdtemp(prefix="uic_input_")
    print(f"building {a.n_images}-image artifacts "
          f"({a.n_images * (N_ATT * D_ATT + D_FC) * 4 / 1e6:.0f} MB x2) ...")
    talk, lab, fc_dir, att_dir, fc_h5, att_h5 = build_artifacts(
        root, a.n_images)

    step_rate = STEP_TOKENS_PER_S / TOKENS_PER_BATCH
    results = {"step_batches_per_s": round(step_rate, 1)}

    ld = make_loader(talk, lab, fc_dir=fc_dir, att_dir=att_dir)
    results["sync_npz"] = timeit(lambda: ld.get_batch("train"), a.iters)
    results["plan_only"] = timeit(lambda: ld.plan_batch("train"), 200)
    ixs = list(range(B))
    results["assemble_only_npz"] = timeit(
        lambda: ld.assemble_features(ixs), a.iters)

    ldh = make_loader(talk, lab, fc_h5=fc_h5, att_h5=att_h5)
    results["sync_h5"] = timeit(lambda: ldh.get_batch("train"), a.iters)
    ldb = make_loader(talk, lab, fc_h5=fc_h5, att_h5=att_h5,
                      feat_dtype="bfloat16")
    results["sync_h5_bf16"] = timeit(lambda: ldb.get_batch("train"), a.iters)

    for nw in (1, 2, 4):
        ldw = make_loader(talk, lab, fc_h5=fc_h5, att_h5=att_h5,
                          feat_dtype="bfloat16")
        pf = ProcessPrefetcher(ldw, "train", num_workers=nw, depth=nw + 2)
        try:
            results[f"prefetch_h5_bf16_w{nw}"] = timeit(pf.get, a.iters)
        finally:
            pf.close()

    shutil.rmtree(root, ignore_errors=True)
    for k, v in results.items():
        ratio = v / step_rate
        print(f"{k:>22}: {v:8.1f} batches/s  ({ratio:5.1f}x the device step)")
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
