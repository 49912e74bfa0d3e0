"""Synthetic tiny artifacts in the reference's on-disk formats — for tests
and benchmarks (SURVEY.md §4: golden tests on tiny synthetic artifacts)."""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np


def make_caption_artifacts(tmpdir: str, *, n_images: int = 12, vocab_size: int = 40,
                           seq_length: int = 10, caps_per_img: int = 3,
                           fc_dim: int = 32, att_dim: int = 24, att_len: int = 6,
                           cls_dim: int = 16, seed: int = 0) -> Tuple[str, str, dict]:
    """Writes talk.json + label.h5; returns (json_path, h5_path, in_memory
    feature dict usable as CaptionDataLoader(in_memory=...))."""
    import h5py

    rng = np.random.RandomState(seed)
    ix_to_word = {str(i + 1): f"w{i}" for i in range(vocab_size)}
    images = []
    splits = ["train"] * (n_images - 4) + ["val", "val", "test", "test"]
    for i in range(n_images):
        images.append({"id": i, "split": splits[i], "file_path": f"img{i}.jpg",
                       "width": 64, "height": 48})
    labels = []
    start, end = [], []
    pos = 1
    for i in range(n_images):
        start.append(pos)
        for _ in range(caps_per_img):
            ln = rng.randint(3, seq_length + 1)
            row = np.zeros((seq_length,), np.int32)
            row[:ln] = rng.randint(1, vocab_size + 1, size=ln)
            labels.append(row)
            pos += 1
        end.append(pos - 1)
    json_path = os.path.join(tmpdir, "talk.json")
    with open(json_path, "w") as f:
        json.dump({"ix_to_word": ix_to_word, "images": images}, f)
    h5_path = os.path.join(tmpdir, "label.h5")
    with h5py.File(h5_path, "w") as f:
        f["labels"] = np.stack(labels)
        f["label_start_ix"] = np.asarray(start, np.int64)
        f["label_end_ix"] = np.asarray(end, np.int64)
        f["label_length"] = (np.stack(labels) > 0).sum(1).astype(np.int64)
    mem = {
        "fc": {str(i): rng.randn(fc_dim).astype(np.float32) for i in range(n_images)},
        "att": {str(i): rng.randn(att_len, att_dim).astype(np.float32)
                for i in range(n_images)},
        "cls": {str(i): rng.rand(att_len, cls_dim).astype(np.float32)
                for i in range(n_images)},
        "box": {str(i): np.abs(rng.rand(att_len, 4)).astype(np.float32)
                for i in range(n_images)},
    }
    return json_path, h5_path, mem


def make_nmt_corpus(*, n_pairs: int = 64, src_vocab: int = 30, tgt_vocab: int = 28,
                    src_len: int = 8, tgt_len: int = 9, seed: int = 0):
    """Returns (src [N,S], tgt [N,T]) int32 with onmt id conventions:
    src plain 0-padded; tgt = BOS ... EOS 0-padded."""
    from .. import constants as C

    rng = np.random.RandomState(seed)
    src = np.zeros((n_pairs, src_len), np.int32)
    tgt = np.zeros((n_pairs, tgt_len), np.int32)
    for i in range(n_pairs):
        sl = rng.randint(3, src_len + 1)
        tl = rng.randint(3, tgt_len - 1)
        src[i, :sl] = rng.randint(4, src_vocab, size=sl)
        tgt[i, 0] = C.BOS
        tgt[i, 1: 1 + tl] = rng.randint(4, tgt_vocab, size=tl)
        tgt[i, 1 + tl] = C.EOS
    return src, tgt
