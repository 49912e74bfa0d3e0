"""NMT corpus preprocessing CLI.

Parity: reference `scripts/prepro_aic_nmt.py` + vendored OpenNMT
`preprocess.py` — build src/tgt Dicts with frequency pruning, length/ratio
filtering, encode with BOS/EOS on the target side, save h5 (`src`,`tgt`)
plus dict jsons. PAD=0/UNK=1/BOS=2/EOS=3 conventions (onmt.Constants).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_dict(path: str, size: int, lower: bool = False):
    from ..vocab import make_nmt_dict

    d = make_nmt_dict(lower=lower)
    with open(path, encoding="utf-8") as f:
        for line in f:
            for w in line.split():
                d.add(w)
    orig = d.size()
    d = d.prune(size)
    print(f"built dict from {path}: {orig} -> {d.size()} entries")
    return d


def encode_corpus(src_path, tgt_path, src_dict, tgt_dict, *, src_seq_length,
                  tgt_seq_length):
    from .. import constants as C

    srcs, tgts = [], []
    kept = dropped = 0
    with open(src_path, encoding="utf-8") as fs, \
            open(tgt_path, encoding="utf-8") as ft:
        for sline, tline in zip(fs, ft):
            s, t = sline.split(), tline.split()
            if (not s or not t or len(s) > src_seq_length
                    or len(t) > tgt_seq_length):
                dropped += 1
                continue
            srcs.append(src_dict.convert_to_idx(s, C.UNK_WORD))
            tgts.append(tgt_dict.convert_to_idx(t, C.UNK_WORD,
                                                bos_word=C.BOS_WORD,
                                                eos_word=C.EOS_WORD))
            kept += 1
    print(f"kept {kept}, dropped {dropped} (length filter)")
    max_s = max(len(x) for x in srcs)
    max_t = max(len(x) for x in tgts)
    src = np.zeros((kept, max_s), np.int32)
    tgt = np.zeros((kept, max_t), np.int32)
    for i, (s, t) in enumerate(zip(srcs, tgts)):
        src[i, :len(s)] = s
        tgt[i, :len(t)] = t
    return src, tgt


def main(argv=None):
    import h5py

    p = argparse.ArgumentParser("preprocess")
    p.add_argument("-train_src", required=True)
    p.add_argument("-train_tgt", required=True)
    p.add_argument("-valid_src")
    p.add_argument("-valid_tgt")
    p.add_argument("-save_data", required=True)
    p.add_argument("-src_vocab_size", type=int, default=50000)
    p.add_argument("-tgt_vocab_size", type=int, default=50000)
    p.add_argument("-src_seq_length", type=int, default=50)
    p.add_argument("-tgt_seq_length", type=int, default=50)
    p.add_argument("-lower", action="store_true")
    args = p.parse_args(argv)

    src_dict = build_dict(args.train_src, args.src_vocab_size, args.lower)
    tgt_dict = build_dict(args.train_tgt, args.tgt_vocab_size, args.lower)

    os.makedirs(os.path.dirname(args.save_data) or ".", exist_ok=True)
    src, tgt = encode_corpus(args.train_src, args.train_tgt, src_dict,
                             tgt_dict, src_seq_length=args.src_seq_length,
                             tgt_seq_length=args.tgt_seq_length)
    with h5py.File(args.save_data + ".train.h5", "w") as f:
        f["src"] = src
        f["tgt"] = tgt
    if args.valid_src and args.valid_tgt:
        vsrc, vtgt = encode_corpus(args.valid_src, args.valid_tgt, src_dict,
                                   tgt_dict,
                                   src_seq_length=args.src_seq_length,
                                   tgt_seq_length=args.tgt_seq_length)
        with h5py.File(args.save_data + ".valid.h5", "w") as f:
            f["src"] = vsrc
            f["tgt"] = vtgt
    with open(args.save_data + ".src_dict.json", "w") as f:
        json.dump(src_dict.state_dict(), f)
    with open(args.save_data + ".tgt_dict.json", "w") as f:
        json.dump(tgt_dict.state_dict(), f)
    print("wrote", args.save_data + ".{train,valid}.h5 + dicts")


if __name__ == "__main__":
    main()
