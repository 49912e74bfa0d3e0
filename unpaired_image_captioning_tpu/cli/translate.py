"""Standalone NMT translate CLI.

Parity: reference `misc/OpenNMT-py-dalegebit/translate.py` — load an NMT
checkpoint, translate a tokenized source file with beam search, UNK-replace
from attention argmax, write hypotheses (+ optional n-best / scores).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from .. import constants as C
    from ..models.nmt import NMTModel
    from ..train.checkpoint import load_json, load_pytree
    from ..vocab import Dict

    p = argparse.ArgumentParser("translate")
    p.add_argument("-model", required=True, help="run dir with model_nmt.msgpack + nmt_config.json + dicts")
    p.add_argument("-src", required=True)
    p.add_argument("-output", default="pred.txt")
    p.add_argument("-beam_size", type=int, default=15)
    p.add_argument("-max_sent_length", type=int, default=100)
    p.add_argument("-batch_size", type=int, default=30)
    p.add_argument("-n_best", type=int, default=1)
    p.add_argument("-replace_unk", action="store_true", default=True)
    args = p.parse_args(argv)

    nmt_cfg = load_json(f"{args.model}/nmt_config.json")
    src_dict = Dict.from_state_dict(load_json(f"{args.model}/src_dict.json"))
    tgt_dict = Dict.from_state_dict(load_json(f"{args.model}/tgt_dict.json"))
    kind = nmt_cfg.pop("model_type", "rnn")
    if kind == "transformer":
        from ..models.nmt_transformer import TransformerNMTModel

        model = TransformerNMTModel(**nmt_cfg)
    else:
        model = NMTModel(**nmt_cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params = load_pytree(f"{args.model}/model_nmt.msgpack", params)

    with open(args.src, encoding="utf-8") as f:
        lines = [l.split() for l in f]
    max_len = max(max((len(l) for l in lines), default=1), 1)
    out_lines = []
    for i in range(0, len(lines), args.batch_size):
        chunk = lines[i: i + args.batch_size]
        src = np.zeros((len(chunk), max_len), np.int32)
        for bi, toks in enumerate(chunk):
            ids = src_dict.convert_to_idx(toks, C.UNK_WORD)
            src[bi, :len(ids)] = ids
        # empty source lines (possible in pipeline use) still need a valid
        # length-1 window for the masked encoder scans
        lengths = np.maximum((src != C.PAD).sum(1), 1).astype(np.int32)
        src2tgt = (jnp.asarray(src_dict.align(tgt_dict))
                   if model.copy_attn else None)
        res = model.translate_batch(params, jnp.asarray(src),
                                    jnp.asarray(lengths),
                                    beam_size=args.beam_size,
                                    max_len=args.max_sent_length,
                                    src2tgt=src2tgt)
        copy_pos = None
        if src2tgt is not None:
            # extended dynamic vocab: ids >= V are exact source copies
            tgt_seq, pos = model.resolve_extended(res.seq)
            seqs = np.asarray(tgt_seq)
            copy_pos = np.asarray(pos)
        else:
            seqs = np.asarray(res.seq)
        attn = np.asarray(res.aux)
        for bi, toks in enumerate(chunk):
            for k in range(args.n_best):
                words = []
                for t, tok in enumerate(seqs[bi, k]):
                    tok = int(tok)
                    if tok in (C.PAD, C.EOS):
                        break
                    if tok == C.BOS:
                        continue
                    if tok == C.UNK and args.replace_unk and toks:
                        # exact copy position from the extended vocab when
                        # available; else source token with max attention
                        # (parity: NMT_Models.buildTargetTokens :312-320)
                        if copy_pos is not None and copy_pos[bi, k, t] >= 0:
                            j = min(int(copy_pos[bi, k, t]), len(toks) - 1)
                        else:
                            j = min(int(attn[bi, k, t]), len(toks) - 1)
                        words.append(toks[j])
                    else:
                        words.append(tgt_dict.get_label(tok, C.UNK_WORD))
                if k == 0:
                    out_lines.append(" ".join(words))
    with open(args.output, "w", encoding="utf-8") as f:
        f.write("\n".join(out_lines) + "\n")
    print(f"translated {len(out_lines)} sentences -> {args.output}")


if __name__ == "__main__":
    main()
