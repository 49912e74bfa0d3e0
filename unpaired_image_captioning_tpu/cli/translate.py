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
    p.add_argument("-tgt", default=None,
                   help="gold target file: report per-sentence GOLD SCORE "
                   "and GOLD AVG SCORE / GOLD PPL (fork translate.py "
                   "-tgt + reportScore:74-77 — the fork's own gold-scoring "
                   "block cannot execute, see NMTModel.gold_scores)")
    p.add_argument("-output", default="pred.txt")
    p.add_argument("-beam_size", type=int, default=15)
    p.add_argument("-max_sent_length", type=int, default=100)
    p.add_argument("-batch_size", type=int, default=30)
    p.add_argument("-n_best", type=int, default=1)
    p.add_argument("-replace_unk", action="store_true", default=True)
    p.add_argument("-copy_mode", choices=("extended", "fold"),
                   default="extended",
                   help="copy-attention beam scoring: 'extended' decodes "
                   "over the extended dynamic vocab (exact source copies); "
                   "'fold' reproduces the reference Translator's own "
                   "decode-time scoring (copy mass folded onto align-mapped "
                   "ids, onmt/Translator.py:207-226)")
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
    tgt_lines = None
    if args.tgt:
        with open(args.tgt, encoding="utf-8") as f:
            tgt_lines = [l.split() for l in f]
        assert len(tgt_lines) == len(lines), "-src/-tgt line count mismatch"
    max_len = max(max((len(l) for l in lines), default=1), 1)
    out_lines = []
    pred_score_total = pred_words_total = 0.0
    gold_score_total = gold_words_total = 0.0
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
        kw = {"copy_mode": args.copy_mode} if src2tgt is not None else {}
        res = model.translate_batch(params, jnp.asarray(src),
                                    jnp.asarray(lengths),
                                    beam_size=args.beam_size,
                                    max_len=args.max_sent_length,
                                    src2tgt=src2tgt, **kw)
        copy_pos = None
        if src2tgt is not None and args.copy_mode == "extended":
            # extended dynamic vocab: ids >= V are exact source copies
            tgt_seq, pos = model.resolve_extended(res.seq)
            seqs = np.asarray(tgt_seq)
            copy_pos = np.asarray(pos)
        else:
            # fold mode decodes plain vocab ids; UNK copies resolve below
            # via the attention argmax, like the reference's replace_unk
            seqs = np.asarray(res.seq)
        attn = np.asarray(res.aux)
        if tgt_lines is not None:
            # gold log-likelihoods (fork translate.py -tgt; the reference's
            # own scoring block cannot execute — NMTModel.gold_scores)
            gchunk = tgt_lines[i: i + args.batch_size]
            gt = max(max((len(t) for t in gchunk), default=0), 1) + 2
            tgt = np.zeros((len(gchunk), gt), np.int32)
            for bi, toks in enumerate(gchunk):
                ids = tgt_dict.convert_to_idx(toks, C.UNK_WORD,
                                              bos_word=C.BOS_WORD,
                                              eos_word=C.EOS_WORD)
                tgt[bi, :len(ids)] = ids
            gscores = np.asarray(model.gold_scores(
                params, jnp.asarray(src), jnp.asarray(lengths),
                jnp.asarray(tgt)))
            gold_score_total += float(gscores.sum())
            gold_words_total += sum(len(t) for t in gchunk)
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
                    pred_score_total += float(np.asarray(res.scores)[bi, 0])
                    pred_words_total += len(words)
    with open(args.output, "w", encoding="utf-8") as f:
        f.write("\n".join(out_lines) + "\n")
    # reportScore (fork translate.py:74-77)
    import math
    if pred_words_total:
        print("PRED AVG SCORE: %.4f, PRED PPL: %.4f" % (
            pred_score_total / pred_words_total,
            math.exp(-pred_score_total / pred_words_total)))
    if tgt_lines is not None and gold_words_total:
        print("GOLD AVG SCORE: %.4f, GOLD PPL: %.4f" % (
            gold_score_total / gold_words_total,
            math.exp(-gold_score_total / gold_words_total)))
    print(f"translated {len(out_lines)} sentences -> {args.output}")


if __name__ == "__main__":
    main()
