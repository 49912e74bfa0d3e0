"""Language-pivot coupling: joint vocab alignment + single-graph pivoted
inference (image → zh captioner → zh→en NMT).

Parity:
- joint vocab between the captioner's zh vocab and the NMT source Dict,
  cached by the reference to `pivot.joint_vocab.pt`
  (misc/criterion.py:313-353); used by the `Weight_Trans` embedding
  alignment MSE (:359-364) and its target-side twin `Weight_Trans_y`
  (:366-434);
- pivoted inference: the reference decodes zh captions to a json, converts
  to text, and runs a *separate OpenNMT process* on it
  (eval_pivot.py:154-161), or in-process `nmt_model.translate(srcBatch)`
  (eval_utils.py:329-473). Here the captioner's decoded zh ids are mapped
  to NMT source ids with a device-resident alignment gather and flow
  straight into the NMT encoder — one compiled graph, no host hop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .vocab import CaptionVocab, Dict


def build_joint_vocab(cap_vocab: CaptionVocab, nmt_dict: Dict
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Rows (cap_ix, nmt_ix) for every surface form present in both vocabs
    (parity: criterion.py:313-353). Returns two aligned int32 index arrays
    usable by losses.criterion.weight_trans_loss."""
    cap_rows, nmt_rows = [], []
    for ix_str, word in cap_vocab.ix_to_word.items():
        j = nmt_dict.lookup(word)
        if j is not None:
            cap_rows.append(int(ix_str))
            nmt_rows.append(int(j))
    return (np.asarray(cap_rows, np.int32), np.asarray(nmt_rows, np.int32))


def build_caption_to_nmt_map(cap_vocab: CaptionVocab, nmt_src_dict: Dict
                             ) -> np.ndarray:
    """Dense id map [cap_vocab+1] -> nmt src id (UNK where missing, 0->PAD).

    Device gather table for the fused pivot graph: zh caption ids out of the
    captioner become NMT encoder input ids with one `take`.
    """
    table = np.full((cap_vocab.vocab_size + 1,), C.UNK, np.int32)
    table[0] = C.PAD
    for ix_str, word in cap_vocab.ix_to_word.items():
        j = nmt_src_dict.lookup(word)
        if j is not None:
            table[int(ix_str)] = int(j)
    return table


def captions_to_nmt_batch(cap_seqs: jax.Array, cap2nmt: jax.Array,
                          *, add_bos_eos: bool = False):
    """Map decoded caption ids to an NMT batch (src, lengths).

    Parity: `Trainer.zh_en_mapping` (reference trainer.py:109-139) — the
    train-time bridge that batches captioner-produced zh token sequences for
    the NMT model. Host-free: one gather through the dense id map.

    cap_seqs: [B, T] caption ids (0-terminated); cap2nmt: [cap_vocab+1] id
    map (build_caption_to_nmt_map). When add_bos_eos, wraps with BOS/EOS for
    use as an NMT *target* (pseudo-pair training).
    """
    src = jnp.take(cap2nmt, cap_seqs, axis=0)
    lengths = jnp.maximum(jnp.sum(cap_seqs > 0, axis=-1), 1).astype(jnp.int32)
    if not add_bos_eos:
        return src, lengths
    b, t = src.shape
    out = jnp.zeros((b, t + 2), src.dtype)
    out = out.at[:, 0].set(C.BOS)
    out = out.at[:, 1:-1].set(src)
    pos = jnp.arange(t + 2)[None, :]
    out = jnp.where(pos == (lengths + 1)[:, None], C.EOS, out)
    out = jnp.where(pos > (lengths + 1)[:, None], C.PAD, out)
    return out, lengths + 2


def pivot_translate(cap_model, cap_params, nmt_model, nmt_params, feats,
                    cap2nmt: jax.Array, *, cap_beam: int = 5,
                    nmt_beam: int = 15, nmt_max_len: int = 100,
                    src2tgt=None):
    """Image features → zh caption (beam) → en translation (beam), one
    on-device program. Returns (zh_seq [B, Tc], en_seq [B, Tn], en_attn_argmax).

    src2tgt: optional Dict.align map; with a copy-attention NMT model the
    translation beam then runs over the extended dynamic vocab (reference
    nmt_translator's copy-scoring path, misc/nmt_translator.py:124-144) and
    en_seq is returned already collapsed (extended ids -> UNK, with the copy
    positions folded into the attn-argmax channel for surface replacement).
    """
    res = cap_model.sample_beam(cap_params, feats, beam_size=cap_beam)
    zh = res.seq[:, 0]                                     # top beam [B, Tc]
    src = jnp.take(cap2nmt, zh, axis=0)                    # zh ids -> nmt ids
    lengths = jnp.maximum(jnp.sum(zh > 0, axis=-1), 1).astype(jnp.int32)
    # zero-out positions past the caption (cap2nmt[0] = PAD already)
    tr = nmt_model.translate_batch(nmt_params, src, lengths,
                                   beam_size=nmt_beam, max_len=nmt_max_len,
                                   src2tgt=src2tgt)
    en, aux = tr.seq[:, 0], tr.aux[:, 0]
    if src2tgt is not None and getattr(nmt_model, "copy_attn", False):
        en, copy_pos = nmt_model.resolve_extended(en)
        aux = jnp.where(copy_pos >= 0, copy_pos, aux)  # exact copies win
    return zh, en, aux
