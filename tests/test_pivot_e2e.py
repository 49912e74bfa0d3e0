"""End-to-end pivot integration: captioner + NMT trained jointly, then the
fused pivot path must produce the NMT's mapping of the captioner's zh
output (the whole ECCV'18 pipeline in miniature).

Construction: the zh->en corpus is a deterministic token mapping
(en_id = zh_id + OFFSET), which an attention seq2seq learns quickly; the
captioner overfits a few images. The pivot output then must equal the
mapped captioner output token-for-token (prefix before EOS).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu import constants as C
from unpaired_image_captioning_tpu import pivot
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.data.dataloader import CaptionDataLoader
from unpaired_image_captioning_tpu.data.nmt_dataset import NMTDataset
from unpaired_image_captioning_tpu.data.synthetic import make_caption_artifacts
from unpaired_image_captioning_tpu.models.base import Features
from unpaired_image_captioning_tpu.train.trainer import Trainer

ZH_V = 24          # caption vocab (ids 1..24)
NMT_SRC_V = 30     # 4 specials + zh surface ids
NMT_TGT_V = 60     # 4 specials + mapped en ids
OFF = 26           # en_id = src_id + OFF (within tgt vocab)


def test_pivot_learns_mapping(tmp_path):
    # --- synthetic caption data + deterministic mapping corpus ---
    jpath, h5path, mem = make_caption_artifacts(str(tmp_path), n_images=8,
                                                vocab_size=ZH_V, seq_length=6,
                                                caps_per_img=2, seed=3)
    rng = np.random.RandomState(0)
    n_pairs, slen = 256, 6
    src = np.zeros((n_pairs, slen), np.int32)
    tgt = np.zeros((n_pairs, slen + 2), np.int32)
    for i in range(n_pairs):
        ln = rng.randint(2, slen + 1)
        s = rng.randint(4, 4 + ZH_V, size=ln)  # src ids 4..27
        src[i, :ln] = s
        tgt[i, 0] = C.BOS
        tgt[i, 1:1 + ln] = s + OFF
        tgt[i, 1 + ln] = C.EOS
    nmt_ds = NMTDataset(src, tgt, batch_size=32, shuffle=True)

    loader = CaptionDataLoader(input_json=jpath, input_label_h5=h5path,
                               batch_size=4, seq_per_img=2, att_feat_size=24,
                               attri_feat_size=16, in_memory=mem,
                               nmt_dataset=nmt_ds)

    cfg = Config(caption_model="fc", vocab_size=ZH_V, rnn_size=48,
                 num_layers=1, input_encoding_size=24, fc_feat_size=32,
                 att_feat_size=24, attri_feat_size=16, seq_length=6,
                 drop_prob_lm=0.0, batch_size=4, seq_per_img=2,
                 i2t_train_flag=True, nmt_train_flag=True,
                 nmt_src_vocab_size=NMT_SRC_V, nmt_tgt_vocab_size=NMT_TGT_V,
                 word_vec_size=24, layers=1, dropout=0.0,
                 i2t_learning_rate=5e-3, nmt_optim="adam",
                 nmt_learning_rate=5e-3,
                 checkpoint_path=str(tmp_path / "save"))
    tr = Trainer(cfg)

    nmt_acc = 0.0
    for step in range(420):
        m = tr.train(loader.get_batch("train"))
        nmt_acc = m["nmt_acc"]
    assert nmt_acc > 95.0, f"NMT failed to learn the mapping: acc={nmt_acc}"

    # --- fused pivot: caption -> map ids -> translate ---
    # zh caption id k corresponds to NMT src id k+3 (4 specials, ids 4..27
    # cover zh 1..24)
    cap2nmt = np.zeros((ZH_V + 1,), np.int32)
    cap2nmt[1:] = np.arange(1, ZH_V + 1) + 3
    data = loader.get_batch("train")
    feats = Features(fc_feats=jnp.asarray(data["fc_feats"][:4]),
                     att_feats=jnp.asarray(data["att_feats"][:4]),
                     attri_feats=jnp.asarray(data["attri_feats"][:4]),
                     att_masks=jnp.asarray(data["att_masks"][:4]))
    zh, en, attn = pivot.pivot_translate(
        tr.i2t_model, tr.i2t_params, tr.nmt_model, tr.nmt_params, feats,
        jnp.asarray(cap2nmt), cap_beam=2, nmt_beam=3, nmt_max_len=8)
    zh = np.asarray(zh)
    en = np.asarray(en)

    checked = 0
    for b in range(zh.shape[0]):
        zh_toks = zh[b][zh[b] > 0]
        if len(zh_toks) == 0:
            continue
        expected = cap2nmt[zh_toks] + OFF
        got = []
        for tok in en[b]:
            if tok in (C.PAD, C.EOS):
                break
            if tok != C.BOS:
                got.append(int(tok))
        # the translation of the caption must match the mapping on the
        # aligned prefix (allow length slack at the tail)
        k = min(len(expected), len(got))
        assert k > 0
        agree = sum(1 for i in range(k) if got[i] == expected[i])
        assert agree / k > 0.8, (
            f"b={b}: zh={zh_toks} expected={expected} got={got}")
        checked += 1
    assert checked >= 2
