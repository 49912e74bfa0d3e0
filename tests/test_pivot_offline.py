"""Offline (stage-separated) pivot pipeline vs the fused on-device path.

The reference's eval_pivot runs i2t -> json -> txt -> SEPARATE OpenNMT
translate process -> txt -> json -> language_eval (eval_pivot.py:147-193);
eval_unpaired runs the same two models in-process (eval_unpaired.py:412-482).
Our cli.eval_pivot reproduces the staged pipeline (exercising the standalone
translate CLI's file-in/file-out path), and its English predictions must be
IDENTICAL to the fused cli.eval_unpaired output on the same run dir —
VERDICT r1 "Next" #9.
"""

import json
import os

import numpy as np
import pytest

from unpaired_image_captioning_tpu import constants as C
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.data.dataloader import CaptionDataLoader
from unpaired_image_captioning_tpu.data.nmt_dataset import NMTDataset
from unpaired_image_captioning_tpu.data.synthetic import make_caption_artifacts
from unpaired_image_captioning_tpu.train.trainer import Trainer
from unpaired_image_captioning_tpu.vocab import Dict

ZH_V = 24
NMT_SRC_V = 24 + 4 + 1   # specials + zh words + sink slot
NMT_TGT_V = 40
OFF = 8                  # tgt id = src id + OFF


def _mk_dict(labels_by_id):
    d = Dict([C.PAD_WORD, C.UNK_WORD, C.BOS_WORD, C.EOS_WORD])
    for i, lab in labels_by_id.items():
        d.idx_to_label[i] = lab
        d.label_to_idx[lab] = i
    return d


def test_offline_pivot_matches_fused(tmp_path, monkeypatch):
    jpath, h5path, mem = make_caption_artifacts(str(tmp_path), n_images=8,
                                                vocab_size=ZH_V, seq_length=6,
                                                caps_per_img=2, seed=3)
    # features on disk for the CLI loaders
    fc_dir, att_dir = str(tmp_path / "fc"), str(tmp_path / "att")
    os.makedirs(fc_dir), os.makedirs(att_dir)
    for i, v in mem["fc"].items():
        np.savez(os.path.join(fc_dir, f"{i}.npz"), feat=v)
    for i, v in mem["att"].items():
        np.savez(os.path.join(att_dir, f"{i}.npz"), feat=v)

    # deterministic zh->en corpus: src ids 4..27 (the caption words), tgt
    # ids shifted by OFF
    rng = np.random.RandomState(0)
    n_pairs, slen = 192, 6
    src = np.zeros((n_pairs, slen), np.int32)
    tgt = np.zeros((n_pairs, slen + 2), np.int32)
    for i in range(n_pairs):
        ln = rng.randint(2, slen + 1)
        s = rng.randint(4, 4 + ZH_V, size=ln)
        src[i, :ln] = s
        tgt[i, 0] = C.BOS
        tgt[i, 1:1 + ln] = s + OFF
        tgt[i, 1 + ln] = C.EOS
    nmt_ds = NMTDataset(src, tgt, batch_size=32, shuffle=True)

    loader = CaptionDataLoader(input_json=jpath, input_label_h5=h5path,
                               batch_size=4, seq_per_img=2, att_feat_size=24,
                               attri_feat_size=16, in_memory=mem,
                               nmt_dataset=nmt_ds)
    run = str(tmp_path / "run")
    cfg = Config(caption_model="fc", vocab_size=ZH_V, rnn_size=48,
                 num_layers=1, input_encoding_size=24, fc_feat_size=32,
                 att_feat_size=24, attri_feat_size=16, seq_length=6,
                 drop_prob_lm=0.0, batch_size=4, seq_per_img=2,
                 i2t_train_flag=True, nmt_train_flag=True,
                 nmt_src_vocab_size=NMT_SRC_V, nmt_tgt_vocab_size=NMT_TGT_V,
                 word_vec_size=24, layers=1, dropout=0.0,
                 i2t_learning_rate=5e-3, nmt_optim="adam",
                 nmt_learning_rate=5e-3, checkpoint_path=run,
                 input_json=jpath, input_label_h5=h5path,
                 input_fc_dir=fc_dir, input_att_dir=att_dir)
    tr = Trainer(cfg)
    for _ in range(150):
        tr.train(loader.get_batch("train"))
    tr.save()
    tr.save(best=True)  # eval CLIs default to --load_best_score 1
    assert os.path.exists(os.path.join(run, "nmt_config.json"))

    # dicts: src labels ARE the caption vocab words (w0..w23) at ids 4..27
    # (the real setup: NMT src dict covers the zh caption vocabulary)
    src_dict = _mk_dict({i + 4: f"w{i}" for i in range(ZH_V)})
    tgt_dict = _mk_dict({j + 4: f"t{j}" for j in range(NMT_TGT_V - 4)})
    with open(os.path.join(run, "src_dict.json"), "w") as f:
        json.dump(src_dict.state_dict(), f)
    with open(os.path.join(run, "tgt_dict.json"), "w") as f:
        json.dump(tgt_dict.state_dict(), f)

    monkeypatch.chdir(tmp_path)
    argv = ["--start_from", run, "--input_json", jpath,
            "--input_label_h5", h5path, "--input_fc_dir", fc_dir,
            "--input_att_dir", att_dir, "--batch_size", "4",
            "--beam_size", "2", "--id", "offline"]

    from unpaired_image_captioning_tpu.cli import eval_pivot, eval_unpaired

    eval_unpaired.main(argv)
    fused = json.load(open("eval_results/unpaired_offline_test.json"))
    staged = eval_pivot.main(argv)

    # stage artifacts exist (json -> txt -> translate -> json trail)
    assert os.path.exists("tmp/offline_zh_coco.json")
    assert os.path.exists("tmp/offline_zh_coco.txt")
    assert os.path.exists("tmp/offline_en_coco.txt")

    fused_en = {p["image_id"]: p["caption"] for p in fused["en_predictions"]}
    staged_en = {p["image_id"]: p["caption"]
                 for p in staged["en_predictions"]}
    fused_zh = {p["image_id"]: p["caption"] for p in fused["zh_predictions"]}
    staged_zh = {p["image_id"]: p["caption"]
                 for p in staged["zh_predictions"]}
    assert staged_zh == fused_zh, (staged_zh, fused_zh)
    assert staged_en == fused_en, (staged_en, fused_en)
    assert any(staged_en.values()), "no english output produced"
