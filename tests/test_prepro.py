"""Functional tests for the preprocessing scripts + raw-image loader."""

import json
import os

import numpy as np
import pytest


def test_prepro_split_tokenize(tmp_path):
    from unpaired_image_captioning_tpu.scripts.prepro_split_tokenize import (
        main, segment_zh)

    assert segment_zh("一个人abc 跑") == ["一", "个", "人", "abc", "跑"] or \
        len(segment_zh("一个人abc 跑")) >= 2  # jieba may segment differently
    anns = [{"image_id": f"im{i}.jpg", "caption": [f"一个人 w{i}"]}
            for i in range(10)]
    with open(tmp_path / "ann.json", "w", encoding="utf-8") as f:
        json.dump(anns, f)
    main(["--inputs", str(tmp_path / "ann.json"), "--output",
          str(tmp_path / "tok.json"), "--num_val", "2", "--num_test", "2"])
    out = json.load(open(tmp_path / "tok.json", encoding="utf-8"))
    assert len(out) == 10
    splits = [o["split"] for o in out]
    assert splits.count("val") == 2 and splits.count("test") == 2
    assert all(isinstance(o["captions"][0], list) for o in out)


def test_prepro_labels_and_ngrams_and_reference_json(tmp_path):
    from unpaired_image_captioning_tpu.scripts.prepro_labels import main as labels
    from unpaired_image_captioning_tpu.scripts.prepro_ngrams import (load_df,
                                                                     main as ngrams)
    from unpaired_image_captioning_tpu.scripts.prepro_reference_json import (
        main as refjson)

    imgs = [{"id": i, "split": "train" if i < 6 else "val",
             "file_path": f"i{i}.jpg",
             "captions": [["猫", "跑"], ["狗", "跳", "高"]]} for i in range(8)]
    with open(tmp_path / "raw.json", "w", encoding="utf-8") as f:
        json.dump(imgs, f)
    labels(["--input_json", str(tmp_path / "raw.json"),
            "--output_json", str(tmp_path / "talk.json"),
            "--output_h5", str(tmp_path / "label.h5"),
            "--max_length", "4", "--word_count_threshold", "0"])
    talk = json.load(open(tmp_path / "talk.json", encoding="utf-8"))
    assert len(talk["ix_to_word"]) == 5  # 猫 跑 狗 跳 高

    ngrams(["--input_label_h5", str(tmp_path / "label.h5"),
            "--input_json", str(tmp_path / "talk.json"),
            "--output", str(tmp_path / "ng.npz"), "--split", "train"])
    df, ref_len = load_df(str(tmp_path / "ng.npz"))
    assert ref_len == 6.0  # 6 train images
    assert all(v <= 6 for v in df.values()) and df

    refjson(["--input_json", str(tmp_path / "talk.json"),
             "--input_label_h5", str(tmp_path / "label.h5"),
             "--output", str(tmp_path / "refs.json"), "--split", "val"])
    refs = json.load(open(tmp_path / "refs.json", encoding="utf-8"))
    assert len(refs["images"]) == 2
    assert len(refs["annotations"]) == 4
    assert refs["type"] == "captions"


def test_make_bu_data(tmp_path):
    import base64
    import csv

    from unpaired_image_captioning_tpu.scripts.make_bu_data import main

    feats = np.random.RandomState(0).randn(3, 8).astype(np.float32)
    boxes = np.abs(np.random.RandomState(1).randn(3, 4)).astype(np.float32)
    with open(tmp_path / "bu.tsv", "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["42", "640", "480", "3",
                    base64.b64encode(boxes.tobytes()).decode(),
                    base64.b64encode(feats.tobytes()).decode()])
    main(["--input_tsvs", str(tmp_path / "bu.tsv"),
          "--output_dir", str(tmp_path / "bu"), "--feat_dim", "8"])
    fc = np.load(tmp_path / "bu_fc" / "42.npy")
    att = np.load(tmp_path / "bu_att" / "42.npz")["feat"]
    box = np.load(tmp_path / "bu_box" / "42.npy")
    np.testing.assert_allclose(fc, feats.mean(0), rtol=1e-6)
    np.testing.assert_allclose(att, feats, rtol=1e-6)
    np.testing.assert_allclose(box, boxes, rtol=1e-6)


def test_raw_image_loader(tmp_path):
    from unpaired_image_captioning_tpu.data.raw_images import RawImageLoader

    rng = np.random.RandomState(0)
    for i in range(3):
        np.save(tmp_path / f"img{i}.npy",
                rng.randint(0, 255, (40, 50, 3)).astype(np.uint8))
    loader = RawImageLoader(folder_path=str(tmp_path), batch_size=2,
                            att_size=2, depth="resnet50", image_size=64)
    data = loader.get_batch()
    assert data["fc_feats"].shape == (2, 2048)
    assert data["att_feats"].shape == (2, 4, 2048)
    assert np.isfinite(data["fc_feats"]).all()
    data2 = loader.get_batch()
    assert data2["bounds"]["wrapped"]  # 3 images, batch 2 -> wraps


def test_nmt_preprocess_cli(tmp_path, capsys):
    """cli.preprocess: shuffle-then-length-sort (prepro_aic_nmt.py:276-296),
    BPE learn+apply (vendored subword-nmt role), existing-dict reuse, and
    the dict-coverage report."""
    import h5py

    from unpaired_image_captioning_tpu.cli import preprocess

    rng = np.random.RandomState(0)
    words = [f"tok{i}" for i in range(30)]
    src_lines, tgt_lines = [], []
    for _ in range(60):
        n = rng.randint(1, 9)
        src_lines.append(" ".join(words[j] for j in rng.randint(0, 30, n)))
        tgt_lines.append(" ".join(words[j] for j in rng.randint(0, 30, n)))
    (tmp_path / "train.src").write_text("\n".join(src_lines))
    (tmp_path / "train.tgt").write_text("\n".join(tgt_lines))

    save = str(tmp_path / "nmt")
    preprocess.main(["-train_src", str(tmp_path / "train.src"),
                     "-train_tgt", str(tmp_path / "train.tgt"),
                     "-save_data", save, "-src_vocab_size", "20",
                     "-shuffle", "1"])
    out = capsys.readouterr().out
    assert "dict coverage" in out
    with h5py.File(save + ".train.h5") as f:
        src = f["src"][...]
    # sorted by src length ascending (stable after the shuffle)
    lens = (src > 0).sum(1)
    assert (np.diff(lens) >= 0).all()
    # pruned src dict -> UNKs present, coverage < 100
    assert (src == 1).any()

    # shuffle changes within-length order but not the sorted-length profile
    preprocess.main(["-train_src", str(tmp_path / "train.src"),
                     "-train_tgt", str(tmp_path / "train.tgt"),
                     "-save_data", save + "2", "-src_vocab_size", "20",
                     "-shuffle", "1", "-seed", "77"])
    with h5py.File(save + "2.train.h5") as f:
        src2 = f["src"][...]
    assert ((src2 > 0).sum(1) == lens).all()
    assert not np.array_equal(src2, src)

    # dict reuse: -src_vocab loads the exact same dict
    preprocess.main(["-train_src", str(tmp_path / "train.src"),
                     "-train_tgt", str(tmp_path / "train.tgt"),
                     "-save_data", save + "3",
                     "-src_vocab", save + ".src_dict.json", "-shuffle", "0"])
    a = json.load(open(save + ".src_dict.json"))
    b = json.load(open(save + "3.src_dict.json"))
    assert a == b

    # BPE: learned codes file + segmented stream encodes without UNK
    preprocess.main(["-train_src", str(tmp_path / "train.src"),
                     "-train_tgt", str(tmp_path / "train.tgt"),
                     "-save_data", save + "bpe", "-src_bpe_merges", "50",
                     "-src_seq_length", "200", "-shuffle", "0"])
    assert os.path.exists(save + "bpe.src_bpe.codes")
    with h5py.File(save + "bpe.train.h5") as f:
        srcb = f["src"][...]
    # subword vocab is closed over the corpus -> full coverage
    assert not (srcb == 1).any()


def test_nmt_preprocess_word_features(tmp_path, capsys):
    """onmt `word￨feat` token syntax (fork onmt/IO.py:67-91 extractFeatures
    + readSrcLine/readTgtLine): word dicts see only the word part, per-column
    feature dicts are built unpruned, feature streams are encoded aligned
    with the words (src plain, tgt with the BOS/EOS offset), and the arrays
    survive the shuffle+length-sort together."""
    import h5py

    from unpaired_image_captioning_tpu.cli import preprocess
    from unpaired_image_captioning_tpu.vocab import (Dict, extract_features,
                                                     make_nmt_dict)

    # unit: extractFeatures semantics incl. the empty-word skip
    words, feats, n = extract_features(
        ["the￨DT", "cat￨NN", "￨X", "sat￨VBD"])
    assert words == ["the", "cat", "sat"]
    assert n == 1 and feats == [["DT", "NN", "VBD"]]
    assert extract_features(["plain", "tokens"])[2] == 0

    rng = np.random.RandomState(1)
    pos = ["DT", "NN", "VBD", "IN"]
    src_lines, tgt_lines = [], []
    for _ in range(20):
        k = rng.randint(1, 6)
        toks = [f"w{rng.randint(0, 12)}￨{pos[rng.randint(0, 4)]}"
                for _ in range(k)]
        src_lines.append(" ".join(toks))
        tgt_lines.append(" ".join(f"t{rng.randint(0, 9)}"
                                  for _ in range(rng.randint(1, 6))))
    (tmp_path / "f.src").write_text("\n".join(src_lines), encoding="utf-8")
    (tmp_path / "f.tgt").write_text("\n".join(tgt_lines), encoding="utf-8")

    save = str(tmp_path / "feat")
    preprocess.main(["-train_src", str(tmp_path / "f.src"),
                     "-train_tgt", str(tmp_path / "f.tgt"),
                     "-save_data", save, "-shuffle", "1"])
    out = capsys.readouterr().out
    assert "word features: src 1 / tgt 0 columns" in out

    fdict = Dict.from_state_dict(
        json.load(open(save + ".src_feature_0.dict.json")))
    base = make_nmt_dict().size()
    assert fdict.size() == base + 4  # the 4 POS tags after the specials
    sdict = Dict.from_state_dict(json.load(open(save + ".src_dict.json")))
    assert sdict.lookup("DT") is None  # features never leak into word dict
    assert sdict.lookup("w0") is not None

    with h5py.File(save + ".train.h5") as f:
        src, feat = f["src"][...], f["src_feat_0"][...]
        assert "tgt_feat_0" not in f
    # feature rows align with word rows: same pad profile, feature id is
    # the dict id of the POS tag attached to that word slot
    assert feat.shape == src.shape
    assert ((feat > 0) == (src > 0)).all()
    # every encoded feature is one of the 4 tags (never UNK: dict unpruned)
    ids = {fdict.lookup(t) for t in pos}
    assert set(np.unique(feat[feat > 0])) <= ids


def test_word_features_train_translate_e2e(tmp_path, capsys):
    """Close the feature loop the fork closes in train.py:370-384: the
    preprocess artifacts feed NMTDataset (src_feat_* picked up from h5),
    the featured NMTModel (encoder feature LUTs + merge MLP, fork
    Models.py:110-125) trains a step and beam-translates — the `￨`
    surface is consumable end-to-end, not just IO."""
    import h5py
    import jax
    import jax.numpy as jnp
    import optax

    from unpaired_image_captioning_tpu.cli import preprocess
    from unpaired_image_captioning_tpu.data.nmt_dataset import NMTDataset
    from unpaired_image_captioning_tpu.losses.criterion import nmt_loss
    from unpaired_image_captioning_tpu.models.nmt import NMTModel
    from unpaired_image_captioning_tpu.vocab import Dict

    rng = np.random.RandomState(5)
    pos = ["DT", "NN", "VBD"]
    src_lines, tgt_lines = [], []
    for _ in range(16):
        k = rng.randint(2, 6)
        src_lines.append(" ".join(
            f"w{rng.randint(0, 10)}￨{pos[rng.randint(0, 3)]}"
            for _ in range(k)))
        tgt_lines.append(" ".join(f"t{rng.randint(0, 8)}"
                                  for _ in range(rng.randint(1, 5))))
    (tmp_path / "e.src").write_text("\n".join(src_lines), encoding="utf-8")
    (tmp_path / "e.tgt").write_text("\n".join(tgt_lines), encoding="utf-8")
    save = str(tmp_path / "e2e")
    preprocess.main(["-train_src", str(tmp_path / "e.src"),
                     "-train_tgt", str(tmp_path / "e.tgt"),
                     "-save_data", save, "-shuffle", "1"])
    capsys.readouterr()

    ds = NMTDataset.from_h5(save + ".train.h5", batch_size=4)
    batch, _ = ds.next_batch()
    assert batch["src_feats"].shape == batch["src"].shape + (1,)

    sdict = Dict.from_state_dict(json.load(open(save + ".src_dict.json")))
    tdict = Dict.from_state_dict(json.load(open(save + ".tgt_dict.json")))
    fdict = Dict.from_state_dict(
        json.load(open(save + ".src_feature_0.dict.json")))
    model = NMTModel(src_vocab_size=sdict.size(), tgt_vocab_size=tdict.size(),
                     word_vec_size=12, rnn_size=16, layers=1, dropout=0.0,
                     src_feature_sizes=(fdict.size(),), feature_vec_size=6)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o, b):
        def loss_fn(p):
            outs, _ = model.forward(p, b["src"], b["lengths"], b["tgt"],
                                    src_feats=b["src_feats"])
            loss, _ = nmt_loss(model.generator_logits(p, outs),
                               b["tgt"][:, 1:])
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(grads, o)
        return optax.apply_updates(p, up), o, loss

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    l0 = None
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, jb)
        l0 = float(loss) if l0 is None else l0
    assert np.isfinite(float(loss)) and float(loss) < l0

    res = model.translate_batch(params, jb["src"], jb["lengths"],
                                beam_size=3, max_len=8,
                                src_feats=jb["src_feats"])
    assert np.asarray(res.seq).shape[:2] == (4, 3)
