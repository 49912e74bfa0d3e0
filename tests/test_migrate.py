"""Reference-run migration CLI test with synthetic torch artifacts."""

import json
import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from unpaired_image_captioning_tpu.scripts.migrate_reference import main as migrate


def test_migrate_full_run(tmp_path):
    import torch.nn as nn

    # synthetic reference-shaped artifacts --------------------------------
    # i2t: FCModel_NMT-shaped state dict
    V, E, H, FC = 10, 8, 12, 14
    i2t = nn.ModuleDict({
        "img_embed": nn.Linear(FC, E),
        "embed": nn.Embedding(V + 1, E),
        "logit": nn.Linear(H, V + 1),
    })
    state = {f"{k}.{n}": t for k, m in i2t.items()
             for n, t in m.state_dict().items()}
    state["core.i2h.weight"] = torch.randn(5 * H, E)
    state["core.i2h.bias"] = torch.randn(5 * H)
    state["core.h2h.weight"] = torch.randn(5 * H, H)
    state["core.h2h.bias"] = torch.randn(5 * H)
    torch.save(state, tmp_path / "model_i2t-best.pth")

    # wtoi pickle
    with open(tmp_path / "wtoi_zh.txt", "wb") as f:
        pickle.dump({f"w{i}": i + 1 for i in range(V)}, f, protocol=0)

    # nmt corpus .pt with onmt-style dict surrogate (plain id->label map)
    blob = {"train": {"src": [torch.tensor([4, 5]), torch.tensor([6])],
                      "tgt": [torch.tensor([2, 7, 3]), torch.tensor([2, 8, 3])]},
            "dicts": {"src": {0: "<blank>", 1: "<unk>", 4: "a", 5: "b", 6: "c"},
                      "tgt": {0: "<blank>", 2: "<s>", 3: "</s>", 7: "x", 8: "y"}}}
    torch.save(blob, tmp_path / "nmt.train.pt")

    out = tmp_path / "run"
    migrate(["--out_dir", str(out), "--caption_model", "fc",
             "--i2t_pth", str(tmp_path / "model_i2t-best.pth"),
             "--wtoi_zh", str(tmp_path / "wtoi_zh.txt"),
             "--nmt_pt", str(tmp_path / "nmt.train.pt")])

    assert os.path.exists(out / "model_i2t-best.msgpack")
    assert os.path.exists(out / "nmt.train.h5")
    infos = json.load(open(out / "infos-best.json"))
    assert infos["opt"]["vocab_size"] == V
    assert infos["vocab"]["1"] == "w0"
    src_dict = json.load(open(out / "src_dict.json"))
    assert src_dict["idx_to_label"]["4"] == "a"

    # converted captioner params load into the model and decode
    import jax
    import jax.numpy as jnp

    from unpaired_image_captioning_tpu import models
    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.models.base import Features
    from unpaired_image_captioning_tpu.train.checkpoint import load_pytree

    cfg = Config(caption_model="fc", vocab_size=V, rnn_size=H, num_layers=1,
                 input_encoding_size=E, fc_feat_size=FC, seq_length=5,
                 drop_prob_lm=0.0)
    model = models.setup(cfg)
    template = model.init_params(jax.random.PRNGKey(0))
    params = load_pytree(str(out / "model_i2t-best.msgpack"), template)
    feats = Features(fc_feats=jnp.asarray(np.random.RandomState(0)
                                          .randn(2, FC), jnp.float32))
    seq, _ = model.sample(params, feats, jax.random.PRNGKey(0))
    assert seq.shape == (2, 5)
