"""Failure-detection tests: NaN guard + pt migration loader."""

import numpy as np
import pytest


def test_nan_guard(tmp_path):
    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.train.trainer import Trainer

    cfg = Config(caption_model="fc", vocab_size=15, rnn_size=12, num_layers=1,
                 input_encoding_size=8, fc_feat_size=10, seq_length=5,
                 i2t_train_flag=True, i2t_learning_rate=1e30,  # diverge fast
                 drop_prob_lm=0.0, checkpoint_path=str(tmp_path))
    tr = Trainer(cfg)
    tr.max_nan_steps = 1
    rng = np.random.RandomState(0)
    # poisoned batch: inf features force a non-finite loss immediately
    batch = {
        "fc_feats": np.full((4, 10), np.inf, np.float32),
        "att_feats": np.zeros((4, 3, 8), np.float32),
        "attri_feats": np.zeros((4, 6), np.float32),
        "att_masks": np.ones((4, 3), np.float32),
        "labels": rng.randint(1, 15, (4, 7)).astype(np.int32),
        "masks": np.ones((4, 7), np.float32),
        "gts": rng.randint(1, 15, (4, 2, 5)).astype(np.int32),
        "gts_masks": np.ones((4, 2), np.float32),
    }
    batch["labels"][:, 0] = 0
    with pytest.raises(FloatingPointError):
        tr.train(batch)


def test_from_reference_pt(tmp_path):
    torch = pytest.importorskip("torch")

    from unpaired_image_captioning_tpu.data.nmt_dataset import NMTDataset

    blob = {"train": {
        "src": [torch.tensor([4, 5, 6]), torch.tensor([7, 8])],
        "tgt": [torch.tensor([2, 9, 3]), torch.tensor([2, 10, 11, 3])],
    }}
    path = str(tmp_path / "nmt.train.pt")
    torch.save(blob, path)
    ds = NMTDataset.from_reference_pt(path, batch_size=2)
    assert ds.src.shape == (2, 3) and ds.tgt.shape == (2, 4)
    batch, wrapped = ds.next_batch()
    assert wrapped and batch["src"].shape == (2, 3)
    np.testing.assert_array_equal(batch["lengths"], [3, 2])
