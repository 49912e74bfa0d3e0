"""wtoi-pickle migration, BilinearD3, sentence attention."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from unpaired_image_captioning_tpu.models.stackcap import (
    bilinear_d3_apply, bilinear_d3_init, sentence_attention_apply,
    sentence_attention_init)
from unpaired_image_captioning_tpu.vocab import CaptionVocab


def test_from_wtoi_pickle(tmp_path):
    wtoi = {"猫": 1, "狗": 2, "跑": 3}
    p = tmp_path / "wtoi_zh.txt"
    with open(p, "wb") as f:
        pickle.dump(wtoi, f, protocol=0)  # reference artifact is protocol-0
    v = CaptionVocab.from_wtoi_pickle(str(p))
    assert v.word_to_ix["猫"] == 1
    assert v.decode_sequence(np.asarray([[1, 3, 0]])) == ["猫 跑"]


def test_bilinear_d3(rng):
    p = bilinear_d3_init(rng, 6, 8)
    x = jax.random.normal(rng, (3, 6))
    y = jax.random.normal(jax.random.fold_in(rng, 1), (3, 4, 8))
    s = bilinear_d3_apply(p, x, y)
    assert s.shape == (3, 4)
    manual = np.einsum("bd,de,boe->bo", np.asarray(x), np.asarray(p["w"]),
                       np.asarray(y))
    np.testing.assert_allclose(np.asarray(s), manual, atol=1e-4)


def test_sentence_attention(rng):
    p = sentence_attention_init(rng, 8, 8)
    h = jax.random.normal(rng, (2, 8))
    hist = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 8))
    mask = jnp.ones((2, 5)).at[0, 3:].set(0.0)
    out = sentence_attention_apply(p, h, hist, mask)
    assert out.shape == (2, 8)
    assert np.isfinite(np.asarray(out)).all()
