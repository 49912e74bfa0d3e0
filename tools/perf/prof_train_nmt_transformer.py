"""NMT-transformer TRAIN throughput (the reference's external zh2en
transformer route, train.sh:147-265: 6L d512 ff2048 h8) + kernel-routing
A/B (VERDICT r4 Next #4).

Protocol mirrors tools/perf/prof_train_nmt.py (the BiLSTM route's 438k
tokens/s record) for comparability: batch 64, 16-token sources, 18-token
targets, protocol vocab 11986->8571, 30-step device scan, best-of-3
dispatches, loss materialized with np.asarray.

Arms (flags in models/transformer.py, shared by the NMT transformer since
the round-5 refactor routed nmt_transformer.encode/forward through
enc_layer_apply/dec_layer_apply):
  xla        - every fused train kernel off (pure XLA + jnp)
  mha        - fused training MHA only (ops/mha_train.py)
  enc        - fused whole-layer encoder kernel (+ mha for the decoder)
  enc+dec    - both whole-layer kernels (ops/layer_train.py)

Run on the TPU (PYTHONPATH=/root/repo:/root/.axon_site):
    python tools/perf/prof_train_nmt_transformer.py [arm ...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.models import transformer as tf_mod
from unpaired_image_captioning_tpu.ops.cider import empty_df_table
from unpaired_image_captioning_tpu.train.trainer import Trainer

B, L, TT = 64, 16, 18
N_STEPS = 30

ARMS = {
    # (TRAIN_MHA_KERNEL, TRAIN_LAYER_KERNEL, TRAIN_DEC_LAYER_KERNEL)
    "xla": (False, False, False),
    "mha": (True, False, False),
    "enc": (True, True, False),
    "enc+dec": (True, True, True),
}


def measure(arm: str) -> float:
    tf_mod.TRAIN_MHA_KERNEL, tf_mod.TRAIN_LAYER_KERNEL, \
        tf_mod.TRAIN_DEC_LAYER_KERNEL = ARMS[arm]
    cfg = Config(caption_model="fc", vocab_size=100, rnn_size=2048,
                 num_layers=1, input_encoding_size=512, att_hid_size=512,
                 fc_feat_size=2048, att_feat_size=2048, seq_length=16,
                 batch_size=B, seq_per_img=1, i2t_train_flag=False,
                 nmt_train_flag=True, nmt_model_type="transformer",
                 nmt_src_vocab_size=11986, nmt_tgt_vocab_size=8571,
                 word_vec_size=512, layers=6, num_heads=8,
                 checkpoint_path="/tmp/bench_save_nmt_tf")
    tr = Trainer(cfg, df_table=empty_df_table())
    rng = np.random.RandomState(0)
    batch = {"nmt": {
        "src": jnp.asarray(rng.randint(4, 11986, (B, L)), jnp.int32),
        "tgt": jnp.asarray(rng.randint(4, 8571, (B, TT)), jnp.int32),
        "lengths": jnp.full((B,), L, jnp.int32)}}
    step = tr._build_step(rl=False)

    @jax.jit
    def loop(p, opt, batch, rng0):
        def body(carry, i):
            p, opt = carry
            _, p2, opt2, nopt, m = step(
                None, p, None, opt, batch, jnp.float32(4e-4),
                jnp.float32(1e-3), jnp.float32(0.0),
                jax.random.fold_in(rng0, i))
            return (p2, nopt if nopt is not None else opt2), m["total_loss"]
        (p, opt), losses = jax.lax.scan(body, (p, opt), jnp.arange(N_STEPS))
        return losses

    r = jax.random.PRNGKey(7)
    opt = tr.optim.nmt_state
    l0 = np.asarray(loop(jax.tree.map(jnp.array, tr.nmt_params), opt,
                         batch, r))
    assert np.all(np.isfinite(l0)), (arm, l0)
    best = 1e9
    for _ in range(3):
        p = jax.tree.map(jnp.array, tr.nmt_params)
        t0 = time.perf_counter()
        np.asarray(loop(p, opt, batch, r))
        best = min(best, time.perf_counter() - t0)
    tok_s = B * (TT - 1) * N_STEPS / best
    print(f"{arm:8s} {tok_s:10.0f} tokens/s  ({best * 1e3 / N_STEPS:.2f} "
          f"ms/step)  loss[0]={float(l0[0]):.3f} loss[-1]={float(l0[-1]):.3f}")
    return tok_s


if __name__ == "__main__":
    arms = sys.argv[1:] or list(ARMS)
    for a in arms:
        measure(a)
