"""A/B: fused DECODER train layer (ops/layer_train.fused_dec_layer) on/off.

VERDICT r4 Next #1: the decoder kernel landed in the round-4 snapshot routed
by default with CPU parity + gradient tests but no on-chip measurement. This
script runs the protocol transformer XE step (6L d512, batch 50 and 400)
with TRAIN_DEC_LAYER_KERNEL on vs off (encoder kernel stays on in both arms)
and prints tokens/s for each arm. Keep-or-reject like ab_layer_bb.py.

Usage: python tools/perf/ab_dec_layer.py [batches...]   (default: 50 400)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import unpaired_image_captioning_tpu.models.transformer as tf_mod
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.ops.cider import empty_df_table
from unpaired_image_captioning_tpu.train.trainer import Trainer

N, V, FC, ATT, T = 196, 9487, 2048, 2048, 16
dtype = jnp.bfloat16


def measure(B: int, dec_kernel: bool, n_steps: int = 20) -> float:
    tf_mod.TRAIN_DEC_LAYER_KERNEL = dec_kernel
    tcfg = Config(caption_model="transformer", vocab_size=V, rnn_size=512,
                  num_layers=6, input_encoding_size=512, att_hid_size=512,
                  fc_feat_size=FC, att_feat_size=ATT, seq_length=T,
                  drop_prob_lm=0.5, batch_size=B, seq_per_img=1,
                  i2t_train_flag=True, nmt_train_flag=False,
                  checkpoint_path="/tmp/bench_save_tf")
    tr = Trainer(tcfg, df_table=empty_df_table())
    rng = np.random.RandomState(0)
    batch = {
        "fc_feats": jnp.asarray(rng.randn(B, FC), dtype),
        "att_feats": jnp.asarray(rng.randn(B, N, ATT), dtype),
        "attri_feats": None,
        "att_masks": jnp.ones((B, N), jnp.float32),
        "labels": jnp.asarray(
            rng.randint(1, V, (B, T + 2)).astype(np.int32)).at[:, 0].set(0),
        "masks": jnp.ones((B, T + 2), jnp.float32),
        "gts": jnp.asarray(rng.randint(1, V, (B, 5, T)).astype(np.int32)),
        "gts_masks": jnp.ones((B, 5), jnp.float32),
    }
    step = tr._build_step(rl=False, ss_enabled=False)

    @jax.jit
    def loop(p, opt, batch, rng0):
        def body(carry, i):
            p, opt = carry
            p, _, opt, _, m = step(p, None, opt, None, batch,
                                   jnp.float32(4e-4), jnp.float32(1e-3),
                                   jnp.float32(0.0),
                                   jax.random.fold_in(rng0, i))
            return (p, opt), m["total_loss"]
        (p, opt), losses = jax.lax.scan(body, (p, opt), jnp.arange(n_steps))
        return p, opt, losses

    p = jax.tree.map(jnp.array, tr.i2t_params)
    opt = tr.optim.i2t_state
    r = jax.random.PRNGKey(7)
    _, _, l0 = loop(p, opt, batch, r)
    l0 = np.asarray(l0)
    assert np.all(np.isfinite(l0)), f"non-finite losses: {l0}"
    best = 1e9
    for _ in range(3):
        p = jax.tree.map(jnp.array, tr.i2t_params)
        t0 = time.perf_counter()
        _, _, losses = loop(p, opt, batch, r)
        np.asarray(losses)
        best = min(best, time.perf_counter() - t0)
    return B * (T + 1) * n_steps / best


def main():
    batches = [int(a) for a in sys.argv[1:]] or [50, 400]
    print(f"backend={jax.default_backend()}")
    for B in batches:
        for arm in (False, True):
            tps = measure(B, dec_kernel=arm)
            name = "dec-kernel ON " if arm else "dec-kernel OFF"
            print(f"batch {B:4d}  {name}: {tps:9.0f} tokens/s "
                  f"({B * (T + 1) / tps * 1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
