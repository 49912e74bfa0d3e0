"""A/B the XE train step: SINGLE_KERNEL (Pallas attention fwd + reference
VJP) vs pure XLA, same shapes as bench.py's train throughput."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import unpaired_image_captioning_tpu.models.att as att_mod
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.ops.cider import empty_df_table
from unpaired_image_captioning_tpu.train.trainer import Trainer

B, N, V, H, E, FC, ATT, AHID, T = 50, 196, 9487, 512, 512, 2048, 2048, 512, 16

att_mod.SINGLE_KERNEL = sys.argv[1] == "kernel"

dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
tcfg = Config(caption_model="denseatt", vocab_size=V, rnn_size=H,
              num_layers=1, input_encoding_size=E, att_hid_size=AHID,
              fc_feat_size=FC, att_feat_size=ATT, seq_length=T,
              drop_prob_lm=0.5, batch_size=B, seq_per_img=1,
              i2t_train_flag=True, nmt_train_flag=False,
              checkpoint_path="/tmp/bench_save")
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

n_steps = 30
step = tr._build_step(rl=False, ss_enabled=False)


@jax.jit
def loop(p, opt, batch, rng0):
    def body(carry, i):
        p, opt = carry
        p, _, opt, _, m = step(p, None, opt, None, batch,
                               jnp.float32(4e-4), jnp.float32(1e-3),
                               jnp.float32(0.0), jax.random.fold_in(rng0, i))
        return (p, opt), m["total_loss"]
    (p, opt), losses = jax.lax.scan(body, (p, opt), jnp.arange(n_steps))
    return p, opt, losses


p = jax.tree.map(jnp.array, tr.i2t_params)
opt = tr.optim.i2t_state
r = jax.random.PRNGKey(7)
_, _, l0 = loop(p, opt, batch, r)
np.asarray(l0)
best = 1e9
for _ in range(3):
    p = jax.tree.map(jnp.array, tr.i2t_params)
    t0 = time.perf_counter()
    _, _, losses = loop(p, opt, batch, r)
    np.asarray(losses)
    best = min(best, time.perf_counter() - t0)
tps = B * (T + 1) * n_steps / best
print(f"xe train ({sys.argv[1]}): {tps:.0f} tokens/s "
      f"({best*1e3/n_steps:.2f} ms/step)")
