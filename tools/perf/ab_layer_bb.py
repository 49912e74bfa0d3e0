"""In-process A/B: fused enc-layer train kernel with bb batch-blocking
vs the one-element grid (bb=1), at the protocol batch (50x16, 6 layers).

RESULT (v5e, best-of-3 in one process): bb=1 43,831 tokens/s (19.39 ms),
bb-blocked 43,862 tokens/s (19.38 ms) — NET-ZERO. The blocked variant was
rejected; ops/layer_train.py keeps the one-element grid. To re-run the
blocked side, reapply the bb-blocking patch (grid over ceil(B/bb) with
unrolled per-element bodies + tail masking) and restore the monkeypatch
below; on the committed kernel both measurements exercise the same code.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.ops.cider import empty_df_table
from unpaired_image_captioning_tpu.train.trainer import Trainer
import unpaired_image_captioning_tpu.ops.layer_train as lt

B, N, V, FC, ATT, T = 50, 196, 9487, 2048, 2048, 16
dtype = jnp.bfloat16
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
n_steps = 20
step = tr._build_step(rl=False, ss_enabled=False)

def build_loop():
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
    return loop

def measure(tag, loop):
    p = jax.tree.map(jnp.array, tr.i2t_params)
    opt = tr.optim.i2t_state
    r = jax.random.PRNGKey(0)
    p2, opt2, losses = loop(p, opt, batch, r)  # compile
    np.asarray(losses)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        p2, opt2, losses = loop(p, opt, batch, r)
        np.asarray(losses)
        dt = (time.perf_counter() - t0) / n_steps
        best = min(best, dt)
    toks = B * (T + 1)
    print(f"{tag}: {toks/best:.0f} tokens/s ({best*1e3:.2f} ms/step)")

if hasattr(lt, "_block_b"):           # bb-blocking patch applied
    orig = lt._block_b
    lt._block_b = lambda b, t, heavy=False: 1
    measure("bb=1 (committed)", build_loop())
    lt._block_b = orig
    measure("bb blocked (patch)", build_loop())
else:                                  # committed one-element-grid kernel
    measure("bb=1 (committed)", build_loop())
