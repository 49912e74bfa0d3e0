"""NMT-only joint-step throughput (BiLSTM-512 input-feed, protocol vocab)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.ops.cider import empty_df_table
from unpaired_image_captioning_tpu.train.trainer import Trainer

B, L, TT = 64, 16, 18
cfg = Config(caption_model="fc", vocab_size=100, rnn_size=512, num_layers=1,
             input_encoding_size=512, att_hid_size=512, fc_feat_size=2048,
             att_feat_size=2048, seq_length=16, batch_size=B, seq_per_img=1,
             i2t_train_flag=False, nmt_train_flag=True,
             nmt_src_vocab_size=11986, nmt_tgt_vocab_size=8571,
             word_vec_size=512, layers=1, checkpoint_path="/tmp/bench_save_nmt")
tr = Trainer(cfg, df_table=empty_df_table())
rng = np.random.RandomState(0)
batch = {
    "nmt": {"src": jnp.asarray(rng.randint(4, 11986, (B, L)), jnp.int32),
            "tgt": jnp.asarray(rng.randint(4, 8571, (B, TT)), jnp.int32),
            "lengths": jnp.full((B,), L, jnp.int32)},
}
n_steps = 30
step = tr._build_step(rl=False)

@jax.jit
def loop(p, opt, batch, rng0):
    def body(carry, i):
        p, opt = carry
        _, p2, opt2, nopt, m = step(None, p, None, opt, batch,
                                    jnp.float32(4e-4), jnp.float32(1e-3),
                                    jnp.float32(0.0), jax.random.fold_in(rng0, i))
        return (p2, nopt if nopt is not None else opt2), m["total_loss"]
    (p, opt), losses = jax.lax.scan(body, (p, opt), jnp.arange(n_steps))
    return losses

# figure out the step signature from the trainer
print("i2t_params is None:", tr.i2t_params is None)
p = jax.tree.map(jnp.array, tr.nmt_params)
opt = tr.optim.nmt_state
r = jax.random.PRNGKey(7)
l0 = loop(p, opt, batch, r); np.asarray(l0)
best = 1e9
for _ in range(3):
    p = jax.tree.map(jnp.array, tr.nmt_params)
    t0 = time.perf_counter()
    np.asarray(loop(p, opt, batch, r))
    best = min(best, time.perf_counter() - t0)
print(f"nmt xe train: {B*(TT-1)*n_steps/best:.0f} tokens/s ({best*1e3/n_steps:.2f} ms/step)")
