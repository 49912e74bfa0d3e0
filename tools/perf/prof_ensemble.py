import time
import numpy as np
import jax, jax.numpy as jnp
from unpaired_image_captioning_tpu import models
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.models.base import Features
from unpaired_image_captioning_tpu.models.ensemble import AttEnsemble

B, N, V, FC, ATT, T = 50, 196, 9487, 2048, 2048, 16
cfg = Config(caption_model="denseatt", vocab_size=V, rnn_size=512,
             num_layers=1, input_encoding_size=512, att_hid_size=512,
             fc_feat_size=FC, att_feat_size=ATT, seq_length=T,
             drop_prob_lm=0.5, batch_size=B)
m = models.setup(cfg)
dtype = jnp.bfloat16
cast = lambda t: jax.tree.map(lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
p1 = cast(m.init_params(jax.random.PRNGKey(0)))
p2 = cast(m.init_params(jax.random.PRNGKey(1)))
ens = AttEnsemble(models=(m, m))
rng = np.random.RandomState(0)
resident, iters = 4, 40
feats = Features(fc_feats=jnp.asarray(rng.randn(resident, B, FC), dtype),
                 att_feats=jnp.asarray(rng.randn(resident, B, N, ATT), dtype),
                 attri_feats=None,
                 att_masks=jnp.ones((resident, B, N), jnp.float32))

@jax.jit
def sweep(p1, p2, fa):
    def body(_, i):
        ft = jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(x, i % resident, keepdims=False), fa)
        return None, ens.sample_beam([p1, p2], ft, beam_size=5).seq[:, 0]
    _, seqs = jax.lax.scan(body, None, jnp.arange(iters))
    return seqs

_ = np.asarray(sweep(p1, p2, feats))
best = 1e9
for _ in range(2):
    t0 = time.perf_counter(); np.asarray(sweep(p1, p2, feats))
    best = min(best, time.perf_counter() - t0)
print(f"2-model denseatt ensemble beam-5: {B*iters/best:.1f} caps/s ({best*1e3/iters:.2f} ms/batch)", flush=True)
