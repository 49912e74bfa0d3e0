"""A/B harness for the fused transformer decode layer kernel: layer-count
scaling (splits per-step fixed cost from per-layer cost) and VMEM-budget
(image-block size) sweeps. Single-dispatch sweep methodology (README)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu import models
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.models.base import Features

B, N, V, FC, ATT, T = 50, 196, 9487, 2048, 2048, 16


def measure(num_layers, iters=60, resident=4):
    cfg = Config(caption_model="transformer", vocab_size=V, seq_length=T,
                 fc_feat_size=FC, att_feat_size=ATT, drop_prob_lm=0.5,
                 batch_size=B, input_encoding_size=512, rnn_size=512,
                 num_layers=num_layers, att_hid_size=512)
    model = models.setup(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params)
    rng = np.random.RandomState(0)
    feats = Features(
        fc_feats=jnp.asarray(rng.randn(resident, B, FC), dtype),
        att_feats=jnp.asarray(rng.randn(resident, B, N, ATT), dtype),
        attri_feats=None,
        att_masks=jnp.ones((resident, B, N), jnp.float32))

    @jax.jit
    def sweep(params, fa):
        def body(_, i):
            ft = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, i % resident,
                                                       keepdims=False), fa)
            return None, model.sample_beam(params, ft, beam_size=5).seq[:, 0]
        _, seqs = jax.lax.scan(body, None, jnp.arange(iters))
        return seqs

    np.asarray(sweep(params, feats))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(sweep(params, feats))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / iters
    print(f"layers={num_layers}: {ms:.2f} ms/batch ({B*iters/best:.0f} caps/s)",
          flush=True)
    import os
    if os.environ.get("TRACE"):
        with jax.profiler.trace(os.environ["TRACE"] + f"_L{num_layers}"):
            np.asarray(sweep(params, feats))
        print("trace written", flush=True)
    return ms


if __name__ == "__main__":
    for L in [int(x) for x in sys.argv[1:]] or [1, 6]:
        measure(L)
# TRACE=<dir> support appended: trace one sweep after timing
