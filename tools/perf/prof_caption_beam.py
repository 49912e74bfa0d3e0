"""Profile the denseatt beam-3 decode on the real TPU: capture an xplane
trace of the single-dispatch 20-batch sweep and print per-op device time.

Usage: python /tmp/prof_decode.py [beam]
"""
import sys
import time

import numpy as np

B, N, V, H, E, FC, ATT, AHID = 50, 196, 9487, 512, 512, 2048, 2048, 512
T = 16
BEAM = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main():
    import jax
    import jax.numpy as jnp

    from unpaired_image_captioning_tpu import models
    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.models.base import Features

    cfg = Config(caption_model="denseatt", vocab_size=V, rnn_size=H,
                 num_layers=1, input_encoding_size=E, att_hid_size=AHID,
                 fc_feat_size=FC, att_feat_size=ATT, seq_length=T,
                 drop_prob_lm=0.5, batch_size=B)
    model = models.setup(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params)

    iters = 20
    rng = np.random.RandomState(0)
    stacked = Features(
        fc_feats=jnp.asarray(rng.randn(iters, B, FC), dtype),
        att_feats=jnp.asarray(rng.randn(iters, B, N, ATT), dtype),
        attri_feats=None,
        att_masks=jnp.ones((iters, B, N), jnp.float32),
    )

    @jax.jit
    def sweep(params, feats_all):
        def body(_, ft):
            res = model.sample_beam(params, ft, beam_size=BEAM)
            return None, res.seq[:, 0]
        _, seqs = jax.lax.scan(body, None, feats_all)
        return seqs

    _ = np.asarray(sweep(params, stacked))
    for _ in range(2):
        t0 = time.perf_counter()
        out = np.asarray(sweep(params, stacked))
        dt = time.perf_counter() - t0
    print(f"beam={BEAM} caps/s = {B*iters/dt:.1f}  ({dt*1e3/iters:.2f} ms/batch)")

    tracedir = f"/tmp/trace_beam{BEAM}"
    with jax.profiler.trace(tracedir):
        np.asarray(sweep(params, stacked))
    print("trace written to", tracedir)


if __name__ == "__main__":
    main()
