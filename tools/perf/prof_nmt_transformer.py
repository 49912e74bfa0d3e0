"""Transformer-NMT beam-15 translate throughput on real TPU (the
--nmt_model_type transformer route; same protocol as prof_nmt_beam.py:
batch 50, beam 15, vocab 11986->8571, 16-token sources, 20-step cap).
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf/prof_nmt_transformer.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu.models.nmt_transformer import (
    TransformerNMTModel)

B, SRC_V, TGT_V, L, MAXLEN, BEAM = 50, 11986, 8571, 16, 20, 15


def main():
    model = TransformerNMTModel(src_vocab_size=SRC_V, tgt_vocab_size=TGT_V,
                                d_model=512, d_ff=2048, num_layers=6,
                                num_heads=8, max_decode_len=MAXLEN,
                                beam_size=BEAM)
    params = model.init_params(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype")
        and x.dtype == jnp.float32 else x, params)

    rng = np.random.RandomState(0)
    resident, iters = 8, 40
    src = jnp.asarray(rng.randint(4, SRC_V, (resident, B, L)), jnp.int32)
    src_len = jnp.full((resident, B), L, jnp.int32)

    @jax.jit
    def sweep(params, src_all, len_all):
        def body(_, i):
            s = jax.lax.dynamic_index_in_dim(src_all, i % resident,
                                             keepdims=False)
            sl = jax.lax.dynamic_index_in_dim(len_all, i % resident,
                                              keepdims=False)
            out = model.translate_batch(params, s, sl, beam_size=BEAM,
                                        max_len=MAXLEN)
            return None, out.seq[:, 0]
        _, seqs = jax.lax.scan(body, None, jnp.arange(iters))
        return seqs

    _ = np.asarray(sweep(params, src, src_len))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(sweep(params, src, src_len))
        best = min(best, time.perf_counter() - t0)
    print(f"transformer-NMT beam-{BEAM} translate: "
          f"{B * iters / best:.1f} sentences/s "
          f"({best * 1e3 / iters:.2f} ms/batch of {B})")


if __name__ == "__main__":
    main()
