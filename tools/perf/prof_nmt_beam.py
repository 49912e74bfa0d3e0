"""NMT beam-15 translate throughput on real TPU (pivot eval protocol:
batch 50, beam 15, BiLSTM 512, vocab 11986->8571; NMT_Models.py:323)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu.models.nmt import NMTModel

B, SRC_V, TGT_V, L, MAXLEN, BEAM = 50, 11986, 8571, 16, 20, 15


def main():
    model = NMTModel(src_vocab_size=SRC_V, tgt_vocab_size=TGT_V,
                     word_vec_size=512, rnn_size=512, layers=1, brnn=True,
                     max_decode_len=MAXLEN, beam_size=BEAM)
    params = model.init_params(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params)

    rng = np.random.RandomState(0)
    resident, iters = 8, 40
    src = jnp.asarray(rng.randint(4, SRC_V, (resident, B, L)), jnp.int32)
    src_len = jnp.full((resident, B), L, jnp.int32)

    @jax.jit
    def sweep(params, src_all, len_all):
        def body(_, i):
            s = jax.lax.dynamic_index_in_dim(src_all, i % resident, keepdims=False)
            sl = jax.lax.dynamic_index_in_dim(len_all, i % resident, keepdims=False)
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
    sents = B * iters / best
    print(f"nmt beam-{BEAM} translate: {sents:.1f} sentences/s "
          f"({best*1e3/iters:.2f} ms/batch of {B})")

    if len(sys.argv) > 1 and sys.argv[1] == "trace":
        with jax.profiler.trace("/tmp/trace_nmt"):
            np.asarray(sweep(params, src, src_len))
        print("trace written to /tmp/trace_nmt")


if __name__ == "__main__":
    main()
