"""Serving-runtime throughput/latency on real TPU: concurrent clients ->
MicroBatcher -> compiled beam decode (serve.CaptionService, no HTTP to
keep the measurement about the runtime, not localhost sockets)."""
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu import models
from unpaired_image_captioning_tpu.config import Config
from unpaired_image_captioning_tpu.serve import CaptionService

B, N, V, FC, ATT, T = 64, 196, 9487, 2048, 2048, 16


def main():
    cfg = Config(caption_model="denseatt", vocab_size=V, rnn_size=512,
                 num_layers=1, input_encoding_size=512, att_hid_size=512,
                 fc_feat_size=FC, att_feat_size=ATT, seq_length=T,
                 drop_prob_lm=0.5, batch_size=B)
    model = models.setup(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params)
    itow = {str(i): f"w{i}" for i in range(1, V + 1)}
    svc = CaptionService(model, params, itow, beam_size=3, max_batch=B,
                         max_wait_ms=8.0)

    rng = np.random.RandomState(0)
    fc = rng.randn(FC).astype(np.float32)
    att = rng.randn(N, ATT).astype(np.float32)

    # compile every batch bucket up front
    svc.warmup(att_len=N)

    n_clients, per_client = 16, 40
    lats = []
    lock = threading.Lock()

    def client():
        for _ in range(per_client):
            t0 = time.perf_counter()
            svc.caption(fc, att)
            dt = time.perf_counter() - t0
            with lock:
                lats.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    total = n_clients * per_client
    lats_ms = np.sort(np.asarray(lats)) * 1e3
    print(f"serve: {total / wall:.1f} req/s with {n_clients} clients; "
          f"latency p50 {lats_ms[len(lats_ms)//2]:.1f} ms, "
          f"p95 {lats_ms[int(len(lats_ms)*0.95)]:.1f} ms; "
          f"batch fill {svc.batcher.stats['batch_fill']:.2f}")
    svc.close()


if __name__ == "__main__":
    main()
