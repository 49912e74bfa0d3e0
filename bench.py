"""Benchmark: captions/sec/chip at beam=3 (the BASELINE.json headline).

Workload mirrors the reference eval protocol (BASELINE.md): denseatt (the
reference's best AIC model), vocab 9487+1, rnn_size 512, 14x14=196-slot att
grid of 2048-d features, batch 50, max caption length 16, beam 3. The whole
decode — attention family forward, diverse beam bookkeeping, EOS handling —
is one compiled on-device program (ops/beam_search.py); the reference runs
beam search per image in host Python (AttModel.py:167-196).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` divides by 25 captions/sec/GPU — an estimate for the
reference's host-looped per-image beam=3 decode on its era GPU (the
reference checks in no throughput numbers, SURVEY.md §6); revisit when a
measured torch baseline exists.
"""

import json
import os
import time

import numpy as np

BASELINE_CAPS_PER_SEC = 25.0  # estimated reference GPU throughput at beam=3


def main():
    import jax
    import jax.numpy as jnp

    from unpaired_image_captioning_tpu import models
    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.models.base import Features

    cfg = Config(caption_model="denseatt", vocab_size=9487, rnn_size=512,
                 num_layers=1, input_encoding_size=512, att_hid_size=512,
                 fc_feat_size=2048, att_feat_size=2048, seq_length=16,
                 drop_prob_lm=0.5, batch_size=50)
    model = models.setup(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    b, n = cfg.batch_size, 196
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params)

    def make_batch(i):
        rng = np.random.RandomState(i)
        return Features(
            fc_feats=jnp.asarray(rng.randn(b, cfg.fc_feat_size), dtype),
            att_feats=jnp.asarray(rng.randn(b, n, cfg.att_feat_size), dtype),
            attri_feats=None,
            att_masks=jnp.ones((b, n), jnp.float32),
        )

    iters = 20
    batches = [make_batch(i) for i in range(iters)]
    stacked_feats = Features(
        fc_feats=jnp.stack([ft.fc_feats for ft in batches]),
        att_feats=jnp.stack([ft.att_feats for ft in batches]),
        attri_feats=None,
        att_masks=jnp.stack([ft.att_masks for ft in batches]),
    )

    # the whole val-sweep is ONE device program: scan over the stacked
    # batches inside jit, one dispatch + one host fetch. This dev
    # environment's remote-execution tunnel costs ~23 ms per host<->device
    # round-trip (profiled), which would otherwise swamp the 7.6 ms/batch
    # device decode (xplane trace)
    @jax.jit
    def sweep(params, feats_all):
        def body(_, ft):
            res = model.sample_beam(params, ft, beam_size=3)
            return None, res.seq[:, 0]
        _, seqs = jax.lax.scan(body, None, feats_all)
        return seqs

    _ = np.asarray(sweep(params, stacked_feats))  # compile + warmup
    t0 = time.perf_counter()
    out = np.asarray(sweep(params, stacked_feats))
    dt = time.perf_counter() - t0
    assert out.shape == (iters, b, cfg.seq_length)
    caps_per_sec = b * iters / dt

    print(json.dumps({
        "metric": "captions_per_sec_per_chip_beam3_denseatt",
        "value": round(caps_per_sec, 2),
        "unit": "captions/s",
        "vs_baseline": round(caps_per_sec / BASELINE_CAPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
