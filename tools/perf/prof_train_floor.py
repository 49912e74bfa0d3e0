"""Training-step floor analysis: batch-size scaling + per-op accounting.

VERDICT r2 Next #4: decode got an op-by-op floor table; training (7.9-8.8%
XE MFU at batch 50) had none. This script produces the evidence:

1. batch-size scaling sweep (XE tokens/s at batch 50/100/200/400 for the
   LSTM flagship, and transformer): if tokens/s scales ~linearly with
   batch while ms/step stays flat, the batch-50 step is bound by per-op
   overheads inside the 2*(T+1) scan iterations (gates/attention are a few
   µs of MXU work each), not by FLOPs or HBM — i.e. batch 50 is simply a
   tiny operating point for a 197-TFLOP chip, and the protocol batch is
   the binding constraint, not the implementation.
2. analytic per-step traffic floor: params are read fwd+bwd (bf16) and the
   f32 master copy + adam moments are read+written by the update — a
   batch-independent ~0.5-0.7 ms/step of HBM traffic that alone caps
   batch-50 throughput.
3. optional xplane trace (TRACE=<dir>) for the per-op table via
   parse_xplane.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf/prof_train_floor.py [model]
"""

import json
import os
import sys
import time

import numpy as np

N, V, FC, ATT, T = 196, 9487, 2048, 2048, 16
PEAK = 197e12
HBM_GBS = 819e9


def build(model_name, batch):
    import jax
    import jax.numpy as jnp

    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.ops.cider import empty_df_table
    from unpaired_image_captioning_tpu.train.trainer import Trainer

    kw = dict(vocab_size=V, rnn_size=512, num_layers=1,
              input_encoding_size=512, att_hid_size=512, fc_feat_size=FC,
              att_feat_size=ATT, seq_length=T, drop_prob_lm=0.5,
              batch_size=batch, seq_per_img=1, i2t_train_flag=True,
              nmt_train_flag=False, checkpoint_path="/tmp/floor_save")
    if model_name == "transformer":
        kw.update(caption_model="transformer", num_layers=6)
    else:
        kw.update(caption_model=model_name)
    tr = Trainer(Config(**kw))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.RandomState(0)
    batch_d = {
        "fc_feats": jnp.asarray(rng.randn(batch, FC), dtype),
        "att_feats": jnp.asarray(rng.randn(batch, N, ATT), dtype),
        "attri_feats": None,
        "att_masks": jnp.ones((batch, N), jnp.float32),
        "labels": jnp.asarray(
            rng.randint(1, V, (batch, T + 2)).astype(np.int32)).at[:, 0].set(0),
        "masks": jnp.ones((batch, T + 2), jnp.float32),
        "gts": jnp.asarray(rng.randint(1, V, (batch, 5, T)).astype(np.int32)),
        "gts_masks": jnp.ones((batch, 5), jnp.float32),
    }
    return tr, batch_d


def measure(model_name, batch, n_steps=30):
    import jax
    import jax.numpy as jnp

    tr, batch_d = build(model_name, batch)
    # ss_enabled=False = the schedule-at-0 operating point (the reference
    # starts every phase there): forward hoists the logit head out of the
    # scan (models/base.py split-head path)
    step = tr._build_step(rl=False, ss_enabled=False)

    @jax.jit
    def loop(p, opt, batch, rng0):
        def body(carry, i):
            p, opt = carry
            p, _, opt, _, m = step(p, None, opt, None, batch,
                                   jnp.float32(4e-4), jnp.float32(1e-3),
                                   jnp.float32(0.0),
                                   jax.random.fold_in(rng0, i))
            return (p, opt), m["total_loss"]
        (p, opt), losses = jax.lax.scan(body, (p, opt), jnp.arange(n_steps))
        return p, opt, losses

    p = jax.tree.map(jnp.array, tr.i2t_params)
    opt = tr.optim.i2t_state
    r = jax.random.PRNGKey(7)
    np.asarray(loop(p, opt, batch_d, r)[2])        # compile+warm
    p = jax.tree.map(jnp.array, tr.i2t_params)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(p, opt, batch_d, r)[2])
        best = min(best, time.perf_counter() - t0)
        p = jax.tree.map(jnp.array, tr.i2t_params)
    ms_step = best * 1e3 / n_steps
    tok_s = batch * (T + 1) / (best / n_steps)

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p)
                   if hasattr(x, "shape"))
    # analytic batch-independent update/param traffic per step:
    # bf16 weights read fwd + read bwd; f32 grads written+read; adam
    # m/v/p read+write in f32
    opt_bytes = n_params * (2 + 2 + 4 + 4 + 3 * 4 + 3 * 4)
    opt_ms = opt_bytes / HBM_GBS * 1e3

    if os.environ.get("TRACE"):
        import jax.profiler

        with jax.profiler.trace(os.environ["TRACE"] + f"_{model_name}_{batch}"):
            np.asarray(loop(p, opt, batch_d, r)[2])

    return {"model": model_name, "batch": batch, "ms_per_step": round(ms_step, 3),
            "tokens_per_s": round(tok_s, 1), "n_params": n_params,
            "analytic_param_opt_traffic_ms": round(opt_ms, 3)}


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "denseatt"
    rows = []
    for b in (50, 100, 200, 400):
        r = measure(model, b)
        rows.append(r)
        print(json.dumps(r))
    b0 = rows[0]
    flops_tok = None
    if model == "denseatt":
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        import bench

        flops_tok = bench.decode_flops_per_caption() / (bench.BEAM * bench.T)
        for r in rows:
            r["mfu_pct"] = round(100 * r["tokens_per_s"] * 3 * flops_tok / PEAK, 2)
        print("MFU by batch:", {r["batch"]: r["mfu_pct"] for r in rows})
    scale = rows[-1]["tokens_per_s"] / b0["tokens_per_s"]
    print(f"batch {rows[-1]['batch']}/{b0['batch']} tokens/s scaling: "
          f"{scale:.2f}x (ideal {rows[-1]['batch'] / b0['batch']:.0f}x); "
          f"analytic param+optimizer traffic {b0['analytic_param_opt_traffic_ms']} "
          f"ms/step (batch-independent)")


if __name__ == "__main__":
    main()
