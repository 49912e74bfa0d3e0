"""A/B (REJECTED): fused 2B-row SCST decode (sample+greedy in one scan).

The SCST step runs two stop-gradient decodes (sampled rollout + greedy
baseline, trainer.py rl branch). Hypothesis: give ops/sampling.sample a
per-row greedy mask (zeroed Gumbel noise on greedy rows) and run both as
ONE 2B-row decode — one scan's fixed per-step costs, 2x MXU row
utilization at batch 50.

Measured on v5e (min-of-3 of a 20-step scan loop, 2 process reps each):
  two B-row decodes (status quo): 103.3k / 108.3k tokens/s
  one fused 2B-row decode:         99.3k / 103.9k tokens/s  (~4% SLOWER)
Why it loses: the greedy decode previously generated no RNG at all; the
fused path draws [2B,V] uniforms + two logs every step and masks half,
and the beam-invariant feats must be concatenated to 2B rows (an extra
~39 MB HBM copy for att_feats at these shapes). The per-step fixed costs
it saves are smaller than that — the decode scan is MXU/HBM-busy, not
dispatch-bound (BASELINE.md floor analysis). Change reverted; this probe
measures the status-quo SCST step at bench.py's protocol shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf/ab_scst_fused.py
"""

import json
import time

import numpy as np

B, N, V, H, E, FC, ATT, AHID = 50, 196, 9487, 512, 512, 2048, 2048, 512
T = 16


def main():
    import jax
    import jax.numpy as jnp

    from unpaired_image_captioning_tpu.config import Config
    from unpaired_image_captioning_tpu.ops.cider import empty_df_table
    from unpaired_image_captioning_tpu.train.trainer import Trainer

    tcfg = Config(caption_model="denseatt", vocab_size=V, rnn_size=H,
                  num_layers=1, input_encoding_size=E, att_hid_size=AHID,
                  fc_feat_size=FC, att_feat_size=ATT, seq_length=T,
                  drop_prob_lm=0.5, batch_size=B, seq_per_img=1,
                  i2t_train_flag=True, nmt_train_flag=False,
                  checkpoint_path="/tmp/bench_save")
    tr = Trainer(tcfg, df_table=empty_df_table())
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
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
    step = tr._build_step(rl=True, ss_enabled=False)

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
    np.asarray(loop(p, opt, batch, r)[2])
    best = 1e9
    for _ in range(3):
        p = jax.tree.map(jnp.array, tr.i2t_params)
        t0 = time.perf_counter()
        np.asarray(loop(p, opt, batch, r)[2])
        best = min(best, time.perf_counter() - t0)
    tok_s = B * (T + 1) * n_steps / best
    print(json.dumps({"scst_tokens_per_sec": round(tok_s, 1),
                      "ms_per_step": round(best * 1e3 / n_steps, 3),
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
