"""A/B: timestep-blocked LSTM chain vs the production scan (VERDICT r4
Next #5 — challenge the "LSTM scan runs at its streaming floor; batch
binds" claim with the one structure that could beat it).

Isolated at the flagship lstm0 shape (models/att.py DenseAttCore lstm0:
input [word_emb 512, fc 512] -> maxout H=512, protocol batch 50, T=17;
reference cell models/FCModel.py:26-42). Arms, all fwd+bwd wrt (w, x)
with an SGD update carried through a 30-step device scan so nothing is
loop-invariant-hoistable:

  scan     - production formulation: lax.scan of ops.rnn.lstm_step
             (fused Pallas cell fwd, XLA-ref bwd), full [D+H, 5H] weight
             streamed every timestep fwd AND re-streamed in bwd.
  hoist    - i2h hoisted to ONE [B*T, D] x [D, 5H] matmul outside the
             recurrence (its dW likewise one matmul); the scan streams
             only the [H, 5H] h2h half. Pure XLA.
  blocked  - hoist + ops/lstm_block.py: h2h chain as a Pallas kernel
             with w_h2h VMEM-resident across all T grid steps, reverse
             dh/dc recurrence kernel emitting dgates, every weight grad
             a hoisted matmul.

Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/perf/ab_lstm_block.py [arm ...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu.ops import rnn
from unpaired_image_captioning_tpu.ops.lstm_block import blocked_lstm_chain

B, T, D, H = 50, 17, 1024, 512
G = 5
N_STEPS = 30
DT = jnp.bfloat16


def _data(seed=0):
    r = np.random.RandomState(seed)
    w = jnp.asarray(r.randn(D + H, G * H) * 0.05, DT)
    b = jnp.asarray(r.randn(G * H) * 0.05, DT)
    x = jnp.asarray(r.randn(B, T, D) * 0.5, DT)
    h0 = jnp.zeros((B, H), DT)
    c0 = jnp.zeros((B, H), DT)
    return w, b, x, h0, c0


def _loss_scan(w, b, x, h0, c0):
    def body(carry, xt):
        h, c = carry
        hn, cn = rnn.lstm_step({"w": w, "b": b}, xt, h, c, maxout=True)
        return (hn, cn), hn

    (_, _), hs = jax.lax.scan(body, (h0, c0), jnp.swapaxes(x, 0, 1))
    return jnp.mean(hs.astype(jnp.float32) ** 2)


def _loss_hoist(w, b, x, h0, c0):
    xc = (jnp.einsum("btd,dg->tbg", x, w[:D],
                     preferred_element_type=jnp.float32)
          + b.astype(jnp.float32))
    wh = w[D:]

    def body(carry, xct):
        h, c = carry
        gates = xct + jnp.dot(h, wh, preferred_element_type=jnp.float32)
        hn, cn = rnn._lstm_elementwise(gates, c.astype(jnp.float32), H,
                                       True)
        return (hn.astype(h.dtype), cn.astype(c.dtype)), hn.astype(h.dtype)

    (_, _), hs = jax.lax.scan(body, (h0, c0), xc)
    return jnp.mean(hs.astype(jnp.float32) ** 2)


def _loss_blocked(w, b, x, h0, c0):
    xc = (jnp.einsum("btd,dg->tbg", x, w[:D],
                     preferred_element_type=jnp.float32)
          + b.astype(jnp.float32))
    hs, _ = blocked_lstm_chain(xc, h0, c0, w[D:], maxout=True)
    return jnp.mean(hs.astype(jnp.float32) ** 2)


ARMS = {"scan": _loss_scan, "hoist": _loss_hoist, "blocked": _loss_blocked}


def measure(arm: str) -> float:
    loss_fn = ARMS[arm]
    w, b, x, h0, c0 = _data()
    vg = jax.value_and_grad(loss_fn, argnums=(0, 2))

    @jax.jit
    def loop(w, x):
        def body(carry, _):
            w, x = carry
            l, (dw, dx) = vg(w, b, x, h0, c0)
            return (w - 0.1 * dw.astype(w.dtype),
                    x - 0.1 * dx.astype(x.dtype)), l

        (w, x), ls = jax.lax.scan(body, (w, x), jnp.arange(N_STEPS))
        return ls

    l0 = np.asarray(loop(w, x))
    assert np.all(np.isfinite(l0)), (arm, l0)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(w, x))
        best = min(best, time.perf_counter() - t0)
    us = best * 1e6 / N_STEPS
    print(f"{arm:8s} {us:9.1f} us/step ({us / T:6.1f} us/timestep)  "
          f"loss0={float(l0[0]):.4f} loss29={float(l0[-1]):.4f}")
    return us


if __name__ == "__main__":
    arms = sys.argv[1:] or list(ARMS)
    res = {a: measure(a) for a in arms}
    if "scan" in res:
        base = res["scan"]
        for a, v in res.items():
            if a != "scan":
                print(f"{a} vs scan: {base / v:.2f}x")
