"""Measured torch baseline for bench.py (VERDICT r1 "Next" #4).

The reference checks in NO throughput numbers (SURVEY.md §6), so the
baseline must be measured. This module times the reference's decode
ARCHITECTURE — per-image host-Python beam search (CaptionModel.py:33-177 +
AttModel._sample_beam:167-196) stepping a torch denseatt
(AttModel.py:489-526) — at the bench shapes on this host, and reports two
measured anchors:

- ``torch_cpu_caps_per_sec``: the full torch decode on this host's CPU
  (torch-cpu is the only torch device in this image). NOT comparable to
  the reference's unspecified GPU, so bench.py does not use it as the
  speedup denominator — it is recorded for completeness.
- ``host_bound_caps_per_sec``: the same beam loop with the model step
  replaced by a precomputed lookup — i.e. the throughput of the
  reference's HOST-side beam bookkeeping alone. This is a measured UPPER
  BOUND on the reference architecture's throughput on ANY accelerator
  (the python bookkeeping runs on the host regardless of how fast the
  GPU is), which makes it a conservative, traceable `vs_baseline`
  denominator: our_caps_per_sec / host_bound is a LOWER bound on the true
  speedup over the reference.

Results cache to BASELINE_MEASURED.json next to this file.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BASELINE_MEASURED.json")


def _torch_denseatt(V, E, H, FC, ATT, AHID):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class LSTMCore(nn.Module):  # maxout cell, FCModel.py:14-42
        def __init__(self, in_dim):
            super().__init__()
            self.i2h = nn.Linear(in_dim, 5 * H)
            self.h2h = nn.Linear(H, 5 * H)

        def forward(self, x, h0, c0):
            g = self.i2h(x) + self.h2h(h0)
            i, f, o = torch.sigmoid(g[:, :3 * H]).chunk(3, 1)
            m = torch.max(g[:, 3 * H:4 * H], g[:, 4 * H:])
            c = f * c0 + i * m
            return o * torch.tanh(c), c

    class Attention(nn.Module):  # AttModel.py:529-558
        def __init__(self):
            super().__init__()
            self.h2att = nn.Linear(H, AHID)
            self.alpha_net = nn.Linear(AHID, 1)

        def forward(self, h, att_e, p_att):
            dot = torch.tanh(p_att + self.h2att(h).unsqueeze(1))
            w = F.softmax(self.alpha_net(dot).squeeze(-1), dim=1)
            return torch.bmm(w.unsqueeze(1), att_e).squeeze(1)

    class DenseAtt(nn.Module):  # AttModel.py:489-526
        def __init__(self):
            super().__init__()
            self.embed = nn.Sequential(nn.Embedding(V + 1, E), nn.ReLU())
            self.fc_embed = nn.Sequential(nn.Linear(FC, H), nn.ReLU())
            self.att_embed = nn.Sequential(nn.Linear(ATT, H), nn.ReLU())
            self.ctx2att = nn.Linear(H, AHID)
            self.logit = nn.Linear(H, V + 1)
            self.lstm0 = LSTMCore(E + H)
            self.lstm1 = LSTMCore(2 * H)
            self.lstm2 = LSTMCore(2 * H)
            self.att1 = Attention()
            self.att2 = Attention()
            self.emb2 = nn.Linear(H, H)
            self.fusion1 = nn.Sequential(nn.Linear(2 * H, H), nn.ReLU())
            self.fusion2 = nn.Sequential(nn.Linear(3 * H, H), nn.ReLU())

        def prepare(self, fc, att):
            att_e = self.att_embed(att)
            return self.fc_embed(fc), att_e, self.ctx2att(att_e)

        def step(self, it, fc_e, att_e, p_att, state):
            h, c = state
            xt = self.embed(it)
            h0, c0 = self.lstm0(torch.cat([xt, fc_e], 1), h[:, 0], c[:, 0])
            a1 = self.att1(h0, att_e, p_att)
            h1, c1 = self.lstm1(torch.cat([h0, a1], 1), h[:, 1], c[:, 1])
            a2 = self.att2(h1 + self.emb2(a1), att_e, p_att)
            h2, c2 = self.lstm2(
                torch.cat([self.fusion1(torch.cat([h0, h1], 1)), a2], 1),
                h[:, 2], c[:, 2])
            out = self.fusion2(torch.cat([h0, h1, h2], 1))
            lp = F.log_softmax(self.logit(out), dim=-1)
            return lp, (torch.stack([h0, h1, h2], 1),
                        torch.stack([c0, c1, c2], 1))

    return DenseAtt()


def _beam_decode_one(model, fc, att, *, beam, steps, step_override=None):
    """Reference host beam for ONE image, timing-faithful to
    CaptionModel.beam_step (:48-97): the model step is BATCHED over beams
    (get_logprobs_state on a [beam] token tensor), the per-row sort runs in
    C (torch.sort :61), and only rows x min(beam, V) candidates are built in
    Python (:65-74). step_override(its, t) -> [rows, V] logprobs stands in
    for the model to time the host bookkeeping alone."""
    import torch

    V1 = model.logit.out_features
    H = model.lstm0.h2h.in_features
    with torch.no_grad():
        if step_override is None:
            fc_e, att_e, p_att = model.prepare(fc, att)
            fc_e = fc_e.expand(beam, -1).contiguous()
            att_eb = att_e.expand(beam, -1, -1).contiguous()
            p_attb = p_att.expand(beam, -1, -1).contiguous()
        state = (torch.zeros(beam, 3, H), torch.zeros(beam, 3, H))
        sums = np.zeros(beam)
        its = torch.zeros(beam, dtype=torch.long)
        finished = []
        for t in range(steps):
            rows = 1 if t == 0 else beam
            if step_override is not None:
                lp = step_override(its, t)
                new_state = state
            else:
                lp_t, new_state = model.step(its, fc_e, att_eb, p_attb,
                                             state)
                lp = lp_t.numpy()
            lp = lp.copy()
            lp[:, V1 - 1] -= 1000.0
            ys = torch.sort(torch.from_numpy(lp), 1, descending=True)
            cands = []
            for c in range(min(beam, V1)):
                for q in range(rows):
                    cands.append((sums[q] + float(ys.values[q, c]), q,
                                  int(ys.indices[q, c])))
            cands.sort(key=lambda cnd: -cnd[0])
            parents = torch.tensor([c[1] for c in cands[:beam]])
            state = tuple(s.index_select(0, parents) for s in new_state)
            new_sums = np.empty(beam)
            new_its = torch.empty(beam, dtype=torch.long)
            for vix, (s, q, w) in enumerate(cands[:beam]):
                new_sums[vix] = s
                new_its[vix] = w
                if w == 0 or t == steps - 1:
                    finished.append(s)
                    new_sums[vix] = -1000.0
            sums, its = new_sums, new_its
    return max(finished)


def measure(n_images=8, *, V=9487, E=512, H=512, FC=2048, ATT=2048,
            AHID=512, N=196, beam=3, steps=16, seed=0) -> dict:
    import torch

    torch.manual_seed(seed)
    torch.set_num_threads(os.cpu_count() or 1)
    model = _torch_denseatt(V, E, H, FC, ATT, AHID).eval()
    rng = np.random.RandomState(seed)
    fcs = torch.from_numpy(rng.randn(n_images, FC).astype(np.float32))
    atts = torch.from_numpy(rng.randn(n_images, N, ATT).astype(np.float32))

    # full torch decode on this host
    _beam_decode_one(model, fcs[:1], atts[:1], beam=beam, steps=steps)
    t0 = time.perf_counter()
    for i in range(n_images):
        _beam_decode_one(model, fcs[i:i + 1], atts[i:i + 1], beam=beam,
                         steps=steps)
    torch_cpu = n_images / (time.perf_counter() - t0)

    # host-bookkeeping-only: precomputed random logprob rows, no model math.
    # This is what remains at infinite accelerator speed — the measured
    # ceiling of the reference's per-image host-beam architecture (the
    # python candidate loop, sort dispatch, state index_select and H2D/D2H
    # sync points all stay on the host).
    fake = rng.randn(64, beam, V + 1).astype(np.float32) - 5.0

    def instant_step(its, t):
        return fake[t % 64]

    n_host = max(n_images * 4, 32)
    t0 = time.perf_counter()
    for i in range(n_host):
        _beam_decode_one(model, fcs[0:1], atts[0:1], beam=beam, steps=steps,
                         step_override=instant_step)
    host_bound = n_host / (time.perf_counter() - t0)

    out = {"torch_cpu_caps_per_sec": round(torch_cpu, 3),
           "host_bound_caps_per_sec": round(host_bound, 2),
           "n_images": n_images, "beam": beam, "steps": steps,
           "shapes": {"V": V, "H": H, "ATT": ATT, "N": N},
           "host": os.uname().nodename, "cpus": os.cpu_count()}
    with open(CACHE, "w") as f:
        json.dump(out, f, indent=1)
    return out


def load_or_measure() -> dict:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)
    try:
        return measure()
    except Exception as e:  # torch missing/oom: fall back, documented
        return {"error": str(e), "host_bound_caps_per_sec": None,
                "torch_cpu_caps_per_sec": None}


if __name__ == "__main__":
    print(json.dumps(measure(), indent=1))
