"""Serving runtime: micro-batching caption/translation service.

The reference has no serving story (research scripts only); this module
provides the production path the rebuild targets: a request queue that
aggregates single-image requests into fixed-shape device batches (static
shapes = one compiled program, no recompiles), runs the compiled beam
decode, and fans results back out. Ships with a stdlib HTTP front end
(zero-egress environment: no external web framework).

Design:
- fixed `max_batch` padded batches — partial batches pad with the first
  row; static shapes keep one XLA executable warm;
- `max_wait_ms` batching window: latency/throughput knob;
- decode runs on a dedicated thread (single TPU stream), requests are
  futures.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional

import numpy as np


class MicroBatcher:
    def __init__(self, decode_batch: Callable[[dict], List[str]],
                 *, max_batch: int = 32, max_wait_ms: float = 5.0):
        self.decode_batch = decode_batch
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self.stats = {"requests": 0, "batches": 0, "batch_fill": 0.0}
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, example: dict) -> Future:
        fut: Future = Future()
        self.q.put((example, fut))
        return fut

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self.q.get(timeout=0.2)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=remaining))
                except queue.Empty:
                    break
            examples = [b[0] for b in batch]
            futs = [b[1] for b in batch]
            n = len(examples)
            # pad to the next power-of-two BUCKET with copies of row 0:
            # static shapes per bucket keep a bounded set of warm
            # executables (log2(max_batch) of them) while a lone request
            # uploads 1 row of features, not max_batch rows — feature
            # upload is the dominant cost of a serving dispatch
            bucket = 1
            while bucket < n:
                bucket *= 2
            bucket = min(bucket, self.max_batch)
            while len(examples) < bucket:
                examples.append(examples[0])
            stacked = {k: np.stack([e[k] for e in examples])
                       for k in examples[0]}
            try:
                outs = self.decode_batch(stacked)
                for f, o in zip(futs, outs[:n]):
                    f.set_result(o)
            except Exception as e:  # propagate to all waiters
                for f in futs:
                    f.set_exception(e)
            self.stats["requests"] += n
            self.stats["batches"] += 1
            self.stats["batch_fill"] = (
                self.stats["requests"] / (self.stats["batches"] * self.max_batch))

    def close(self):
        self._stop.set()
        self.thread.join(timeout=2)


class CaptionService:
    """Feature-in, caption-out service around a compiled beam decode."""

    def __init__(self, model, params, vocab_ix_to_word: dict, *,
                 beam_size: int = 3, max_batch: int = 32,
                 max_wait_ms: float = 5.0, greedy: bool = False):
        import jax
        import jax.numpy as jnp

        from .models.base import Features
        from .utils.text import decode_sequence

        self.model = model
        self.params = params
        self.vocab = vocab_ix_to_word

        if greedy or beam_size == 1:
            @jax.jit
            def decode(params, fc, att, masks):
                feats = Features(fc_feats=fc, att_feats=att, att_masks=masks)
                return model.sample(params, feats, jax.random.PRNGKey(0))[0]
        else:
            @jax.jit
            def decode(params, fc, att, masks):
                feats = Features(fc_feats=fc, att_feats=att, att_masks=masks)
                return model.sample_beam(params, feats,
                                         beam_size=beam_size).seq[:, 0]

        def decode_batch(stacked: dict) -> List[str]:
            # host-side bf16 cast on TPU halves feature-upload bytes (the
            # dominant serving dispatch cost; same policy as eval_split)
            fc, att = stacked["fc"], stacked["att"]
            if jax.default_backend() == "tpu":
                import ml_dtypes

                fc = fc.astype(ml_dtypes.bfloat16)
                att = att.astype(ml_dtypes.bfloat16)
            seq = decode(self.params, jnp.asarray(fc), jnp.asarray(att),
                         jnp.asarray(stacked["masks"], jnp.float32))
            return decode_sequence(self.vocab, np.asarray(seq))

        self._decode_batch = decode_batch
        self.batcher = MicroBatcher(decode_batch, max_batch=max_batch,
                                    max_wait_ms=max_wait_ms)

    def warmup(self, att_len: int):
        """Compile every power-of-two batch bucket up front so live
        requests never hit XLA compile latency."""
        fcd = getattr(self.model, "fc_feat_size", 2048)
        attd = getattr(self.model, "att_feat_size", 2048)
        b = 1
        while True:
            stacked = {
                "fc": np.zeros((b, fcd), np.float32),
                "att": np.zeros((b, att_len, attd), np.float32),
                "masks": np.ones((b, att_len), np.float32),
            }
            self._decode_batch(stacked)
            if b >= self.batcher.max_batch:
                break
            b = min(b * 2, self.batcher.max_batch)

    def caption(self, fc: np.ndarray, att: np.ndarray,
                masks: Optional[np.ndarray] = None, timeout: float = 30.0) -> str:
        if masks is None:
            masks = np.ones(att.shape[:1], np.float32)
        fut = self.batcher.submit({"fc": np.asarray(fc, np.float32),
                                   "att": np.asarray(att, np.float32),
                                   "masks": np.asarray(masks, np.float32)})
        return fut.result(timeout=timeout)

    def close(self):
        self.batcher.close()


class PivotService:
    """Feature-in, (zh caption, en caption)-out service: the HEADLINE
    unpaired task (reference eval_pivot.py pipeline — zh decode →
    json→txt→subprocess translate) served as ONE fused on-device program
    per micro-batch (pivot.pivot_translate: caption beam → id remap →
    NMT beam), with the eval path's UNK→attention-argmax surface
    replacement and contraction expansion on the way out."""

    def __init__(self, cap_model, cap_params, nmt_model, nmt_params,
                 zh_vocab: dict, nmt_tgt_itos: dict, cap2nmt, *,
                 cap_beam: int = 5, nmt_beam: int = 15,
                 nmt_max_len: int = 20, max_batch: int = 32,
                 max_wait_ms: float = 5.0, replace_unk: bool = True,
                 src2tgt=None):
        import jax
        import jax.numpy as jnp

        from . import constants as C
        from .models.base import Features
        from .pivot import pivot_translate
        from .utils.text import decode_sequence, expand_contractions

        self.cap_params, self.nmt_params = cap_params, nmt_params
        cap2nmt_arr = jnp.asarray(cap2nmt)
        s2t = None if src2tgt is None else jnp.asarray(src2tgt)

        @jax.jit
        def decode(cp, nparams, fc, att, masks):
            feats = Features(fc_feats=fc, att_feats=att, att_masks=masks)
            return pivot_translate(cap_model, cp, nmt_model, nparams, feats,
                                   cap2nmt_arr, cap_beam=cap_beam,
                                   nmt_beam=nmt_beam,
                                   nmt_max_len=nmt_max_len, src2tgt=s2t)

        def decode_batch(stacked: dict) -> List[dict]:
            fc, att = stacked["fc"], stacked["att"]
            if jax.default_backend() == "tpu":
                import ml_dtypes

                fc = fc.astype(ml_dtypes.bfloat16)
                att = att.astype(ml_dtypes.bfloat16)
            zh, en, attn = decode(self.cap_params, self.nmt_params,
                                  jnp.asarray(fc), jnp.asarray(att),
                                  jnp.asarray(stacked["masks"], jnp.float32))
            zh_np, en_np = np.asarray(zh), np.asarray(en)
            attn_np = np.asarray(attn)
            zh_caps = decode_sequence(zh_vocab, zh_np)
            outs = []
            for bi in range(zh_np.shape[0]):
                words = []
                for t, tok in enumerate(en_np[bi]):
                    tok = int(tok)
                    if tok in (C.PAD, C.EOS):
                        break
                    if tok == C.BOS:
                        continue
                    if tok == C.UNK and replace_unk:
                        j = int(attn_np[bi, t])
                        src_tok = int(zh_np[bi, j]) if j < zh_np.shape[1] else 0
                        words.append(zh_vocab.get(str(src_tok),
                                                  zh_vocab.get(src_tok,
                                                               C.UNK_WORD)))
                    else:
                        words.append(nmt_tgt_itos.get(tok, C.UNK_WORD))
                outs.append({"zh": zh_caps[bi],
                             "en": expand_contractions(" ".join(words))})
            return outs

        self._decode_batch = decode_batch
        self.batcher = MicroBatcher(decode_batch, max_batch=max_batch,
                                    max_wait_ms=max_wait_ms)

    def pivot(self, fc: np.ndarray, att: np.ndarray,
              masks: Optional[np.ndarray] = None,
              timeout: float = 60.0) -> dict:
        if masks is None:
            masks = np.ones(att.shape[:1], np.float32)
        fut = self.batcher.submit({"fc": np.asarray(fc, np.float32),
                                   "att": np.asarray(att, np.float32),
                                   "masks": np.asarray(masks, np.float32)})
        return fut.result(timeout=timeout)

    def close(self):
        self.batcher.close()


def make_http_server(service: CaptionService, port: int = 8000,
                     pivot_service: Optional[PivotService] = None
                     ) -> ThreadingHTTPServer:
    """POST /caption {"fc": [...], "att": [[...]]} -> {"caption": str};
    POST /pivot (same body) -> {"zh": str, "en": str} (when a
    PivotService is attached); GET /stats -> batcher stats."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/stats":
                self._send(200, service.batcher.stats)
            elif self.path == "/healthz":
                self._send(200, {"ok": True})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/caption":
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n))
                    cap = service.caption(np.asarray(req["fc"], np.float32),
                                          np.asarray(req["att"], np.float32))
                    self._send(200, {"caption": cap})
                except Exception as e:
                    self._send(400, {"error": str(e)})
            elif self.path == "/pivot" and pivot_service is not None:
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n))
                    out = pivot_service.pivot(
                        np.asarray(req["fc"], np.float32),
                        np.asarray(req["att"], np.float32))
                    self._send(200, out)
                except Exception as e:
                    self._send(400, {"error": str(e)})
            else:
                self._send(404, {"error": "not found"})

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
