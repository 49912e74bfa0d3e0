"""ctypes bindings for the C++ helper library (native/libuic_native.so).

Each entry point has a pure-Python fallback so the package works without the
toolchain; the C++ paths are the production ones (SURVEY.md §2.9: the
reference shelled out to Java/Perl for these).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libuic_native.so")
    if not os.path.exists(so):
        # best-effort build (g++ is baked into the image)
        try:
            subprocess.run(["make", "-C", os.path.join(root, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.ptb_tokenize.restype = ctypes.c_int
        lib.ptb_tokenize.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_int]
        lib.bleu_counts.restype = None
        lib.meteor_align.restype = None
        lib.query_integral_image.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def has_native() -> bool:
    return _lib() is not None


# ---------------------------------------------------------------------------
# PTB tokenization (coco-caption PTBTokenizer role)
# ---------------------------------------------------------------------------

_COCO_PUNCT = {"''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
               ".", "?", "!", ",", ":", "-", "--", "...", ";"}


def _ptb_tokenize_py(text: str) -> str:
    import re

    # contractions, then split punctuation, drop coco punctuation list
    t = re.sub(r"n't\b", " n't", text)
    t = re.sub(r"'(s|re|ve|ll|d|m)\b", r" '\1", t)
    toks = re.findall(r"[A-Za-z0-9-￿]+(?:[-.][A-Za-z0-9-￿]+)*"
                      r"|'[a-z]+|n't|[^\sA-Za-z0-9]+", t)
    return " ".join(tok.lower() for tok in toks if tok not in _COCO_PUNCT)


def ptb_tokenize(text: str) -> str:
    lib = _lib()
    if lib is None:
        return _ptb_tokenize_py(text)
    raw = text.encode("utf-8")
    cap = max(256, len(raw) * 2 + 16)
    buf = ctypes.create_string_buffer(cap)
    n = lib.ptb_tokenize(raw, buf, cap)
    if n < 0:
        return _ptb_tokenize_py(text)
    return buf.value.decode("utf-8")


class PTBTokenizer:
    """coco-caption API shape: tokenize({id: [{'caption': str}, ...]})."""

    def tokenize(self, captions_for_image):
        out = {}
        for k, caps in captions_for_image.items():
            if caps and isinstance(caps[0], dict):
                out[k] = [ptb_tokenize(c["caption"]) for c in caps]
            else:
                out[k] = [ptb_tokenize(c) for c in caps]
        return out


# ---------------------------------------------------------------------------
# BLEU counting kernel
# ---------------------------------------------------------------------------

def bleu_counts(hyp: Sequence[int], refs: List[Sequence[int]]
                ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Returns (clipped[4], total[4], closest_ref_len)."""
    lib = _lib()
    hyp_a = np.ascontiguousarray(hyp, np.int32)
    if lib is None:
        from .eval.metrics.bleu import _clip_counts, _closest_ref_len

        clipped = np.zeros(4, np.int64)
        total = np.zeros(4, np.int64)
        hl = [str(t) for t in hyp]
        rl = [[str(t) for t in r] for r in refs]
        for n in range(1, 5):
            c, t = _clip_counts(hl, rl, n)
            clipped[n - 1] = c
            total[n - 1] = t
        return clipped, total, _closest_ref_len(len(hyp), [len(r) for r in refs])
    flat = np.concatenate([np.ascontiguousarray(r, np.int32) for r in refs]
                          ) if refs else np.zeros(0, np.int32)
    offs = np.zeros(len(refs) + 1, np.int32)
    for i, r in enumerate(refs):
        offs[i + 1] = offs[i] + len(r)
    clipped = np.zeros(4, np.int64)
    total = np.zeros(4, np.int64)
    closest = ctypes.c_int32(0)
    lib.bleu_counts(
        hyp_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(hyp_a),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(refs),
        clipped.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        total.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(closest))
    return clipped, total, int(closest.value)


def meteor_align(hyp: Sequence[int], ref: Sequence[int]) -> Tuple[int, int]:
    """(matches, chunks) via greedy exact alignment."""
    lib = _lib()
    if lib is None:
        used = [False] * len(ref)
        match_of = [-1] * len(hyp)
        for i, h in enumerate(hyp):
            for j, r in enumerate(ref):
                if not used[j] and h == r:
                    used[j] = True
                    match_of[i] = j
                    break
        m = sum(1 for j in match_of if j >= 0)
        chunks, prev = 0, -2
        for j in match_of:
            if j >= 0:
                if j != prev + 1:
                    chunks += 1
                prev = j
            else:
                prev = -2
        return m, chunks
    h = np.ascontiguousarray(hyp, np.int32)
    r = np.ascontiguousarray(ref, np.int32)
    matches = ctypes.c_int32(0)
    chunks = ctypes.c_int32(0)
    lib.meteor_align(h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(h),
                     r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(r),
                     ctypes.byref(matches), ctypes.byref(chunks))
    return int(matches.value), int(chunks.value)


def query_integral_image(integral: np.ndarray, size_x: int, size_y: int,
                         random_hit: int) -> Optional[Tuple[int, int]]:
    """Word-cloud free-position search (Cython kernel parity)."""
    integral = np.ascontiguousarray(integral, np.uint32)
    h, w = integral.shape
    lib = _lib()
    if lib is None:
        hits = []
        for x in range(h - size_x):
            for y in range(w - size_y):
                area = (int(integral[x + size_x, y + size_y])
                        + int(integral[x, y]) - int(integral[x + size_x, y])
                        - int(integral[x, y + size_y]))
                if area == 0:
                    hits.append((x, y))
        if not hits:
            return None
        return hits[random_hit % len(hits)]
    ox = ctypes.c_int(0)
    oy = ctypes.c_int(0)
    found = lib.query_integral_image(
        integral.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), h, w,
        size_x, size_y, random_hit, ctypes.byref(ox), ctypes.byref(oy))
    if not found:
        return None
    return int(ox.value), int(oy.value)
