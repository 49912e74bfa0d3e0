"""Fused image front-end: bilinear resize + normalize in one Pallas kernel.

Role: the BASELINE.json north star names "a fused image front-end
(decode/resize/normalize in Pallas) feeding the ResNet encoder". The
reference does this on host per image with PIL/torchvision transforms
(scripts/prepro_feats.py, dataloaderraw.py:101-116). JPEG *decode* stays on
host (no device codec); resize+normalize run on device.

Design: bilinear resize is separable, so it is expressed as two matmuls
with precomputed interpolation matrices — `out = R_h @ img @ R_w^T` per
channel — which lowers onto the MXU instead of gather units. Normalization
((x/255 - mean)/std) fuses into the same kernel; the resized intermediate
never leaves VMEM. A pure-XLA path with the same math is the fallback/test
oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.resnet import IMAGENET_MEAN, IMAGENET_STD


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation weights (half-pixel centers,
    matching jax.image.resize(method='linear'))."""
    m = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for o in range(n_out):
        src = (o + 0.5) * scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        lo_c = min(max(lo, 0), n_in - 1)
        hi_c = min(max(lo + 1, 0), n_in - 1)
        m[o, lo_c] += 1.0 - frac
        m[o, hi_c] += frac
    return m


def _front_end_kernel(img_ref, rh_ref, rw_t_ref, mean_ref, std_ref, out_ref):
    # img block: [1, H_in, W_in, C] uint8
    img = img_ref[0].astype(jnp.float32)  # [H_in, W_in, C]
    h_out = out_ref.shape[1]
    w_out = out_ref.shape[2]
    c = img.shape[-1]
    for ch in range(c):  # static channel unroll
        plane = img[:, :, ch]
        rows = jnp.dot(rh_ref[:], plane, preferred_element_type=jnp.float32)
        full = jnp.dot(rows, rw_t_ref[:], preferred_element_type=jnp.float32)
        norm = (full / 255.0 - mean_ref[0, ch]) / std_ref[0, ch]
        out_ref[0, :, :, ch] = norm.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h_out", "w_out", "use_pallas",
                                             "out_dtype"))
def resize_normalize(imgs, *, h_out: int = 448, w_out: int = 448,
                     use_pallas: bool | None = None, out_dtype=jnp.float32):
    """uint8 [B, H, W, C] -> normalized [B, h_out, w_out, C]."""
    b, h_in, w_in, c = imgs.shape
    rh = jnp.asarray(_interp_matrix(h_in, h_out))
    rw_t = jnp.asarray(_interp_matrix(w_in, w_out)).T
    mean = jnp.asarray(IMAGENET_MEAN)[None, :]
    std = jnp.asarray(IMAGENET_STD)[None, :]
    if c != 3:
        mean = jnp.full((1, c), float(IMAGENET_MEAN.mean()))
        std = jnp.full((1, c), float(IMAGENET_STD.mean()))

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        x = imgs.astype(jnp.float32)
        x = jnp.einsum("oh,bhwc->bowc", rh, x)
        x = jnp.einsum("bowc,wq->boqc", x, rw_t)
        return ((x / 255.0 - mean[0]) / std[0]).astype(out_dtype)

    return pl.pallas_call(
        _front_end_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h_in, w_in, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_out, h_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, w_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_out, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c), out_dtype),
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * (h_out * h_in * w_in + h_out * w_in * w_out),
            bytes_accessed=b * (h_in * w_in + h_out * w_out) * c * 4,
            transcendentals=0,
        ),
    )(imgs, rh, rw_t, mean, std)
