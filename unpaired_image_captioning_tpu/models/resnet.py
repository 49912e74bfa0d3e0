"""ResNet image encoder (50/101/152) in pure JAX.

Parity: reference `misc/resnet.py` (torchvision-style ResNet-101) and
`misc/resnet_utils.py:11-27` `myResnet`: forward an image, return
(fc [2048] global-average feature, att [att_size, att_size, 2048] grid via
adaptive average pooling). Used offline by `scripts/prepro_feats.py:54-95`
and online by the raw-image eval loaders (`dataloaderraw.py:34-40`).

Weights convert 1:1 from torchvision checkpoints
(`convert_torchvision_state_dict`, cf. misc/resnet.py:191-200 model urls);
BatchNorm runs in inference mode with stored statistics. Layout is NHWC
(TPU-native); convolutions lower to XLA convs on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCKS = {"resnet_tiny": (1, 1, 1, 1),  # CI-sized variant for CLI tests
          "resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
          "resnet152": (3, 8, 36, 3)}

# torchvision normalization (dataloaderraw.py / prepro_feats.py preprocessing)
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _conv_init(rng, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(rng, (kh, kw, cin, cout)) * std


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "offset": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def batch_norm(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return (x - p["mean"]) * inv + p["offset"]


@dataclasses.dataclass(frozen=True)
class ResNet:
    depth: str = "resnet101"

    @property
    def blocks(self) -> Tuple[int, ...]:
        return BLOCKS[self.depth]

    def init_params(self, rng) -> dict:
        ks = jax.random.split(rng, 200)
        ki = iter(range(200))
        p = {"conv1": _conv_init(ks[next(ki)], 7, 7, 3, 64),
             "bn1": _bn_init(64), "layers": []}
        cin = 64
        for li, n_blocks in enumerate(self.blocks):
            planes = 64 * (2 ** li)
            cout = planes * 4
            layer = []
            for b in range(n_blocks):
                stride = 2 if (b == 0 and li > 0) else 1
                blk = {
                    "conv1": _conv_init(ks[next(ki)], 1, 1, cin, planes),
                    "bn1": _bn_init(planes),
                    "conv2": _conv_init(ks[next(ki)], 3, 3, planes, planes),
                    "bn2": _bn_init(planes),
                    "conv3": _conv_init(ks[next(ki)], 1, 1, planes, cout),
                    "bn3": _bn_init(cout),
                }
                if b == 0:
                    blk["downsample"] = {
                        "conv": _conv_init(ks[next(ki)], 1, 1, cin, cout),
                        "bn": _bn_init(cout),
                    }
                layer.append(blk)
                cin = cout
            p["layers"].append(layer)
        return p

    def apply(self, params, x) -> jax.Array:
        """x: [B, H, W, 3] normalized images -> [B, H/32, W/32, 2048]."""
        x = conv(x, params["conv1"], stride=2)
        x = jax.nn.relu(batch_norm(x, params["bn1"]))
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "SAME")
        for li, layer in enumerate(params["layers"]):
            for b, blk in enumerate(layer):
                stride = 2 if (b == 0 and li > 0) else 1
                identity = x
                out = jax.nn.relu(batch_norm(conv(x, blk["conv1"]), blk["bn1"]))
                out = jax.nn.relu(batch_norm(
                    conv(out, blk["conv2"], stride=stride), blk["bn2"]))
                out = batch_norm(conv(out, blk["conv3"]), blk["bn3"])
                if "downsample" in blk:
                    identity = batch_norm(
                        conv(x, blk["downsample"]["conv"], stride=stride),
                        blk["downsample"]["bn"])
                x = jax.nn.relu(out + identity)
        return x

    def my_resnet(self, params, img, att_size: int = 14):
        """myResnet parity (resnet_utils.py:11-27): img [B, H, W, 3] ->
        (fc [B, 2048], att [B, att_size, att_size, 2048])."""
        feat = self.apply(params, img)
        fc = jnp.mean(feat, axis=(1, 2))
        att = jax.image.resize(
            feat, (feat.shape[0], att_size, att_size, feat.shape[-1]),
            method="linear")  # adaptive avg pool equivalent on uniform grids
        return fc, att


def preprocess_images(imgs: np.ndarray) -> np.ndarray:
    """uint8 [B, H, W, 3] -> normalized float32 (torchvision transform
    parity used by prepro_feats.py / dataloaderraw.py)."""
    x = imgs.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def convert_torchvision_state_dict(state: Dict[str, "np.ndarray"],
                                   depth: str = "resnet101") -> dict:
    """torchvision resnet state_dict (numpy-valued) -> ResNet params tree."""
    def w(name):  # conv: [cout, cin, kh, kw] -> [kh, kw, cin, cout]
        return jnp.asarray(np.transpose(np.asarray(state[name]), (2, 3, 1, 0)))

    def bn(prefix):
        return {"scale": jnp.asarray(state[prefix + ".weight"]),
                "offset": jnp.asarray(state[prefix + ".bias"]),
                "mean": jnp.asarray(state[prefix + ".running_mean"]),
                "var": jnp.asarray(state[prefix + ".running_var"])}

    p = {"conv1": w("conv1.weight"), "bn1": bn("bn1"), "layers": []}
    for li, n_blocks in enumerate(BLOCKS[depth]):
        layer = []
        for b in range(n_blocks):
            pre = f"layer{li + 1}.{b}"
            blk = {"conv1": w(pre + ".conv1.weight"), "bn1": bn(pre + ".bn1"),
                   "conv2": w(pre + ".conv2.weight"), "bn2": bn(pre + ".bn2"),
                   "conv3": w(pre + ".conv3.weight"), "bn3": bn(pre + ".bn3")}
            if f"{pre}.downsample.0.weight" in state:
                blk["downsample"] = {"conv": w(pre + ".downsample.0.weight"),
                                     "bn": bn(pre + ".downsample.1")}
            layer.append(blk)
        p["layers"].append(layer)
    return p
