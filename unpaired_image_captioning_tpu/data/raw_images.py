"""Raw-image eval loader: folder of images -> on-the-fly ResNet features.

Parity: reference `misc/dataloader/dataloaderraw.py:25-141` (and the COCO
twin) — list images in a folder (or from a coco json), load/normalize, run
ResNet-101 forward per batch, emit the same batch dict as the precomputed
loaders. Decoding/normalization is host-side numpy + PIL-free (h5py image
arrays or .npy inputs accepted); the ResNet forward is jitted on device.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from ..models.resnet import ResNet, preprocess_images


IMG_EXTS = (".jpg", ".jpeg", ".png", ".ppm", ".npy")


class RawImageLoader:
    def __init__(self, *, folder_path: str = "", coco_json: str = "",
                 batch_size: int = 16, att_size: int = 14,
                 resnet_params=None, depth: str = "resnet101",
                 image_size: int = 448, seq_per_img: int = 1):
        import jax

        self.batch_size = batch_size
        self.att_size = att_size
        self.image_size = image_size
        self.seq_per_img = seq_per_img
        self.resnet = ResNet(depth)
        self.resnet_params = (resnet_params if resnet_params is not None
                              else self.resnet.init_params(jax.random.PRNGKey(0)))

        self.files: List[str] = []
        self.ids: List = []
        if coco_json:
            with open(coco_json) as f:
                info = json.load(f)
            for img in info["images"]:
                self.files.append(img["file_path"] if "file_path" in img
                                  else img["file_name"])
                self.ids.append(img["id"])
        else:
            for n, fn in enumerate(sorted(os.listdir(folder_path))):
                if fn.lower().endswith(IMG_EXTS):
                    self.files.append(os.path.join(folder_path, fn))
                    self.ids.append(n)
        self.iterator = 0
        self.split_ix = {"val": list(range(len(self.files))),
                         "test": list(range(len(self.files)))}

        self._fwd = jax.jit(
            lambda p, x: self.resnet.my_resnet(p, x, att_size=self.att_size))

    @property
    def vocab(self):  # set externally from the model's talk.json
        return self._vocab

    @vocab.setter
    def vocab(self, v):
        self._vocab = v

    def reset_iterator(self, split: str = "val"):
        self.iterator = 0

    def _read_image(self, path: str) -> np.ndarray:
        if path.endswith(".npy"):
            img = np.load(path)
        else:
            try:
                from PIL import Image  # optional dep

                img = np.asarray(Image.open(path).convert("RGB"))
            except ImportError as e:
                raise RuntimeError(
                    "PIL unavailable; supply .npy images or precomputed "
                    "features") from e
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        # center resize via simple numpy interpolation to image_size
        h, w = img.shape[:2]
        ys = (np.linspace(0, h - 1, self.image_size)).astype(np.int64)
        xs = (np.linspace(0, w - 1, self.image_size)).astype(np.int64)
        return img[ys][:, xs]

    def get_batch(self, split: str = "val", batch_size: Optional[int] = None):
        bs = batch_size or self.batch_size
        imgs, infos = [], []
        wrapped = False
        n = len(self.files)
        for _ in range(bs):
            if self.iterator >= n:
                self.iterator = 0
                wrapped = True
            i = self.iterator
            self.iterator += 1
            imgs.append(self._read_image(self.files[i]))
            infos.append({"ix": i, "id": self.ids[i],
                          "file_path": self.files[i]})
        x = preprocess_images(np.stack(imgs))
        fc, att = self._fwd(self.resnet_params, x)
        fc = np.asarray(fc)
        att = np.asarray(att).reshape(bs, -1, att.shape[-1])
        return {
            "fc_feats": fc,
            "att_feats": att,
            "attri_feats": np.zeros((bs, 1601), np.float32),
            "att_masks": np.ones(att.shape[:2], np.float32),
            "labels": np.zeros((bs, 18), np.int32),
            "masks": np.zeros((bs, 18), np.float32),
            "infos": infos,
            "bounds": {"it_pos_now": self.iterator, "it_max": n,
                       "wrapped": wrapped},
        }
