"""Offline ResNet feature extraction.

Parity: reference `scripts/prepro_feats.py:54-95` — ResNet-101/152 forward
per image, save `fc` (.npy, 2048) and `att` (.npz, 14x14x2048) per image id.
Batched + jitted on device here (the reference runs one image at a time).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    import jax

    from ..data.raw_images import RawImageLoader
    from ..models.resnet import ResNet, convert_torchvision_state_dict

    p = argparse.ArgumentParser("prepro_feats")
    p.add_argument("--input_json", required=True,
                   help="[{id, file_path}, ...] image list")
    p.add_argument("--images_root", default="")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--att_size", type=int, default=14)
    p.add_argument("--model", default="resnet101")
    p.add_argument("--model_weights", default="",
                   help="optional torchvision .pth state_dict")
    p.add_argument("--batch_size", type=int, default=16)
    a = p.parse_args(argv)

    resnet = ResNet(a.model)
    if a.model_weights:
        import torch

        state = {k: v.numpy() for k, v in
                 torch.load(a.model_weights, map_location="cpu").items()}
        params = convert_torchvision_state_dict(state, a.model)
    else:
        params = resnet.init_params(jax.random.PRNGKey(0))
        print("WARNING: random ResNet weights (no --model_weights given)")

    with open(a.input_json) as f:
        images = json.load(f)
    if isinstance(images, dict):
        images = images["images"]

    os.makedirs(os.path.join(a.output_dir + "_fc"), exist_ok=True)
    os.makedirs(os.path.join(a.output_dir + "_att"), exist_ok=True)

    loader = RawImageLoader(coco_json=a.input_json, batch_size=a.batch_size,
                            att_size=a.att_size, resnet_params=params,
                            depth=a.model)
    done = 0
    while done < len(images):
        batch = loader.get_batch()
        for bi, info in enumerate(batch["infos"]):
            if done >= len(images):
                break
            np.save(os.path.join(a.output_dir + "_fc", f"{info['id']}.npy"),
                    batch["fc_feats"][bi])
            np.savez_compressed(
                os.path.join(a.output_dir + "_att", f"{info['id']}.npz"),
                feat=batch["att_feats"][bi].reshape(a.att_size, a.att_size, -1))
            done += 1
        print(f"{done}/{len(images)}")
    print("done")


if __name__ == "__main__":
    main()
