"""Checkpoint / resume.

Parity: reference `train.py:90-128` / `trainer.py:98-104` — per-cadence
saves of `model_{i2t,nmt}[-best]`, optimizer states, an `infos` sidecar
(iter, epoch counters, loader iterator positions, best score, full config,
vocab) and `histories` (metric curves); `-best` dual-track by val CIDEr /
NMT acc; `--start_from` resume restores everything including mid-epoch
data-iterator positions (train.py:49-51, dataloader.py:371-377).

Format: msgpack pytrees (flax.serialization) + JSON sidecars — a single
train-state tree per model instead of the reference's pickled torch blobs.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save_pytree(path: str, tree: Any) -> None:
    data = flax.serialization.to_bytes(_to_host(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_pytree(path: str, template: Any) -> Any:
    import jax.numpy as jnp

    with open(path, "rb") as f:
        restored = flax.serialization.from_bytes(template, f.read())
    # msgpack restores numpy leaves; promote to device arrays so traced
    # indexing (embedding lookups under scan) works
    return jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, restored)


def save_json(path: str, obj: Any) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def load_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


class CheckpointManager:
    def __init__(self, checkpoint_path: str):
        self.dir = checkpoint_path
        os.makedirs(self.dir, exist_ok=True)

    def _p(self, name: str, best: bool) -> str:
        return os.path.join(self.dir, name + ("-best" if best else ""))

    def save(self, *, i2t_params=None, nmt_params=None, optim_state=None,
             infos: Optional[dict] = None, histories: Optional[dict] = None,
             best: bool = False) -> None:
        if i2t_params is not None:
            save_pytree(self._p("model_i2t", best) + ".msgpack", i2t_params)
        if nmt_params is not None:
            save_pytree(self._p("model_nmt", best) + ".msgpack", nmt_params)
        if optim_state is not None:
            save_pytree(self._p("optimizer", best) + ".msgpack", optim_state)
        if infos is not None:
            save_json(self._p("infos", best) + ".json", infos)
        if histories is not None:
            save_json(self._p("histories", best) + ".json", histories)

    def load_params(self, name: str, template, best: bool = False):
        return load_pytree(self._p(name, best) + ".msgpack", template)

    def load_infos(self, best: bool = False) -> dict:
        return load_json(self._p("infos", best) + ".json")

    def load_histories(self, best: bool = False) -> dict:
        p = self._p("histories", best) + ".json"
        return load_json(p) if os.path.exists(p) else {}

    def has_checkpoint(self, best: bool = False) -> bool:
        return os.path.exists(self._p("infos", best) + ".json")


def check_resume_compat(saved_cfg: dict, cfg) -> None:
    """Parity: train.py:30-35 asserts on rnn_type/rnn_size/num_layers."""
    for k in ("caption_model", "rnn_type", "rnn_size", "num_layers",
              "input_encoding_size"):
        if k in saved_cfg and getattr(cfg, k) != saved_cfg[k]:
            raise ValueError(
                f"resume mismatch on {k!r}: checkpoint={saved_cfg[k]!r} "
                f"config={getattr(cfg, k)!r}")
