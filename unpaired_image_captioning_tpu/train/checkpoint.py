"""Checkpoint / resume.

Parity: reference `train.py:90-128` / `trainer.py:98-104` — per-cadence
saves of `model_{i2t,nmt}[-best]`, optimizer states, an `infos` sidecar
(iter, epoch counters, loader iterator positions, best score, full config,
vocab) and `histories` (metric curves); `-best` dual-track by val CIDEr /
NMT acc; `--start_from` resume restores everything including mid-epoch
data-iterator positions (train.py:49-51, dataloader.py:371-377).

Format: msgpack pytrees (flax.serialization) + JSON sidecars — a single
train-state tree per model instead of the reference's pickled torch blobs.

Mesh/multi-process awareness (TPU-native half of the resume story; the
reference is single-host DataParallel and has no equivalent):
- save: sharded `jax.Array` leaves are gathered to their full logical value
  first — directly when every shard is process-local, via a DCN
  `process_allgather` when not (multi-host) — and only process 0 writes.
- restore: `load_pytree(..., shardings=)` places each leaf with
  `jax.make_array_from_callback`, so a checkpoint saved under one mesh
  restores onto ANY other mesh shape (including across process counts);
  each process materializes only its addressable shards.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np


def _to_host(tree):
    def host(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # multi-host: some shards live on other processes' devices, so a
            # plain np.asarray would be wrong/undefined. All processes join
            # a DCN all-gather; every process gets the full logical value.
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x) if hasattr(x, "shape") else x

    return jax.tree.map(host, tree)


def save_pytree(path: str, tree: Any) -> None:
    data = flax.serialization.to_bytes(_to_host(tree))
    if jax.process_count() > 1 and jax.process_index() != 0:
        return  # every process gathered (collective above); one writes
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


class _DefaultPlacement:
    """Sentinel leaf (a real pytree leaf, unlike None) marking 'place on the
    default device' in a shardings tree."""

    def __repr__(self):
        return "<default placement>"


DEFAULT_PLACEMENT = _DefaultPlacement()


def tree_shardings(tree: Any):
    """Per-leaf shardings pytree for `load_pytree(shardings=)`: the leaf's
    own sharding for mesh-placed (NamedSharding) jax.Arrays,
    DEFAULT_PLACEMENT else. Single-device leaves deliberately restore
    UNCOMMITTED (plain jnp.asarray): committing them to their template's
    device would pin e.g. a fresh optimizer state to device 0 and clash
    with mesh-placed params inside the jitted step."""
    def sh(x):
        if isinstance(x, jax.Array) and isinstance(
                x.sharding, jax.sharding.NamedSharding):
            return x.sharding
        return DEFAULT_PLACEMENT

    return jax.tree.map(sh, tree)


def load_pytree(path: str, template: Any, shardings: Any = None) -> Any:
    import jax.numpy as jnp

    with open(path, "rb") as f:
        restored = flax.serialization.from_bytes(template, f.read())

    if shardings is None:
        # msgpack restores numpy leaves; promote to device arrays so traced
        # indexing (embedding lookups under scan) works
        return jax.tree.map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
            restored)

    def place(x, s):
        if not isinstance(x, (np.ndarray, jnp.ndarray)):
            return x
        if s is None or isinstance(s, _DefaultPlacement):
            return jnp.asarray(x)
        host = np.asarray(x)
        # resharding path: works for any target mesh/spec, and in
        # multi-process each process only materializes its local shards
        return jax.make_array_from_callback(host.shape, s,
                                            lambda idx: host[idx])

    # Match shardings to restored leaves BY PATH rather than zipping
    # structures: the shardings tree may have empty subtrees where the
    # checkpoint carries data (e.g. a lazily-built optimizer slot that is
    # None in this Trainer's template) — those leaves restore with default
    # placement instead of crashing the whole load.
    import jax.tree_util as jtu
    sh_by_path = {jtu.keystr(p): s
                  for p, s in jtu.tree_flatten_with_path(shardings)[0]}
    consumed: set = set()

    def _place_at(p, x):
        key = jtu.keystr(p)
        if key in sh_by_path:
            consumed.add(key)
        return place(x, sh_by_path.get(key, DEFAULT_PLACEMENT))

    out = jtu.tree_map_with_path(_place_at, restored)
    # A keystr mismatch (e.g. a future structure rename) must not silently
    # degrade a mesh-sharded leaf to default placement: any REAL sharding
    # entry that never matched a restored path is a bug in the caller's
    # shardings tree (ADVICE r4).
    orphaned = [k for k, s in sh_by_path.items()
                if k not in consumed
                and s is not None and not isinstance(s, _DefaultPlacement)]
    if orphaned:
        raise ValueError(
            "load_pytree: shardings entries matched no restored leaf "
            f"(structure mismatch?): {sorted(orphaned)[:8]}"
            + ("..." if len(orphaned) > 8 else ""))
    return out


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

    def load_params(self, name: str, template, best: bool = False,
                    shardings: Any = None):
        return load_pytree(self._p(name, best) + ".msgpack", template,
                           shardings=shardings)

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
