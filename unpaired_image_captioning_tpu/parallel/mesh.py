"""Device mesh + sharding helpers.

Replaces the reference's DataParallel scale-out (SURVEY.md §2.10): batches
shard over a 'data' mesh axis; parameters are replicated by default with
optional tensor-parallel rules over a 'model' axis for the wide gate
matmuls (`w: [in, G*H]` sharded on the output column) and the vocab
projections. XLA inserts the psum/all-gather collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, mesh_shape: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """mesh_shape: 'data' (1-D) or 'dataxmodel' counts like '4x2'
    (data x model)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    n = len(devs)
    if "x" in mesh_shape:
        d, m = (int(v) for v in mesh_shape.split("x"))
        assert d * m == n, f"mesh {d}x{m} != {n} devices"
        arr = np.asarray(devs).reshape(d, m)
        return Mesh(arr, ("data", "model"))
    return Mesh(np.asarray(devs), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Optional[Mesh]) -> dict:
    """Place every array leaf with the batch axis sharded over 'data'.

    Leaves whose leading dim doesn't divide the data axis are replicated
    (correct but slower — size batches to a multiple of the data axis)."""
    if mesh is None:
        return batch
    n_data = mesh.shape["data"]

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n_data == 0:
            return jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))
        if hasattr(x, "ndim"):
            return jax.device_put(x, NamedSharding(mesh, P()))
        return x

    return jax.tree.map(put, batch)


def _tp_spec(path: str, leaf, mesh: Mesh):
    """Tensor-parallel rules for the 'model' axis (active only on 2-D
    meshes): shard gate-matmul output columns, embeddings and vocab
    projections on the vocab dim."""
    if "model" not in mesh.axis_names:
        return P()
    if leaf.ndim == 2:
        pathl = path.lower()
        if any(k in pathl for k in ("logit", "generator", "embed", "word_lut")):
            # vocab-dim sharding
            return P(None, "model") if "w" in pathl.split("/")[-1] else P("model", None)
        if leaf.shape[-1] % mesh.shape["model"] == 0:
            return P(None, "model")
    return P()


def param_sharding(params, mesh: Optional[Mesh], tensor_parallel: bool = False):
    """NamedShardings for a param pytree: replicated, or TP rules on 2-D
    meshes when tensor_parallel."""
    if mesh is None:
        return None
    if not tensor_parallel:
        return jax.tree.map(lambda _: replicate(mesh), params)

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = [walk(v, f"{path}/{i}") for i, v in enumerate(tree)]
            return type(tree)(t) if not isinstance(tree, tuple) else tuple(t)
        return NamedSharding(mesh, _tp_spec(path, tree, mesh))

    return walk(params)
