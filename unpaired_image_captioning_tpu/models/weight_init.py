"""Weight initialization / surgery: resume and cross-model transplant.

Parity: reference `models/weight_init.py` — `I2T_Model_init` (:55-97),
`NMT_Model_init` (:199-264), `StackCapModel_init` (:266-444): resume from a
checkpoint, or transplant parameters from a *different* architecture's
checkpoint by name/shape matching (layer-wise copy of every tensor whose
path and shape agree, leaving the rest at fresh init).

Functional version: pytrees are matched by flattened path strings; a report
of transplanted / skipped leaves is returned for logging.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp


def _flatten_with_paths(tree, prefix: str = "") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_with_paths(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_with_paths(v, f"{prefix}/{i}"))
    else:
        out[prefix] = tree
    return out


def transplant(fresh_params, donor_params, *, strict: bool = False,
               rename: Dict[str, str] | None = None
               ) -> Tuple[Any, List[str], List[str]]:
    """Copy every donor leaf whose path+shape matches into fresh_params.

    rename: donor-path-prefix -> fresh-path-prefix map for cross-arch
    surgery (e.g. {'/core/lstm0': '/core/att_lstm'}).
    Returns (params, transplanted_paths, skipped_paths).
    """
    donor_flat = _flatten_with_paths(donor_params)
    if rename:
        renamed = {}
        for path, leaf in donor_flat.items():
            for src, dst in rename.items():
                if path.startswith(src):
                    path = dst + path[len(src):]
                    break
            renamed[path] = leaf
        donor_flat = renamed

    transplanted: List[str] = []
    skipped: List[str] = []

    def walk(tree, prefix: str = ""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            vals = [walk(v, f"{prefix}/{i}") for i, v in enumerate(tree)]
            return vals if isinstance(tree, list) else tuple(vals)
        donor = donor_flat.get(prefix)
        if donor is not None and getattr(donor, "shape", None) == tree.shape:
            transplanted.append(prefix)
            return jnp.asarray(donor).astype(tree.dtype)
        skipped.append(prefix)
        if strict and donor is not None:
            raise ValueError(
                f"shape mismatch at {prefix}: donor {getattr(donor, 'shape', None)} "
                f"vs fresh {tree.shape}")
        return tree

    return walk(fresh_params), transplanted, skipped


def partial_embedding_transplant(fresh_emb, donor_emb, row_map) -> jax.Array:
    """Copy donor embedding rows into fresh rows via an index map
    (used by the StackCap surgery and vocab-remap resumes).

    row_map: int array [K, 2] of (fresh_row, donor_row) pairs.
    """
    fresh_rows = jnp.asarray(row_map)[:, 0]
    donor_rows = jnp.asarray(row_map)[:, 1]
    return fresh_emb.at[fresh_rows].set(
        jnp.asarray(donor_emb)[donor_rows].astype(fresh_emb.dtype))
