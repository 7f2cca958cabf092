"""Checkpointing: resumable train-state snapshots + reference-style bundles.

Two complementary formats:

1. **Bundles** (`save_bundle`/`load_bundle`) — a single ``.npz`` holding one or
   more *named* param/state trees with human-readable slash-joined keys
   (``model/backbone/conv1/w``). This is the analog of the reference's
   best-model ``torch.save`` dicts (``{"model": ..., "arcface": ...}``,
   ``/root/reference/train_visual.py:633-636``;
   ``{"model","embed","arcface","best_auc"}``, ``train_au_face.py:751-756``)
   and supports the same flexible loading: missing/extra keys tolerated in
   non-strict mode (mirroring ``load_state_dict_flexible``,
   ``test_au_face.py:107-141``).

2. **Train-state snapshots** (`save_state`/`load_state`) — full-fidelity dumps
   of an arbitrary pytree (TrainState incl. optimizer/EMA state) by flattened
   leaf order, enabling true mid-run resume — a capability the reference lacks
   entirely (best-only saves, no optimizer state; SURVEY.md §5).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Path-keyed bundles
# ---------------------------------------------------------------------------

def _flatten_with_paths(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_with_paths(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_with_paths(v, f"{prefix}{i}/"))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_from_paths(flat: Dict[str, np.ndarray]):
    root: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(root)


def save_bundle(path: str, trees: Dict[str, Any]) -> None:
    """Save named pytrees (e.g. {"model": params, "arcface": params}) to .npz."""
    flat = {}
    for name, tree in trees.items():
        flat.update(_flatten_with_paths(tree, f"{name}/"))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_bundle(path: str) -> Dict[str, Any]:
    """Load a bundle back into nested dict/list trees (keys = saved names)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    tree = _unflatten_from_paths(flat)
    return tree


def merge_params(init_params, loaded, *, strict: bool = True, _path="") -> Any:
    """Overlay ``loaded`` onto ``init_params`` structure-by-structure.

    Non-strict mode tolerates missing keys (keeps init) and extra keys
    (ignored) — the flexible-load behavior of ``test_au_face.py:128-141``.
    """
    if isinstance(init_params, dict):
        out = {}
        for k, v in init_params.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = merge_params(v, loaded[k], strict=strict, _path=f"{_path}{k}/")
            elif strict:
                raise KeyError(f"missing key in checkpoint: {_path}{k}")
            else:
                out[k] = v
        return out
    if isinstance(init_params, (list, tuple)):
        n = len(init_params)
        if not isinstance(loaded, (list, tuple)) or (strict and len(loaded) != n):
            if strict:
                raise ValueError(f"sequence mismatch at {_path}")
            loaded = list(loaded) if isinstance(loaded, (list, tuple)) else []
        out = [
            merge_params(v, loaded[i] if i < len(loaded) else v, strict=strict, _path=f"{_path}{i}/")
            for i, v in enumerate(init_params)
        ]
        return type(init_params)(out) if isinstance(init_params, tuple) else out
    if loaded is None:
        if strict:
            raise ValueError(f"missing leaf at {_path}")
        return init_params
    arr = jnp.asarray(loaded)
    if strict and tuple(arr.shape) != tuple(jnp.shape(init_params)):
        raise ValueError(f"shape mismatch at {_path}: {arr.shape} vs {jnp.shape(init_params)}")
    return arr


# ---------------------------------------------------------------------------
# Full train-state snapshots (resume)
# ---------------------------------------------------------------------------

def save_state(path: str, state: Any) -> None:
    leaves = jax.tree_util.tree_leaves(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_state(path: str, like: Any) -> Any:
    """Restore a snapshot into the structure of ``like`` (same pytree shape)."""
    treedef = jax.tree_util.tree_structure(like)
    n = treedef.num_leaves
    with np.load(path) as z:
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
