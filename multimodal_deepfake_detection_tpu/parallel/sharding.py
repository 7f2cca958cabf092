"""Parameter sharding specs for multi-chip execution.

Data parallelism is the natural fit for this model family (small CNN+LSTM;
the reference's only distribution is DataParallel — SURVEY.md §0.6). On top,
when the mesh has a ``model`` axis, the wide MLP tower (4x Linear-1024, the
largest dense params) and the LSTM input projection are tensor-parallel:
weights split column-wise over ``model``, so each chip holds a shard and XLA
inserts the all-reduces. Any annotation is semantically a no-op under SPMD —
quality/parity are unaffected by mesh shape.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path: tuple, leaf, has_model_axis: bool) -> P:
    if not has_model_axis:
        return P()
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    # MLP tower + output projection: shard the wide (in, 1024) matmuls columnwise
    if "fc_layers" in keys:
        if keys[-1] == "w":
            return P(None, "model")
        if keys[-1] == "b":
            return P("model")
    # LSTM input projection (2048, 4H): columnwise over gates
    if "lstm" in keys and keys[-1] == "w_ih":
        return P(None, "model")
    return P()


def param_shardings(mesh: Mesh, params: Any):
    """NamedSharding tree for params: replicated except TP-split dense layers."""
    has_model = "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1

    def spec(path, leaf):
        return NamedSharding(mesh, _spec_for_path(path, leaf, has_model))

    return jax.tree_util.tree_map_with_path(spec, params)


def place_params(mesh: Mesh, params: Any):
    """device_put params according to param_shardings."""
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
