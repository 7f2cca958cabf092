"""Parameter sharding specs for multi-chip execution.

Data parallelism is the natural fit for this model family (small CNN+LSTM;
the reference's only distribution is DataParallel — SURVEY.md §0.6). On top,
when the mesh has a ``model`` axis, the tensors that carry the FLOPs are
tensor-parallel over it:

* conv weights (the CNN backbones — the dominant compute) split over their
  OUTPUT-channel dim, so every chip computes a channel shard of each
  activation; the matching BN scale/bias split the same way and the GSPMD
  partitioner propagates the channel sharding through depthwise convs,
  pools and residual adds, inserting collectives only where a contraction
  crosses the shard (the next conv's input reduction);
* the wide MLP tower (4x Linear-1024) and the LSTM input projection split
  column-wise.

Any annotation is semantically a no-op under SPMD — quality/parity are
unaffected by mesh shape (pinned by tests/test_multichip.py's 1-device vs
DP vs DP x TP training-equivalence test).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path: tuple, leaf, model_size: int) -> P:
    if model_size <= 1:
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
    shape = getattr(leaf, "shape", ())
    # conv kernels (HWIO: depthwise, pointwise, skip, stem): output-channel TP
    if keys[-1] == "w" and len(shape) == 4 and shape[-1] >= 32 and shape[-1] % model_size == 0:
        return P(None, None, None, "model")
    # matching per-channel BN affine params
    if (
        keys[-1] in ("scale", "bias")
        and len(shape) == 1
        and shape[0] >= 32
        and shape[0] % model_size == 0
        and any(isinstance(k, str) and k.startswith("bn") or k == "bn" for k in keys)
    ):
        return P("model")
    return P()


def param_shardings(mesh: Mesh, params: Any):
    """NamedSharding tree for params: replicated except TP-split layers."""
    msize = mesh.shape.get("model", 1) if "model" in mesh.axis_names else 1

    def spec(path, leaf):
        return NamedSharding(mesh, _spec_for_path(path, leaf, msize))

    return jax.tree_util.tree_map_with_path(spec, params)


def place_params(mesh: Mesh, params: Any):
    """device_put params according to param_shardings."""
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
