"""Device-mesh construction and sharding placement.

This replaces the reference's entire distribution story — single-process
``nn.DataParallel`` scatter/gather over local GPUs
(``/root/reference/train_audio.py:16-18``) — with the SPMD model: build a
``jax.sharding.Mesh`` over the slice, place the batch with a ``NamedSharding``
split on the ``data`` axis, replicate parameters, and let the XLA partitioner
insert the gradient ``psum`` over ICI. The jitted train step itself is
unchanged between 1 chip and N chips.

A second ``model`` axis is provisioned for tensor-parallel layouts (the
framework's models are small enough that pure DP is optimal at reference
scale, but the mesh API keeps the door open — SURVEY.md §5).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    *,
    devices=None,
) -> Mesh:
    """Mesh over all (or given) devices; default one 'data' axis spanning them."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def auto_data_mesh(batch_size: int, *, devices=None) -> Optional[Mesh]:
    """Largest data-parallel mesh whose size divides ``batch_size``.

    Returns None when only one device would participate (pure single-chip),
    so call sites can skip sharding entirely.
    """
    import math

    devices = list(devices if devices is not None else jax.devices())
    n = math.gcd(batch_size, len(devices))
    if n <= 1:
        return None
    return make_mesh(devices=devices[:n])


def data_sharding(mesh: Mesh, *, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, tree, *, axis: str = "data"):
    """device_put every array with its leading dim split over ``axis``.

    Scalars/0-d leaves are replicated.
    """
    def put(x):
        x = np.asarray(x)
        spec = P(axis) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
