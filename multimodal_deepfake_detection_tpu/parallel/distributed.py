"""Multi-host initialization and slice-aware meshes.

Single-host multi-chip needs nothing beyond ``jax.devices()``; on multi-host
TPU slices each host must call :func:`initialize` once before any device use,
after which every mesh in :mod:`.mesh` spans the global device set and the
jitted train steps are unchanged — XLA routes the gradient reductions over
ICI within a slice and DCN across slices.

``hybrid_mesh`` builds a (dcn x ici) data-parallel mesh with
``mesh_utils.create_hybrid_device_mesh`` so the batch axis nests slice-local
fast reductions inside cross-slice ones (the standard multi-slice recipe).
This module is exercised to the extent the environment allows (single
process); the multi-host path follows the stock jax.distributed contract.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed bring-up (no-ops on single-process)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def hybrid_mesh(
    *,
    dcn_data: Optional[int] = None,
    axis_names: Sequence[str] = ("dcn", "data"),
) -> Mesh:
    """(num_slices, chips_per_slice) data mesh; falls back to a flat mesh when
    slice topology is unavailable (CPU/single-slice)."""
    import numpy as np
    from jax.experimental import mesh_utils

    devices = jax.devices()
    # DCN granule: TPU slices when slice_index actually partitions the device
    # set, host processes otherwise (multi-host CPU/GPU-style clusters, where
    # every device reports slice_index 0) — matching mesh_utils' granule
    # notion (process_is_granule).
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    n_slices_attr = len(slice_ids) if None not in slice_ids else 0
    if dcn_data:
        n_slices = dcn_data
    elif n_slices_attr > 1:
        n_slices = n_slices_attr
    else:
        n_slices = jax.process_count()
    if n_slices <= 1:
        return Mesh(np.array(devices).reshape(1, len(devices)), tuple(axis_names))
    mesh_devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, len(devices) // n_slices),
        dcn_mesh_shape=(n_slices, 1),
        devices=devices,
        process_is_granule=(n_slices_attr != n_slices),
    )
    return Mesh(mesh_devices, tuple(axis_names))
