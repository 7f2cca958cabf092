"""Distributed helpers: single-process no-op init, hybrid mesh fallback."""
import jax
import numpy as np

from multimodal_deepfake_detection_tpu.parallel import distributed_initialize, hybrid_mesh


def test_initialize_noop_single_process():
    distributed_initialize()  # must not raise or hang


def test_hybrid_mesh_fallback_flat():
    mesh = hybrid_mesh()
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.shape["dcn"] == 1
    assert mesh.shape["data"] == len(jax.devices())
    # usable for sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.device_put(np.zeros((8, 4)), NamedSharding(mesh, P(("dcn", "data"))))
    assert x.shape == (8, 4)
