"""Multi-chip sharding: driver entry contract + DP x TP dry run on the
8-device virtual CPU mesh (SURVEY.md §4 simulated-multi-device strategy)."""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles_single_chip():
    import jax
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[2].shape[0],)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_param_shardings_tp_split():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from multimodal_deepfake_detection_tpu.parallel.sharding import param_shardings

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    params = {
        "fc_layers": [{"w": jnp.zeros((16, 64)), "b": jnp.zeros(64)}],
        "lstm": {"w_ih": jnp.zeros((8, 32)), "w_hh": jnp.zeros((8, 32))},
        "backbone": {"conv1": {"w": jnp.zeros((3, 3, 3, 32))}},
    }
    sh = param_shardings(mesh, params)
    assert sh["fc_layers"][0]["w"].spec == P(None, "model")
    assert sh["fc_layers"][0]["b"].spec == P("model")
    assert sh["lstm"]["w_ih"].spec == P(None, "model")
    assert sh["lstm"]["w_hh"].spec == P()
    assert sh["backbone"]["conv1"]["w"].spec == P()
