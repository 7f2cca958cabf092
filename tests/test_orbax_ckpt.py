"""Orbax checkpoint manager: save/restore round trip, rolling retention,
empty-dir behavior — the preemption-safe resume path (SURVEY §5)."""
import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.core.orbax_ckpt import OrbaxStateManager
from multimodal_deepfake_detection_tpu.train import TrainState, make_optimizer


def _state(v):
    tx = make_optimizer("adam", 1e-3)
    params = {"w": jnp.full((4,), float(v)), "nested": {"b": jnp.arange(3.0)}}
    return TrainState(jnp.asarray(v), params, {"bn": jnp.zeros(2)}, tx.init(params), None)


def test_roundtrip_and_retention(tmp_path):
    mgr = OrbaxStateManager(str(tmp_path / "ck"), max_to_keep=2)
    for step in (1, 2, 3):
        mgr.save(step, _state(step))
    assert mgr.latest_step() == 3

    restored = mgr.restore_latest(like=_state(0))
    assert int(restored.step) == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.full(4, 3.0))
    np.testing.assert_array_equal(np.asarray(restored.params["nested"]["b"]), np.arange(3.0))

    # rolling retention: only the last 2 steps survive
    import os

    kept = sorted(d for d in os.listdir(tmp_path / "ck") if d.isdigit())
    assert kept == ["2", "3"]
    mgr.close()


def test_train_audio_orbax_backend_and_auto_resume(tmp_path):
    from multimodal_deepfake_detection_tpu.cli.train_audio import main
    from multimodal_deepfake_detection_tpu.data import make_audio_npy_tree

    tree = make_audio_npy_tree(str(tmp_path / "a"), n_per_class=2, frames=8)
    ck = str(tmp_path / "ck")
    args = [
        "--train_folder", f"{tree}/train", "--eval_folder", f"{tree}/eval",
        "--checkpoint_dir", ck, "--hidden_dim", "8", "--batch_size", "4",
        "--epochs", "2", "--eval_every", "1", "--buckets", "8",
        "--compute_dtype", "float32", "--ckpt_backend", "orbax",
    ]
    main(args, log=lambda s: None)
    import os

    assert sorted(d for d in os.listdir(os.path.join(ck, "train_audio_orbax")) if d.isdigit()) == ["1", "2"]
    logs = []
    main(args + ["--epochs", "1", "--resume", "auto"], log=logs.append)
    assert any("resumed from orbax step 2" in l for l in logs)


def test_empty_directory_returns_none(tmp_path):
    mgr = OrbaxStateManager(str(tmp_path / "empty"))
    assert mgr.latest_step() is None
    assert mgr.restore_latest(like=_state(0)) is None
    mgr.close()


def test_tp_sharded_restore_on_mesh(tmp_path):
    """Preemption-recovery on a multi-chip mesh (SURVEY §5 failure recovery):
    save a TrainState whose params carry REAL DP x TP NamedShardings on the
    8-device mesh, restore into fresh shardings via restore_latest(like=...),
    continue one step, and assert bit-equality with the uninterrupted run —
    backing the sharding-aware-restore claim in core/orbax_ckpt.py."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from multimodal_deepfake_detection_tpu.parallel.sharding import param_shardings
    from multimodal_deepfake_detection_tpu.train.steps import make_train_step

    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(4, 2), ("data", "model"))
    # host numpy leaves: jax.device_put of an on-device array can ALIAS its
    # buffer, and the train step donates the state — the base tree must stay
    # alive for the second placement (the restore target)
    params = {
        "fc_layers": [{
            "w": np.arange(8 * 64, dtype=np.float32).reshape(8, 64) / 100.0,
            "b": np.zeros(64, np.float32),
        }],
        "lstm": {"w_ih": np.ones((4, 32), np.float32)},
        "head": {"w": np.full((64, 1), 0.1, np.float32)},
    }
    shardings = param_shardings(mesh, params)
    # the fixture exercises genuinely TP-split leaves, not just replication
    assert shardings["fc_layers"][0]["w"].spec == P(None, "model")
    assert shardings["lstm"]["w_ih"].spec == P(None, "model")
    placed = jax.tree_util.tree_map(jax.device_put, params, shardings)
    tx = make_optimizer("adam", 1e-2)

    repl = NamedSharding(mesh, P())

    def fresh_state(placed_params):
        # every non-param leaf must ALSO live on the mesh: a restored state is
        # committed, and jit rejects mixed single-device / mesh placements
        def on_mesh(tree):
            return jax.tree_util.tree_map(
                lambda x: x if getattr(getattr(x, "sharding", None), "mesh", None) is mesh
                else jax.device_put(x, repl),
                tree,
            )

        return TrainState(
            on_mesh(jnp.zeros((), jnp.int32)), placed_params, on_mesh({"bn": jnp.zeros(2)}),
            on_mesh(tx.init(placed_params)), None,
        )

    def fwd(p, bn_state, rng, batch):
        x, y = batch
        h = jnp.tanh(x @ p["fc_layers"][0]["w"] + p["fc_layers"][0]["b"])
        pred = (h @ p["head"]["w"])[:, 0] + jnp.sum(p["lstm"]["w_ih"]) * 1e-6
        return jnp.mean((pred - y) ** 2), (bn_state, pred)

    step_fn = make_train_step(fwd, tx)
    data_sh = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(0)
    xb = jax.device_put(rng.random((8, 8), np.float32), data_sh)
    yb = jax.device_put(np.arange(8, dtype=np.float32), data_sh)

    state, _, _ = step_fn(fresh_state(placed), (xb, yb), 0, ())
    mgr = OrbaxStateManager(str(tmp_path / "ck"))
    mgr.save(1, state)

    # restored state must come back with the ORIGINAL shardings...
    like = fresh_state(jax.tree_util.tree_map(jax.device_put, params, shardings))
    restored = mgr.restore_latest(like=like)
    mgr.close()
    assert int(restored.step) == 1
    w_r = restored.params["fc_layers"][0]["w"]
    assert w_r.sharding.is_equivalent_to(shardings["fc_layers"][0]["w"], w_r.ndim)

    # ...and continuing from it must match the uninterrupted run exactly
    state_cont, loss_cont, _ = step_fn(state, (xb, yb), 1, ())
    state_resumed, loss_resumed, _ = step_fn(restored, (xb, yb), 1, ())
    assert float(loss_resumed) == float(loss_cont)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_resumed.params),
        jax.tree_util.tree_leaves(state_cont.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
