"""One process of an n-process CPU cluster running a sharded train step.

Spawned by tests/test_multihost.py to verify the REAL multi-host branches of
parallel/distributed.py (jax.distributed.initialize + hybrid dcn x data
meshes) — the paths a single-process environment cannot reach. Each process
owns ``local_devices`` virtual CPU devices; cross-process collectives run
over gloo. Prints one ``RESULT {json}`` line with replicated-scalar
checksums the test compares against a single-device reference run.

Not a test module (pytest collects test_*.py only); also imported by the
test for the shared model/step definition so both sides run identical math.
"""
import json
import os
import sys


def build_and_step(mesh):
    """A compact but real train step (conv+BN -> scan-LSTM -> MLP head, BCE)
    through train.steps.make_train_step; ``mesh=None`` = one device.

    The model is deliberately small (CPU-compile seconds, not minutes) — the
    semantics under test are the cross-process mesh/collectives: live-BN
    batch stats, the DP gradient reduction, and the optimizer update must be
    identical whether the batch lives on one device or is split over a
    (dcn, data) hybrid mesh spanning processes.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_deepfake_detection_tpu.models.losses import bce_loss
    from multimodal_deepfake_detection_tpu.ops.conv import (
        batch_norm,
        batch_norm_init,
        conv2d,
        conv2d_init,
        global_avg_pool,
        linear,
        linear_init,
    )
    from multimodal_deepfake_detection_tpu.ops.lstm import (
        lstm_apply,
        lstm_init,
        select_last_step,
    )
    from multimodal_deepfake_detection_tpu.train import TrainState, ema_init, make_optimizer
    from multimodal_deepfake_detection_tpu.train.steps import make_train_step

    rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    bn_p, bn_s = batch_norm_init(8)
    params = {
        "backbone": {"conv": conv2d_init(r1, 3, 8, 3), "bn": bn_p},
        "lstm": lstm_init(r2, 8, 8),
        "head": linear_init(r3, 8, 1),
    }
    bn_state = {"backbone": {"bn": bn_s}}

    def train_forward(params, bn_state, rng, batch):
        video, labels, lengths = batch  # (B, T, S, S, 3)
        B, T = video.shape[:2]
        x = video.reshape((B * T,) + video.shape[2:])
        x = conv2d(params["backbone"]["conv"], x, stride=2, padding=1)
        x, new_bn = batch_norm(
            params["backbone"]["bn"], bn_state["backbone"]["bn"], x, train=True
        )
        x = jax.nn.relu(x)
        feats = global_avg_pool(x).reshape(B, T, -1)
        hs, _ = lstm_apply(params["lstm"], feats)
        last = select_last_step(hs, lengths)
        probs = jax.nn.sigmoid(linear(params["head"], last)[:, 0])
        loss = bce_loss(probs, labels)
        return loss, ({"backbone": {"bn": new_bn}}, probs)

    # deterministic global batch, identical in every process
    nprng = np.random.default_rng(7)
    B, T, S = 8, 3, 16
    video = nprng.random((B, T, S, S, 3), np.float32)
    labels = (np.arange(B) % 2).astype(np.float32)
    lengths = np.full((B,), T, np.int32)
    batch_np = (video, labels, lengths)

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        place = lambda a, sh: jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])
        params = jax.tree_util.tree_map(lambda x: place(np.asarray(x), repl), params)
        bn_state = jax.tree_util.tree_map(lambda x: place(np.asarray(x), repl), bn_state)
        batch = tuple(place(a, batch_sh) for a in batch_np)
    else:
        batch = batch_np

    tx = make_optimizer("adam", 1e-3, grad_clip=1.0)
    opt_state = tx.init(params)
    state = TrainState(jnp.zeros((), jnp.int32), params, bn_state, opt_state, ema_init(params))
    train_step = make_train_step(train_forward, tx, use_ema=True)

    state, loss, probs = train_step(state, batch, 0, ())

    import jax.tree_util as jtu

    @jax.jit
    def checksums(state, probs):
        leaf_norms = {
            jtu.keystr(path): jnp.linalg.norm(leaf.astype(jnp.float32))
            for path, leaf in jtu.tree_flatten_with_path(state.params)[0]
        }
        bn_norms = {
            jtu.keystr(path): jnp.linalg.norm(leaf.astype(jnp.float32))
            for path, leaf in jtu.tree_flatten_with_path(state.bn_state)[0]
        }
        return leaf_norms, bn_norms, jnp.sum(probs)

    leaf_norms, bn_norms, probs_sum = checksums(state, probs)
    return {
        "loss": float(loss),
        "step": int(state.step),
        "probs_sum": float(probs_sum),
        "param_norms": {k: float(v) for k, v in leaf_norms.items()},
        "bn_norms": {k: float(v) for k, v in bn_norms.items()},
    }


def main():
    proc, nprocs, port, local_devices = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from multimodal_deepfake_detection_tpu.parallel.distributed import (
        hybrid_mesh,
        initialize,
    )

    initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=proc
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == nprocs * local_devices, jax.devices()
    mesh = hybrid_mesh()
    assert dict(mesh.shape) == {"dcn": nprocs, "data": local_devices}, mesh.shape
    res = build_and_step(mesh)
    res["process"] = proc
    res["mesh"] = dict(mesh.shape)
    print("RESULT " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
