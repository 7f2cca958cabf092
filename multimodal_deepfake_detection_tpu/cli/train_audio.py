"""Train the audio-temporal model (XceptionLSTMA) on MFCC npy trees.

TPU-native re-design of ``/root/reference/train_audio.py``: same semantics —
XceptionLSTMA(hidden 512), BCE on sigmoid outputs, Adam 1e-4, plateau LR
(factor 0.5 / patience 5), eval every 10 epochs, best-eval-loss checkpoint,
early-stop patience 10, batch 8, 100 epochs — but the whole train step
(backbone + LSTM + loss + grads + Adam + BN-stat update) is ONE jitted XLA
program, bf16 on the MXU, and data-parallel over every visible device via a
mesh (replacing ``nn.DataParallel``).

Usage:
    python -m multimodal_deepfake_detection_tpu.cli.train_audio \
        --train_folder data/processed_audio/train --eval_folder data/processed_audio/eval
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.checkpoint import save_bundle, save_state
from ..core.config import parse_config
from ..data import DataLoader, NpyFolderDataset
from ..models.heads import xception_lstm_features, xception_lstm_head_apply, xception_lstm_init
from ..models.losses import bce_loss
from ..parallel import auto_data_mesh, replicate, shard_batch
from ..train import PlateauScheduler, TrainLoop, TrainState, make_optimizer
from ..train.steps import make_eval_step, make_train_step


@dataclasses.dataclass
class Config:
    """train_audio configuration (defaults = reference hyperparameters)."""

    train_folder: str = "Dataset/processed_audio/train"
    eval_folder: str = "Dataset/processed_audio/eval"
    checkpoint_dir: str = "Checkpoints"
    hidden_dim: int = 512
    batch_size: int = 8
    lr: float = 1e-4
    epochs: int = 100
    eval_every: int = 10
    early_stop_patience: int = 10
    plateau_factor: float = 0.5
    plateau_patience: int = 5
    seed: int = 0
    compute_dtype: str = "bfloat16"  # 'bfloat16' | 'float32'
    buckets: Tuple[int, ...] = (120,)  # audio clips are 120 MFCC frames (SURVEY C6)
    mask_padding: bool = True  # False = reference's pad-consuming LSTM quirk
    # rematerialize backbone blocks in the backward pass (jax.checkpoint)
    remat: bool = False
    freeze_backbone: bool = True  # reference freezes Xception (XceptionLSTMA.py:11-12)
    # Quality mode: run the frozen backbone's BN in eval mode (running stats,
    # no stat updates) inside the train step. The reference freezes params
    # only and leaves BN in train mode (XceptionLSTMA.py:11-12) — that
    # bit-for-bit behavior stays the default.
    backbone_bn_eval: bool = False
    # Compute the invariant frozen-backbone features ONCE (first epoch) and
    # train the LSTM/MLP head on cached 2048-d features thereafter — an
    # order-of-magnitude epoch-time lever. Requires freeze_backbone and
    # implies backbone_bn_eval (caching is exact only with eval-BN features;
    # see train/feature_cache.py for the fidelity caveat and RAM cost).
    cache_features: bool = False
    native_loader: bool = False  # C++ batched npy collate (native/npy_collate.cc)
    jsonl_log: Optional[str] = None  # path for structured per-epoch JSONL metrics
    tracker: Optional[str] = None  # extra sinks: 'tensorboard:<dir>' and/or 'wandb:<project>'
    ckpt_backend: str = "npz"  # 'npz' (single-file) | 'orbax' (versioned, preemption-safe)
    resume: Optional[str] = None  # npz path, or 'auto' with ckpt_backend=orbax
    save_resume_state: bool = True


def build(config: Config, train_ds=None, eval_ds=None):
    """Construct loaders, state, and jitted steps. Split out for tests."""
    cdtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    train_ds = train_ds or NpyFolderDataset(config.train_folder, kind="audio")
    eval_ds = eval_ds or NpyFolderDataset(config.eval_folder, kind="audio")
    if config.native_loader:
        from ..data.native_loader import make_native_loader

        train_loader = make_native_loader(
            train_ds, config.batch_size, buckets=config.buckets, seed=config.seed
        )
        eval_loader = make_native_loader(eval_ds, config.batch_size, buckets=config.buckets)
    else:
        train_loader = DataLoader(
            train_ds, config.batch_size, shuffle=False, seed=config.seed, buckets=config.buckets
        )
        eval_loader = DataLoader(eval_ds, config.batch_size, buckets=config.buckets)

    rng = jax.random.PRNGKey(config.seed)
    params, bn_state = xception_lstm_init(rng, config.hidden_dim)
    tx = make_optimizer("adam", config.lr)
    state = TrainState(jnp.zeros((), jnp.int32), params, bn_state, tx.init(params))

    backbone_bn_eval = config.backbone_bn_eval
    if config.cache_features:
        if not config.freeze_backbone:
            raise ValueError("--cache_features requires --freeze_backbone (the cached "
                             "features are only invariant for a frozen backbone)")
        backbone_bn_eval = True  # caching is exact only with eval-BN features
        from ..train.feature_cache import FeatureCachingLoader

        # feat_src is a mutable box so main() can point it at a RESUMED
        # state's backbone before the first epoch (frozen params are normally
        # identical to init, but only when the seeds match). Host copies: the
        # live state buffers get DONATED by the first train step, and the
        # eval loader only computes its cache after that.
        feat_src = jax.tree_util.tree_map(
            np.asarray, {"params": params, "bn_state": bn_state}
        )
        feat_jit = jax.jit(
            lambda p, b, x: xception_lstm_features(
                p, b, x, mode="audio", train=False, compute_dtype=cdtype
            )[0]
        )
        feat_fn = lambda x: feat_jit(feat_src["params"], feat_src["bn_state"], x)
        train_loader = FeatureCachingLoader(train_loader, feat_fn)
        eval_loader = FeatureCachingLoader(eval_loader, feat_fn)
        train_loader.feat_src = eval_loader.feat_src = feat_src

    mesh = auto_data_mesh(config.batch_size)
    if mesh is not None:
        state = replicate(mesh, state)

    def _forward(params, bn_state, rng, batch, train):
        x, labels, lengths = batch
        if config.cache_features:
            feats, new_bn = x, bn_state  # x already IS the cached (B,T,2048) features
        else:
            feats, new_bn = xception_lstm_features(
                params, bn_state, x, mode="audio",
                train=train and not backbone_bn_eval, compute_dtype=cdtype,
                remat=config.remat and train,
            )
        probs = xception_lstm_head_apply(
            params,
            feats,
            train=train,
            rng=rng,
            lengths=lengths, mask_padding=config.mask_padding,
            compute_dtype=cdtype,
        )
        w = (lengths > 0).astype(jnp.float32)
        loss = bce_loss(probs, labels[:, None], sample_weight=w[:, None])
        return loss, new_bn, probs

    def train_forward(params, bn_state, rng, batch):
        loss, new_bn, probs = _forward(params, bn_state, rng, batch, True)
        return loss, (new_bn, probs)

    def eval_forward(params, bn_state, batch):
        loss, _, probs = _forward(params, bn_state, None, batch, False)
        return loss, probs

    frozen = ("backbone",) if config.freeze_backbone else ()
    raw_train_step = make_train_step(train_forward, tx)
    raw_eval_step = make_eval_step(eval_forward)

    def train_step(state, batch, rng_seed, epoch):
        batch = shard_batch(mesh, batch) if mesh is not None else batch
        return raw_train_step(state, batch, rng_seed, frozen)

    def eval_step(state, batch):
        batch = shard_batch(mesh, batch) if mesh is not None else batch
        return raw_eval_step(state, batch)

    return train_loader, eval_loader, state, train_step, eval_step


def main(argv=None, *, train_ds=None, eval_ds=None, log=print):
    config = parse_config(Config, argv, prog="train_audio")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    train_loader, eval_loader, state, train_step, eval_step = build(config, train_ds, eval_ds)

    os.makedirs(config.checkpoint_dir, exist_ok=True)
    best_path = os.path.join(config.checkpoint_dir, "best_model_audio.npz")
    resume_path = os.path.join(config.checkpoint_dir, "train_audio_state.npz")

    orbax_mgr = None
    if config.ckpt_backend == "orbax":
        from ..core.orbax_ckpt import OrbaxStateManager

        orbax_mgr = OrbaxStateManager(os.path.join(config.checkpoint_dir, "train_audio_orbax"))

    if config.resume:
        if orbax_mgr is not None and config.resume == "auto":
            restored = orbax_mgr.restore_latest(like=state)
            if restored is not None:
                state = restored
                log(f"resumed from orbax step {orbax_mgr.latest_step()}")
        else:
            from ..core.checkpoint import load_state

            state = load_state(config.resume, like=state)
            log(f"resumed train state from {config.resume} (step {int(state.step)})")
        if config.cache_features and hasattr(train_loader, "feat_src"):
            # cache features with the RESUMED (frozen) backbone, not the init one
            host = jax.tree_util.tree_map(lambda x: np.asarray(x), (state.params, state.bn_state))
            train_loader.feat_src["params"], train_loader.feat_src["bn_state"] = host

    def on_best(state, result):
        # best-eval-loss export, reference policy (/root/reference/train_audio.py:84-88)
        save_bundle(best_path, {"model": state.params, "state": state.bn_state})
        log(f"new best model saved -> {best_path}")

    specs = []
    if config.jsonl_log:
        specs.append(f"jsonl:{config.jsonl_log}")
    if config.tracker:
        specs.append(config.tracker)
    from ..utils.metric_logger import make_metric_logger

    jsonl = make_metric_logger(specs, run_name="train_audio", config=config)

    def on_epoch(state, result):
        if config.save_resume_state:
            if orbax_mgr is not None:
                orbax_mgr.save(result.epoch + 1, state)
            else:
                save_state(resume_path, state)
        if jsonl is not None:
            jsonl.log_epoch(result)

    loop = TrainLoop(
        train_step=train_step,
        eval_step=eval_step,
        state=state,
        train_loader=train_loader,
        eval_loader=eval_loader,
        num_epochs=config.epochs,
        eval_every=config.eval_every,
        early_stop_patience=config.early_stop_patience,
        plateau=PlateauScheduler(
            config.lr, factor=config.plateau_factor, patience=config.plateau_patience
        ),
        best_policy="loss",
        on_best=on_best,
        on_epoch=on_epoch,
        metrics_variant="basic",
        log=log,
        seed=config.seed,
    )
    history = loop.run()
    log("Training Finished!")
    return history


if __name__ == "__main__":
    main()
