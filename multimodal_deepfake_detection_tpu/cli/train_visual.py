"""Train the video-temporal model (XceptionLSTMV + ArcFace) on face npy trees.

TPU-native re-design of the live ArcFace variant of
``/root/reference/train_visual.py:436-649``: XceptionLSTMV(hidden 128) with an
ArcFace(s=30, m=0.5) head, cross-entropy on the margin logits, Adam 1e-5 /
weight-decay 1e-4, plateau LR (factor 0.5 / patience 3), grad-clip 1.0,
backbone frozen for the first 3 epochs then unfrozen, probs = softmax[:, 1]
of the margin logits, joint best-(loss AND EER) checkpointing of a
``{model, arcface}`` bundle, early-stop patience 6, batch 4, 50 epochs.

The reference's AMP autocast+GradScaler becomes bf16 compute (no loss scaling
needed); the freeze/unfreeze flips become static gradient masks (two compiled
step variants); eval keeps the reference quirk of applying the margin with
labels during the per-epoch eval pass (``train_visual.py:620-622``).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.checkpoint import load_state, save_bundle, save_state
from ..core.config import parse_config
from ..data import DataLoader, NpyFolderDataset
from ..models.heads import (
    arcface_apply,
    arcface_init,
    xception_lstm_embed,
    xception_lstm_features,
    xception_lstm_init,
)
from ..models.losses import cross_entropy_loss
from ..parallel import auto_data_mesh, replicate, shard_batch
from ..train import PlateauScheduler, TrainLoop, TrainState, make_optimizer
from ..train.steps import make_eval_step, make_train_step


@dataclasses.dataclass
class Config:
    """train_visual configuration (defaults = reference ArcFace variant)."""

    train_folder: str = "Dataset/processed/train"
    eval_folder: str = "Dataset/processed/eval"
    checkpoint_dir: str = "Checkpoints"
    bundle_name: str = "XceptionLSTMV_ArcFace_Best.npz"
    hidden_dim: int = 128
    arcface_s: float = 30.0
    arcface_m: float = 0.5
    batch_size: int = 4
    lr: float = 1e-5
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    epochs: int = 50
    freeze_epochs: int = 3
    eval_every: int = 1
    early_stop_patience: int = 6
    plateau_factor: float = 0.5
    plateau_patience: int = 3
    max_frames: int = 50
    # dataset mode: 'npy' (flat filename-label tree) or the D2 metadata modes
    # 'fakeavceleb' / 'lavdf' / 'lavdf_raw' (train_visual.py:495-507 uses lavdf_raw)
    mode: str = "npy"
    csv_path: Optional[str] = None
    lavdf_json: Optional[str] = None
    use_face_detection: bool = False
    frame_size: Tuple[int, int] = (224, 224)
    augment_minority: bool = False
    sample_percentage: float = 1.0
    seed: int = 0
    shuffle: bool = True
    compute_dtype: str = "bfloat16"
    buckets: Tuple[int, ...] = (25, 50)
    mask_padding: bool = True
    # Reference quirk: the per-epoch eval pass applies the ArcFace margin WITH
    # labels (train_visual.py:620-622), which poisons eval loss/EER until the
    # raw angular separation exceeds the margin (~13 logit units at s=30,
    # m=0.5) — the joint best-(loss,EER) bundle can stay pinned at epoch 1 in
    # short/from-scratch runs. false = quality mode: margin-free eval like the
    # final test CLI (test_visual.py:620-624), same flag pattern as
    # --mask_padding.
    eval_with_margin: bool = True
    # rematerialize backbone blocks in the backward pass (jax.checkpoint)
    remat: bool = False
    # Quality mode: run the backbone's BN in eval mode during its FROZEN
    # epochs (running stats, no stat updates). The reference freezes params
    # only and leaves BN in train mode; that stays the default.
    backbone_bn_eval: bool = False
    # Serve the frozen-phase epochs (epoch < freeze_epochs) from a one-shot
    # feature cache, switching to raw frames at the unfreeze epoch — the
    # invariant backbone forward is computed once instead of freeze_epochs
    # times. Requires shuffle=False and freeze_epochs > 0; implies
    # backbone_bn_eval during the frozen phase (see train/feature_cache.py).
    cache_features: bool = False
    jsonl_log: Optional[str] = None  # structured per-epoch JSONL metrics
    tracker: Optional[str] = None  # extra sinks: 'tensorboard:<dir>' and/or 'wandb:<project>'
    # threaded decode fan-out per batch (reference num_workers=2,
    # /root/reference/train_visual.py:545-546); the lever for the
    # codec-bound raw-video path (PERF.md)
    num_workers: int = 0
    ckpt_backend: str = "npz"  # 'npz' | 'orbax' (versioned, preemption-safe)
    resume: Optional[str] = None  # npz path, or 'auto' with ckpt_backend=orbax
    save_resume_state: bool = True


def build(config: Config, train_ds=None, eval_ds=None):
    cdtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    if config.mode != "npy" and train_ds is None:
        from ..data.video_enhanced import get_face_dataloader

        common = dict(
            mode=config.mode,
            csv_path=config.csv_path,
            lavdf_json=config.lavdf_json,
            batch_size=config.batch_size,
            use_face_detection=config.use_face_detection,
            frame_size=tuple(config.frame_size),
            max_frames=config.max_frames,
            buckets=config.buckets,
            seed=config.seed,
            num_workers=config.num_workers,
        )
        train_loader = get_face_dataloader(
            config.train_folder,
            subset="train",
            shuffle=config.shuffle,
            augment_minority=config.augment_minority,
            sample_percentage=config.sample_percentage,
            **common,
        )
        eval_loader = get_face_dataloader(config.eval_folder, subset="eval", **common)
    else:
        train_ds = train_ds or NpyFolderDataset(config.train_folder, kind="video", max_frames=config.max_frames)
        eval_ds = eval_ds or NpyFolderDataset(config.eval_folder, kind="video", max_frames=config.max_frames)
        train_loader = DataLoader(
            train_ds, config.batch_size, shuffle=config.shuffle, seed=config.seed, buckets=config.buckets
        )
        eval_loader = DataLoader(eval_ds, config.batch_size, buckets=config.buckets)

    rng = jax.random.PRNGKey(config.seed)
    r1, r2 = jax.random.split(rng)
    params, bn_state = xception_lstm_init(r1, config.hidden_dim)
    params["arcface"] = arcface_init(r2, config.hidden_dim, 2)
    tx = make_optimizer("adam", config.lr, weight_decay=config.weight_decay, grad_clip=config.grad_clip)
    state = TrainState(jnp.zeros((), jnp.int32), params, bn_state, tx.init(params))

    backbone_bn_eval = config.backbone_bn_eval or config.cache_features
    if config.cache_features:
        if config.freeze_epochs <= 0:
            raise ValueError("--cache_features requires freeze_epochs > 0 (it caches "
                             "the frozen-phase backbone forward)")
        if config.shuffle:
            raise ValueError("--cache_features requires --shuffle false (the cached "
                             "phase replays the epoch-0 batch order)")
        import numpy as np

        from ..train.feature_cache import PhaseSwitchLoader, _EpochCounter

        feat_src = jax.tree_util.tree_map(  # host copies: live buffers get donated
            np.asarray, {"params": params, "bn_state": bn_state}
        )
        feat_jit = jax.jit(
            lambda p, b, x: xception_lstm_features(
                p, b, x, mode="video", train=False, compute_dtype=cdtype
            )[0]
        )
        feat_fn = lambda x: feat_jit(feat_src["params"], feat_src["bn_state"], x)
        ctr = _EpochCounter()
        train_loader = PhaseSwitchLoader(
            train_loader, feat_fn, switch_epoch=config.freeze_epochs, counter=ctr, role="train"
        )
        eval_loader = PhaseSwitchLoader(
            eval_loader, feat_fn, switch_epoch=config.freeze_epochs, counter=ctr, role="eval"
        )
        train_loader.feat_src = eval_loader.feat_src = feat_src

    mesh = auto_data_mesh(config.batch_size)
    if mesh is not None:
        state = replicate(mesh, state)

    def _forward(params, bn_state, rng, batch, train, bb_eval=False):
        video, labels, lengths = batch
        if video.ndim == 3:  # cached (B, T, F) frozen-phase features
            feats, new_bn = video, bn_state
        else:
            feats, new_bn = xception_lstm_features(
                params, bn_state, video, mode="video",
                train=train and not bb_eval, compute_dtype=cdtype,
                remat=config.remat and train,
            )
        emb = xception_lstm_embed(
            params, feats, lengths=lengths, mask_padding=config.mask_padding, compute_dtype=cdtype
        )
        labels_i = labels.astype(jnp.int32)
        # margin applied with labels in BOTH train and per-epoch eval passes
        # (reference quirk; --eval_with_margin false evals margin-free)
        margin_labels = labels_i if (train or config.eval_with_margin) else None
        logits = arcface_apply(params["arcface"], emb, margin_labels, s=config.arcface_s, m=config.arcface_m)
        w = (lengths > 0).astype(jnp.float32)
        loss = cross_entropy_loss(logits, labels_i, sample_weight=w)
        probs = jax.nn.softmax(logits, axis=-1)[:, 1]
        return loss, new_bn, probs

    def train_forward(params, bn_state, rng, batch):
        loss, new_bn, probs = _forward(params, bn_state, rng, batch, True)
        return loss, (new_bn, probs)

    def train_forward_bneval(params, bn_state, rng, batch):
        loss, new_bn, probs = _forward(params, bn_state, rng, batch, True, bb_eval=True)
        return loss, (new_bn, probs)

    def eval_forward(params, bn_state, batch):
        loss, _, probs = _forward(params, bn_state, None, batch, False)
        return loss, probs

    raw_train_step = make_train_step(train_forward, tx)
    raw_train_step_bneval = make_train_step(train_forward_bneval, tx) if backbone_bn_eval else None
    raw_eval_step = make_eval_step(eval_forward)

    def train_step(state, batch, rng_seed, epoch):
        frozen_now = epoch < config.freeze_epochs
        frozen = ("backbone",) if frozen_now else ()
        batch = shard_batch(mesh, batch) if mesh is not None else batch
        step = raw_train_step_bneval if (frozen_now and backbone_bn_eval) else raw_train_step
        return step(state, batch, rng_seed, frozen)

    def eval_step(state, batch):
        batch = shard_batch(mesh, batch) if mesh is not None else batch
        return raw_eval_step(state, batch)

    return train_loader, eval_loader, state, train_step, eval_step


def main(argv=None, *, train_ds=None, eval_ds=None, log=print):
    config = parse_config(Config, argv, prog="train_visual")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    train_loader, eval_loader, state, train_step, eval_step = build(config, train_ds, eval_ds)

    os.makedirs(config.checkpoint_dir, exist_ok=True)
    best_path = os.path.join(config.checkpoint_dir, config.bundle_name)
    resume_path = os.path.join(config.checkpoint_dir, "train_visual_state.npz")

    orbax_mgr = None
    if config.ckpt_backend == "orbax":
        from ..core.orbax_ckpt import OrbaxStateManager

        orbax_mgr = OrbaxStateManager(os.path.join(config.checkpoint_dir, "train_visual_orbax"))

    if config.resume:
        if orbax_mgr is not None and config.resume == "auto":
            restored = orbax_mgr.restore_latest(like=state)
            if restored is not None:
                state = restored
                log(f"resumed from orbax step {orbax_mgr.latest_step()}")
        else:
            state = load_state(config.resume, like=state)
            log(f"resumed train state from {config.resume} (step {int(state.step)})")
        if config.cache_features and hasattr(train_loader, "feat_src"):
            import numpy as _np

            # cache features with the RESUMED (frozen) backbone, not the init one
            host = jax.tree_util.tree_map(_np.asarray, (state.params, state.bn_state))
            train_loader.feat_src["params"], train_loader.feat_src["bn_state"] = host

    import numpy as np

    counts = np.bincount(np.asarray(train_loader.dataset.all_labels), minlength=2)
    log(f"class counts: real={counts[0]} fake={counts[1]}")

    def on_best(state, result):
        # {model, arcface} bundle, joint best loss+EER (train_visual.py:629-637)
        model_params = {k: v for k, v in state.params.items() if k != "arcface"}
        save_bundle(
            best_path,
            {"model": model_params, "arcface": state.params["arcface"], "state": state.bn_state},
        )
        log(f"new best model saved -> {best_path}")

    specs = []
    if config.jsonl_log:
        specs.append(f"jsonl:{config.jsonl_log}")
    if config.tracker:
        specs.append(config.tracker)
    from ..utils.metric_logger import make_metric_logger

    jsonl = make_metric_logger(specs, run_name="train_visual", config=config)

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
        best_policy="loss_and_eer",
        on_best=on_best,
        on_epoch=on_epoch,
        metrics_variant="basic",
        log=log,
        seed=config.seed,
    )
    history = loop.run()
    log("Training finished.")
    return history


if __name__ == "__main__":
    main()
