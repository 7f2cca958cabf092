"""Train the cross-modal face+AU detector (ArcFace + class-balanced focal).

TPU-native re-design of the richest reference loop,
``/root/reference/train_au_face.py:388-768``:

* joint face+AU loaders with ``return_weights`` and a class-balanced
  weighted sampler on train (``:521-541,578-589``);
* AUFaceCrossDetector(17 AUs, 512/512 dims, biLSTM 256) + EMA
  (AveragedModel-style equal averaging of detector AND embed head, not the
  ArcFace head — ``:595,604``);
* embed head pooled-concat(1024) -> 256 -> 128 for ArcFace(s=30, m=0.30);
* class-balanced focal loss (beta .9999, gamma 2) from dataset class counts,
  plus MSE stream alignment (lambda 0.2) and temporal smoothness
  (lambda 0.1, averaged over both streams) regularizers (``:610-613,669-674``);
* AdamW 1e-4 / wd 0.01, OneCycle to max 1e-3 (pct_start 0.3), grad
  accumulation 4 with clip 1.0 applied per real step, EMA folded per real
  step (``:616-623,678-693``);
* eval with EMA detector+embed and the *current* ArcFace head, label-free
  logits -> softmax[:, 1] (``:708-732``);
* Youden and FPR<=5% operating-point reports each eval (``:736-745``);
* best-AUC bundle {model, embed, arcface, best_auc}, early-stop 8, seed 42.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.checkpoint import load_state, save_bundle, save_state
from ..core.config import parse_config
from ..data.au_patches import get_joint_dataloader
from ..data.loader import DataLoader
from ..metrics import compute_acc_ap_and_counts, pick_threshold
from ..models.au_face import au_face_detector_apply, au_face_detector_init
from ..models.heads import arcface_apply, arcface_init, embed_head_init, embed_head_apply
from ..models.losses import (
    adaptive_deepfake_loss,
    adaptive_loss_init,
    align_mse_loss,
    cb_focal_class_weights,
    cb_focal_loss,
    temporal_smoothness_loss,
)
from ..train import TrainLoop, TrainState, ema_init, make_optimizer
from ..train.schedules import onecycle_schedule
from ..train.steps import make_train_step


@dataclasses.dataclass
class Config:
    """train_au_face configuration (defaults = reference values)."""

    video_root: str = "Dataset/FAVC_frames"
    au_root: str = "Dataset/AU_Files/fakeavceleb_whole_image_patches"
    checkpoint_dir: str = "Checkpoints"
    bundle_name: str = "auface_cross_best_auc_arcface_cb.npz"
    num_aus: int = 17
    face_dim: int = 512
    au_dim: int = 512
    lstm_hidden: int = 256
    embed_dim: int = 128
    arcface_s: float = 30.0
    arcface_m: float = 0.30
    cb_beta: float = 0.9999
    cb_gamma: float = 2.0
    lambda_align: float = 0.2
    lambda_temp: float = 0.1
    # AdaptiveDeepfakeLoss: learn the align/temp mixing weights as
    # sigmoid(alpha), sigmoid(beta) instead of the fixed lambdas
    # (/root/reference/train_au_face.py:204-227, dead variant)
    adaptive_loss: bool = False
    batch_size: int = 2
    image_size: int = 128
    max_frames: int = 75
    # metadata label/split sources (D3 contract, /root/reference/
    # train_au_face.py:563-574, test_au_face.py:236-260)
    csv_path: Optional[str] = None
    lavdf_mode: bool = False
    lavdf_json_path: Optional[str] = None
    num_workers: int = 0
    lr: float = 1e-4
    max_lr: float = 1e-3
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    accum_steps: int = 4
    epochs: int = 100
    early_stop_patience: int = 8
    weighted_sampler: bool = True
    seed: int = 42
    compute_dtype: str = "bfloat16"
    buckets: Tuple[int, ...] = ()
    fpr_target: float = 0.05
    jsonl_log: Optional[str] = None  # structured per-epoch JSONL metrics
    tracker: Optional[str] = None  # extra sinks: 'tensorboard:<dir>' and/or 'wandb:<project>'
    ckpt_backend: str = "npz"  # 'npz' | 'orbax' (versioned, preemption-safe)
    resume: Optional[str] = None  # npz path, or 'auto' with ckpt_backend=orbax
    save_resume_state: bool = True


class _LoopLoader:
    def __init__(self, loader):
        self.loader = loader
        self.dataset = loader.dataset

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for videos, patches, labels, au_mask, au_weight, lengths in self.loader:
            yield (videos, patches, au_mask, au_weight), labels, lengths


def build(config: Config):
    cdtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    train_l, test_l, eval_l = get_joint_dataloader(
        config.video_root,
        config.au_root,
        csv_path=config.csv_path,
        lavdf_mode=config.lavdf_mode,
        lavdf_json_path=config.lavdf_json_path,
        num_workers=config.num_workers,
        batch_size=config.batch_size,
        shuffle=True,
        max_frames=config.max_frames,
        max_aus=config.num_aus,
        image_size=config.image_size,
        buckets=config.buckets or None,
        return_weights=True,
        seed=config.seed,
    )
    if config.weighted_sampler:
        train_l = DataLoader(
            train_l.dataset,
            config.batch_size,
            weighted=True,
            seed=config.seed,
            collate=train_l.collate,
        )

    counts = np.bincount(np.asarray(train_l.dataset.all_labels), minlength=2)
    samples_per_cls = [max(int(counts[0]), 1), max(int(counts[1]), 1)]
    class_weights = cb_focal_class_weights(samples_per_cls, beta=config.cb_beta)

    rng = jax.random.PRNGKey(config.seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    det_params, det_state = au_face_detector_init(
        k1,
        num_aus=config.num_aus,
        face_dim=config.face_dim,
        au_dim=config.au_dim,
        lstm_hidden=config.lstm_hidden,
    )
    params = {
        "model": det_params,
        "embed": embed_head_init(k2, config.face_dim + config.au_dim, out=config.embed_dim),
        "arcface": arcface_init(k3, config.embed_dim, 2),
    }
    if config.adaptive_loss:
        params["adaptive"] = adaptive_loss_init()
    bn_state = {"model": det_state}

    steps_per_epoch = max(1, int(np.ceil(len(train_l) / config.accum_steps)))
    schedule = onecycle_schedule(config.max_lr, config.epochs * steps_per_epoch, pct_start=0.3)
    tx = make_optimizer(
        "adamw",
        schedule,
        weight_decay=config.weight_decay,
        grad_clip=config.grad_clip,
        accum_steps=config.accum_steps,
    )
    state = TrainState(jnp.zeros((), jnp.int32), params, bn_state, tx.init(params), ema_init(params))

    def _pooled_embed(params, bn_state, batch, train, rng):
        (videos, patches, au_mask, au_weight), labels, lengths = batch
        _logits, v_tokens, au_tokens, new_det_state = au_face_detector_apply(
            params["model"], bn_state["model"], videos, patches, au_mask, au_weight,
            train=train, compute_dtype=cdtype,
        )
        v_pool = jnp.mean(v_tokens.astype(jnp.float32), axis=1)
        au_pool = jnp.mean(au_tokens.astype(jnp.float32), axis=1)
        pooled = jnp.concatenate([v_pool, au_pool], axis=-1)
        embed = embed_head_apply(
            params["embed"], pooled.astype(v_tokens.dtype), train=train, rng=rng, compute_dtype=cdtype
        )
        return embed, v_pool, au_pool, v_tokens, au_tokens, {"model": new_det_state}

    def train_forward(params, bn_state, rng, batch):
        embed, v_pool, au_pool, v_tokens, au_tokens, new_bn = _pooled_embed(
            params, bn_state, batch, True, rng
        )
        _, labels, lengths = batch
        labels_i = labels.astype(jnp.int32)
        logits = arcface_apply(params["arcface"], embed, labels_i, s=config.arcface_s, m=config.arcface_m)
        w = (lengths > 0).astype(jnp.float32)
        loss_cls = cb_focal_loss(logits, labels_i, class_weights, config.cb_gamma, sample_weight=w)
        loss_align = align_mse_loss(v_pool, au_pool)
        loss_temp = 0.5 * (temporal_smoothness_loss(v_tokens) + temporal_smoothness_loss(au_tokens))
        if config.adaptive_loss:
            loss = adaptive_deepfake_loss(params["adaptive"], loss_cls, loss_align, loss_temp)
        else:
            loss = loss_cls + config.lambda_align * loss_align + config.lambda_temp * loss_temp
        probs = jax.nn.softmax(logits, axis=-1)[:, 1]
        return loss, (new_bn, probs)

    raw_train = make_train_step(train_forward, tx, use_ema=True)

    @jax.jit
    def raw_eval(state, batch):
        # EMA detector+embed, CURRENT ArcFace head (train_au_face.py:708-732)
        eval_params = dict(state.ema.params)
        eval_params["arcface"] = state.params["arcface"]
        embed, *_rest, _new_bn = _pooled_embed(eval_params, state.bn_state, batch, False, None)
        logits = arcface_apply(eval_params["arcface"], embed, None, s=config.arcface_s)
        probs = jax.nn.softmax(logits, axis=-1)[:, 1]
        _, labels, lengths = batch
        labels_i = labels.astype(jnp.int32)
        w = (lengths > 0).astype(jnp.float32)
        loss = cb_focal_loss(
            arcface_apply(eval_params["arcface"], embed, labels_i, s=config.arcface_s, m=config.arcface_m),
            labels_i, class_weights, config.cb_gamma, sample_weight=w,
        )
        return loss, probs

    train_step = lambda state, batch, rng_seed, epoch: raw_train(state, batch, rng_seed, ())
    return _LoopLoader(train_l), _LoopLoader(eval_l), _LoopLoader(test_l), state, train_step, raw_eval


def main(argv=None, *, log=print):
    config = parse_config(Config, argv, prog="train_au_face")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    train_loader, eval_loader, _test_loader, state, train_step, eval_step = build(config)

    os.makedirs(config.checkpoint_dir, exist_ok=True)
    best_path = os.path.join(config.checkpoint_dir, config.bundle_name)
    resume_path = os.path.join(config.checkpoint_dir, "train_au_face_state.npz")
    orbax_mgr = None
    if config.ckpt_backend == "orbax":
        from ..core.orbax_ckpt import OrbaxStateManager

        orbax_mgr = OrbaxStateManager(os.path.join(config.checkpoint_dir, "train_au_face_orbax"))

    if config.resume:
        if orbax_mgr is not None and config.resume == "auto":
            restored = orbax_mgr.restore_latest(like=state)
            if restored is not None:
                state = restored
                log(f"resumed from orbax step {orbax_mgr.latest_step()}")
        else:
            state = load_state(config.resume, like=state)
            log(f"resumed train state from {config.resume} (step {int(state.step)})")

    counts = np.bincount(np.asarray(train_loader.dataset.all_labels), minlength=2)
    log(f"[Info] Class counts (for CB-Focal): real={counts[0]}, fake={counts[1]}")

    def on_best(state, result):
        save_bundle(
            best_path,
            {
                "model": state.ema.params["model"],
                "embed": state.ema.params["embed"],
                "arcface": state.params["arcface"],
                "state": state.bn_state["model"],
                "best_auc": jnp.asarray(result.eval_metrics["AUC"]),
            },
        )
        log(f"New best AUC: {result.eval_metrics['AUC']:.4f} - Model saved.")

    specs = []
    if config.jsonl_log:
        specs.append(f"jsonl:{config.jsonl_log}")
    if config.tracker:
        specs.append(config.tracker)
    from ..utils.metric_logger import make_metric_logger

    jsonl = make_metric_logger(specs, run_name="train_au_face", config=config)

    def on_epoch(state, result):
        if config.save_resume_state:
            if orbax_mgr is not None:
                orbax_mgr.save(result.epoch + 1, state)
            else:
                save_state(resume_path, state)
        if jsonl is not None:
            jsonl.log_epoch(result)
        if result.eval_scores is not None and result.eval_scores[0].size:
            y, s = result.eval_scores
            if len(np.unique(y)) >= 2:
                thr, fpr, tpr = pick_threshold(y, s, mode="fpr", fpr_target=config.fpr_target)
                acc, ap, cr, tr, cf, tf = compute_acc_ap_and_counts(y, s, thr)
                log(
                    f"Eval@FPR<={config.fpr_target:.0%}: Acc={acc:.4f}, AP={ap:.4f}, thr={thr:.3f}, "
                    f"FPR={fpr:.3f}, TPR={tpr:.3f}, Correct[real]={cr}/{tr}, Correct[fake]={cf}/{tf}"
                )

    loop = TrainLoop(
        train_step=train_step,
        eval_step=eval_step,
        state=state,
        train_loader=train_loader,
        eval_loader=eval_loader,
        num_epochs=config.epochs,
        early_stop_patience=config.early_stop_patience,
        best_policy="auc",
        on_best=on_best,
        on_epoch=on_epoch,
        metrics_variant="basic",
        log=log,
        seed=config.seed,
    )
    history = loop.run()
    log("Training Complete.")
    return history


if __name__ == "__main__":
    main()
