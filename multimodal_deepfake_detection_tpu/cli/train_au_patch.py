"""Train the AU-patch attention classifier (ResNet-LSTM path).

TPU-native re-design of the live loop at
``/root/reference/train_au_patch.py:154-320``: AU patch loaders with
balance/augment flags per split, AUPatchResNetClassifierWithAUAttention
(hidden 128, biLSTM 128), label-smoothing(0.1) BCE-with-logits, Adam 1e-4 /
wd 1e-4 / clip 1.0, plateau LR (0.5/4), best-eval-loss checkpoint, early-stop
patience 5, batch 2, 100 epochs. Reproduces the temperature-scaled sigmoid
metric quirk: probs = sigmoid(logits / 7.0) during training epochs and
sigmoid(logits / 2.0) at eval (``train_au_patch.py:253,289``).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.checkpoint import load_state, save_bundle, save_state
from ..core.config import parse_config
from ..data.au_patches import get_patch_image_loaders
from ..models.losses import label_smoothing_bce_loss
from ..models.resnet_lstm import au_patch_classifier_apply, au_patch_classifier_init
from ..train import PlateauScheduler, TrainLoop, TrainState, make_optimizer
from ..train.steps import make_eval_step, make_train_step

TRAIN_TEMP = 7.0  # train_au_patch.py:253
EVAL_TEMP = 2.0  # train_au_patch.py:289


@dataclasses.dataclass
class Config:
    """train_au_patch configuration (defaults = reference values)."""

    data_root: str = "Dataset/AU_Files/fakeavceleb_whole_image_patches"
    # metadata label/split sources (D6 contract, /root/reference/
    # train_au_patch.py:186-196,365-375): csv or LAV-DF json; without either
    # the flat {data_root}/{split} filename-prefix trees are used
    mode: str = "fakeavceleb"
    csv_path: Optional[str] = None
    lavdf_json: Optional[str] = None
    include_unmatched_real: bool = False
    unmatched_split_seed: int = 42
    num_workers: int = 0
    checkpoint_dir: str = "Checkpoints"
    bundle_name: str = "best_au_patch_model.npz"
    hidden_dim: int = 128
    lstm_hidden: int = 128
    batch_size: int = 2
    image_size: int = 128
    max_frames: int = 60
    max_aus: int = 17
    label_smoothing: float = 0.1
    lr: float = 1e-4
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    epochs: int = 100
    early_stop_patience: int = 5
    plateau_factor: float = 0.5
    plateau_patience: int = 4
    augment_train: bool = True
    augment_eval: bool = True
    augment_test: bool = False
    seed: int = 0
    compute_dtype: str = "bfloat16"
    buckets: Tuple[int, ...] = ()
    mask_padding: bool = True
    jsonl_log: Optional[str] = None  # structured per-epoch JSONL metrics
    tracker: Optional[str] = None  # extra sinks: 'tensorboard:<dir>' and/or 'wandb:<project>'
    ckpt_backend: str = "npz"  # 'npz' | 'orbax' (versioned, preemption-safe)
    resume: Optional[str] = None  # npz path, or 'auto' with ckpt_backend=orbax
    save_resume_state: bool = True


class _LoopLoader:
    """Regroup D6's (patches, weights, labels, lengths) into the TrainLoop's
    ((inputs...), labels, lengths) batch contract."""

    def __init__(self, loader):
        self.loader = loader
        self.dataset = loader.dataset

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for patches, weights, labels, lengths in self.loader:
            yield (patches, weights), labels, lengths


def build(config: Config):
    cdtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    train_l, test_l, eval_l = get_patch_image_loaders(
        config.data_root,
        mode=config.mode,
        csv_path=config.csv_path,
        lavdf_json=config.lavdf_json,
        include_unmatched_real=config.include_unmatched_real,
        unmatched_split_seed=config.unmatched_split_seed,
        num_workers=config.num_workers,
        batch_size=config.batch_size,
        image_size=config.image_size,
        max_frames=config.max_frames,
        max_aus=config.max_aus,
        buckets=config.buckets or None,
        augment_train=config.augment_train,
        augment_eval=config.augment_eval,
        augment_test=config.augment_test,
        seed=config.seed,
    )

    params, bn_state = au_patch_classifier_init(
        jax.random.PRNGKey(config.seed), hidden_dim=config.hidden_dim, lstm_hidden=config.lstm_hidden
    )
    tx = make_optimizer("adam", config.lr, weight_decay=config.weight_decay, grad_clip=config.grad_clip)
    state = TrainState(jnp.zeros((), jnp.int32), params, bn_state, tx.init(params))

    def _forward(params, bn_state, batch, train, temp):
        (patches, weights), labels, lengths = batch
        logits, new_bn = au_patch_classifier_apply(
            params,
            bn_state,
            patches,
            weights,
            lengths=lengths, mask_padding=config.mask_padding,
            train=train,
            compute_dtype=cdtype,
        )
        logits = logits[:, 0]
        w = (lengths > 0).astype(jnp.float32)
        loss = label_smoothing_bce_loss(logits, labels, config.label_smoothing, sample_weight=w)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32) / temp)
        return loss, new_bn, probs

    def train_forward(params, bn_state, rng, batch):
        loss, new_bn, probs = _forward(params, bn_state, batch, True, TRAIN_TEMP)
        return loss, (new_bn, probs)

    def eval_forward(params, bn_state, batch):
        loss, _, probs = _forward(params, bn_state, batch, False, EVAL_TEMP)
        return loss, probs

    raw_train = make_train_step(train_forward, tx)
    raw_eval = make_eval_step(eval_forward)
    train_step = lambda state, batch, rng_seed, epoch: raw_train(state, batch, rng_seed, ())
    eval_step = raw_eval
    return _LoopLoader(train_l), _LoopLoader(eval_l), _LoopLoader(test_l), state, train_step, eval_step


def main(argv=None, *, log=print):
    config = parse_config(Config, argv, prog="train_au_patch")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    train_loader, eval_loader, _test_loader, state, train_step, eval_step = build(config)

    os.makedirs(config.checkpoint_dir, exist_ok=True)
    best_path = os.path.join(config.checkpoint_dir, config.bundle_name)
    resume_path = os.path.join(config.checkpoint_dir, "train_au_patch_state.npz")
    orbax_mgr = None
    if config.ckpt_backend == "orbax":
        from ..core.orbax_ckpt import OrbaxStateManager

        orbax_mgr = OrbaxStateManager(os.path.join(config.checkpoint_dir, "train_au_patch_orbax"))

    if config.resume:
        if orbax_mgr is not None and config.resume == "auto":
            restored = orbax_mgr.restore_latest(like=state)
            if restored is not None:
                state = restored
                log(f"resumed from orbax step {orbax_mgr.latest_step()}")
        else:
            state = load_state(config.resume, like=state)
            log(f"resumed train state from {config.resume} (step {int(state.step)})")

    def on_best(state, result):
        save_bundle(best_path, {"model": state.params, "state": state.bn_state})
        log(f"model saved -> {best_path}")

    specs = []
    if config.jsonl_log:
        specs.append(f"jsonl:{config.jsonl_log}")
    if config.tracker:
        specs.append(config.tracker)
    from ..utils.metric_logger import make_metric_logger

    jsonl = make_metric_logger(specs, run_name="train_au_patch", config=config)

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
        early_stop_patience=config.early_stop_patience,
        plateau=PlateauScheduler(config.lr, factor=config.plateau_factor, patience=config.plateau_patience),
        best_policy="loss",
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
