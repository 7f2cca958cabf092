"""Frozen-backbone feature caching: measured epoch-time lever (VERDICT r4 #4).

The reference's train_audio keeps the Xception backbone frozen for all 100
epochs yet re-runs its forward on every clip every epoch
(/root/reference/train_audio.py:29-44 + XceptionLSTMA.py:11-12).
``--cache_features`` runs ONE eval-BN backbone pass per batch composition and
trains the LSTM/MLP head on cached 2048-d features afterwards. This harness
measures the actual epoch wall-time on the live backend for three configs:

  ref      — reference semantics (frozen params, train-mode BN, no cache)
  bn_eval  — quality mode (frozen params, eval-BN backbone, no cache):
             isolates the BN-mode cost from the caching win
  cached   — --cache_features (epoch 1 builds the cache, later epochs replay)

Prints one JSON line. Wall-times here include this environment's relay
per-call floor (~30 ms), so the speedup is a LOWER bound on real hardware
(where the uncached backbone forward dominates even more).

Usage (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/cachebench.py \
        [--clips 96] [--epochs 4] [--batch 8] [--hidden 512]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root, n_clips, T=120):
    rng = np.random.default_rng(0)
    for split in ("train", "eval"):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n_clips if split == "train" else max(4, n_clips // 8)):
            label = "fake" if i % 2 else "real"
            np.save(os.path.join(d, f"{label}_{i}.npy"),
                    rng.normal(0, 1, (T, 13)).astype(np.float32))


def run_config(tree, label, extra, epochs, batch, hidden):
    from multimodal_deepfake_detection_tpu.cli import train_audio

    config = train_audio.Config(
        train_folder=f"{tree}/train",
        eval_folder=f"{tree}/eval",
        checkpoint_dir=os.path.join(tree, f"ckpt_{label}"),
        hidden_dim=hidden,
        batch_size=batch,
        epochs=1,
        buckets=(120,),
        **extra,
    )
    train_loader, _, state, train_step, _ = train_audio.build(config)
    times = []
    for epoch in range(epochs):
        t0 = time.monotonic()
        for i, (x, labels, lengths) in enumerate(train_loader):
            state, loss, _ = train_step(state, (x, labels, lengths), epoch * 1000 + i, epoch)
        float(loss)  # force completion
        times.append(round(time.monotonic() - t0, 3))
    steady = min(times[1:]) if len(times) > 1 else times[0]
    print(f"  {label:8s} epochs_s={times}  steady={steady:.3f}s", flush=True)
    return {"epoch_times_s": times, "steady_epoch_s": steady}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print("backend:", jax.devices()[0].platform, flush=True)
    tree = tempfile.mkdtemp(prefix="cachebench_")
    make_dataset(tree, args.clips)

    rec = {"clips": args.clips, "batch": args.batch, "hidden": args.hidden,
           "backend": jax.devices()[0].platform}
    rec["ref"] = run_config(tree, "ref", {}, args.epochs, args.batch, args.hidden)
    rec["bn_eval"] = run_config(tree, "bn_eval", {"backbone_bn_eval": True},
                                args.epochs, args.batch, args.hidden)
    rec["cached"] = run_config(tree, "cached", {"cache_features": True},
                               args.epochs, args.batch, args.hidden)
    rec["speedup_steady_vs_ref"] = round(
        rec["ref"]["steady_epoch_s"] / rec["cached"]["steady_epoch_s"], 2)
    rec["speedup_steady_vs_bn_eval"] = round(
        rec["bn_eval"]["steady_epoch_s"] / rec["cached"]["steady_epoch_s"], 2)
    print(json.dumps(rec))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
