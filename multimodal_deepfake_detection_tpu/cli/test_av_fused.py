"""Fused audio-visual evaluation over paired face + MFCC trees (config 5).

The BASELINE.json capstone: joint XceptionLSTMV + XceptionLSTMA scoring over
FakeAVCeleb-style data, batched and sharded over the device mesh — replacing
the reference's per-clip Python loops (it has no fused AV eval at all; its
modalities are scored by separate scripts). Clips are paired across the two
npy trees by filename stem; the fused score is a convex combination
``alpha * p_visual + (1 - alpha) * p_audio`` (alpha=0.5 default), reported
with the full metric suite alongside each single modality.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.checkpoint import load_bundle, merge_params
from ..core.config import parse_config
from ..data import DataLoader, NpyFolderDataset
from ..data.collate import pad_collate
from ..data.datasets import label_from_filename
from ..metrics import compute_metrics_interp
from ..models.heads import (
    arcface_apply,
    arcface_init,
    xception_lstm_embed,
    xception_lstm_features,
    xception_lstm_head_apply,
    xception_lstm_init,
)
from ..parallel import auto_data_mesh, replicate, shard_batch


@dataclasses.dataclass
class Config:
    video_folder: str = "Dataset/processed/test"
    audio_folder: str = "Dataset/processed_audio/test"
    visual_ckpt: str = "Checkpoints/XceptionLSTMV_ArcFace_Best.npz"
    audio_ckpt: str = "Checkpoints/best_model_audio.npz"
    visual_hidden: int = 128
    audio_hidden: int = 512
    arcface_s: float = 30.0
    alpha: float = 0.5  # fusion weight on the visual stream
    batch_size: int = 4
    max_frames: int = 75
    video_buckets: Tuple[int, ...] = (25, 50, 75)
    audio_buckets: Tuple[int, ...] = (120,)
    compute_dtype: str = "bfloat16"
    mask_padding: bool = True
    save_scores: Optional[str] = None
    seed: int = 0


class PairedAVDataset:
    """Pairs {label}_{id}.npy across a face tree and an MFCC tree by stem."""

    def __init__(self, video_folder: str, audio_folder: str, *, max_frames: Optional[int] = None):
        self.video = NpyFolderDataset(video_folder, kind="video", max_frames=max_frames)
        self.audio = NpyFolderDataset(audio_folder, kind="audio")
        vstems = {os.path.basename(f)[:-4]: i for i, f in enumerate(self.video.files)}
        astems = {os.path.basename(f)[:-4]: i for i, f in enumerate(self.audio.files)}
        self.stems = sorted(set(vstems) & set(astems))
        self._v_idx = [vstems[s] for s in self.stems]
        self._a_idx = [astems[s] for s in self.stems]
        self.all_labels = [label_from_filename(s + ".npy") for s in self.stems]

    def __len__(self):
        return len(self.stems)

    def __getitem__(self, idx: int):
        v, yv = self.video[self._v_idx[idx]]
        a, ya = self.audio[self._a_idx[idx]]
        assert yv == ya
        return v, a, yv


def _av_collate(items, *, video_buckets, audio_buckets, batch_size):
    videos = pad_collate([(v, y) for v, _a, y in items], buckets=video_buckets, batch_size=batch_size)
    audios = pad_collate([(a, y) for _v, a, y in items], buckets=audio_buckets, batch_size=batch_size)
    vb, labels, v_len = videos
    ab, _labels, a_len = audios
    return (vb, ab, a_len), labels, v_len


def build_scorer(config: Config, log=print):
    cdtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    rng = jax.random.PRNGKey(config.seed)
    k1, k2, k3 = jax.random.split(rng, 3)

    v_params, v_bn = xception_lstm_init(k1, config.visual_hidden)
    v_params["arcface"] = arcface_init(k2, config.visual_hidden, 2)
    v_bundle = load_bundle(config.visual_ckpt)
    model = {k: v for k, v in v_params.items() if k != "arcface"}
    model = merge_params(model, v_bundle["model"], strict=True)
    v_params = dict(model, arcface=merge_params(v_params["arcface"], v_bundle["arcface"], strict=True))
    if "state" in v_bundle:
        v_bn = merge_params(v_bn, v_bundle["state"], strict=False)

    a_params, a_bn = xception_lstm_init(k3, config.audio_hidden)
    a_bundle = load_bundle(config.audio_ckpt)
    a_params = merge_params(a_params, a_bundle["model"], strict=True)
    if "state" in a_bundle:
        a_bn = merge_params(a_bn, a_bundle["state"], strict=False)

    mesh = auto_data_mesh(config.batch_size)
    if mesh is not None:
        v_params, v_bn = replicate(mesh, v_params), replicate(mesh, v_bn)
        a_params, a_bn = replicate(mesh, a_params), replicate(mesh, a_bn)
        log(f"sharded AV eval over {mesh.devices.size} devices")

    @jax.jit
    def score(v_params, v_bn, a_params, a_bn, batch):
        (videos, audios, a_len), labels, v_len = batch
        v_feats, _ = xception_lstm_features(v_params, v_bn, videos, mode="video", train=False, compute_dtype=cdtype)
        emb = xception_lstm_embed(
            v_params, v_feats, lengths=v_len, mask_padding=config.mask_padding, compute_dtype=cdtype
        )
        p_v = jax.nn.softmax(arcface_apply(v_params["arcface"], emb, None, s=config.arcface_s), -1)[:, 1]
        a_feats, _ = xception_lstm_features(a_params, a_bn, audios, mode="audio", train=False, compute_dtype=cdtype)
        p_a = xception_lstm_head_apply(
            a_params, a_feats, lengths=a_len, mask_padding=config.mask_padding, compute_dtype=cdtype
        )[:, 0]
        return p_v.astype(jnp.float32), p_a.astype(jnp.float32)

    def score_fn(batch):
        batch = shard_batch(mesh, batch) if mesh is not None else batch
        return score(v_params, v_bn, a_params, a_bn, batch)

    return score_fn


def main(argv=None, *, log=print):
    config = parse_config(Config, argv, prog="test_av_fused")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    ds = PairedAVDataset(config.video_folder, config.audio_folder, max_frames=config.max_frames)
    if len(ds) == 0:
        raise FileNotFoundError("no paired clips between video_folder and audio_folder")
    log(f"paired clips: {len(ds)}")
    loader = DataLoader(
        ds,
        config.batch_size,
        collate=lambda items: _av_collate(
            items,
            video_buckets=config.video_buckets,
            audio_buckets=config.audio_buckets,
            batch_size=config.batch_size,
        ),
    )
    score_fn = build_scorer(config, log)

    pv_all, pa_all, y_all = [], [], []
    for batch, labels, v_len in loader:
        p_v, p_a = score_fn((batch, labels, v_len))
        mask = np.asarray(v_len) > 0
        pv_all.extend(np.asarray(p_v)[mask].tolist())
        pa_all.extend(np.asarray(p_a)[mask].tolist())
        y_all.extend(labels[mask].astype(int).tolist())

    y = np.asarray(y_all)
    p_v, p_a = np.asarray(pv_all), np.asarray(pa_all)
    fused = config.alpha * p_v + (1 - config.alpha) * p_a
    results = {}
    for name, s in (("visual", p_v), ("audio", p_a), ("fused", fused)):
        m = compute_metrics_interp(y, s)
        results[name] = m
        log(f"[{name}] AUC={m['AUC']:.4f} AP={m['AP']:.4f} pAUC={m['pAUC']:.4f} EER={m['EER']:.4f}")
    if config.save_scores:
        os.makedirs(os.path.dirname(os.path.abspath(config.save_scores)), exist_ok=True)
        np.savez(config.save_scores, labels=y, visual=p_v, audio=p_a, fused=fused)
        log(f"saved scores -> {config.save_scores}")
    return results


if __name__ == "__main__":
    main()
