"""Batch scoring CLI over the serving engines (production inference path).

The reference stops at eval scripts wired to labeled datasets; this entry
point scores ARBITRARY media with any of the four engines and streams
``{"path": ..., "score": ...}`` JSONL — the deployment-shaped surface on top
of models/serve.py (BN-folded + Pallas backbone, on-device preprocessing,
bucket dispatch, optional mesh sharding).

    python -m multimodal_deepfake_detection_tpu.cli.serve \
        --engine visual --ckpt_path best.npz --input clips/ --output scores.jsonl

Checkpoint-free deployment: ``--artifact prog_T25.jaxprog,prog_T50.jaxprog``
(or a directory of ``.jaxprog`` files) scores through AOT-exported programs
(cli/export_serving.py) instead — weights, quantization and preprocessing
baked in, one artifact per serving bucket (models/artifact.py).

Inputs per engine:
  visual   — ``.npy`` uint8 frame stacks (T, H, W, 3) and/or video files
             (mp4/avi/mov/mkv; decoded by the native engines, cv2 fallback)
  audio    — ``.npy`` float waveforms or MFCC-ready (T, 13) arrays, ``.wav``
  au_patch — ``.npy`` patch stacks (T, A, h, w, 3) with optional
             ``*_weights.npy`` siblings
  au_face  — paired face/AU trees (``--au_input`` for the patch root)
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Tuple

import numpy as np

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


@dataclasses.dataclass
class Config:
    engine: str = "visual"  # visual | audio | au_face | au_patch | av
    ckpt_path: str = "Checkpoints/XceptionLSTMV_ArcFace_Best.npz"
    input: str = "clips"
    au_input: Optional[str] = None  # au_face: AU patch root paired by stem
    audio_input: Optional[str] = None  # av: wav/waveform-npy root paired by stem
    audio_ckpt_path: str = ""  # av: audio bundle (ckpt_path = visual bundle)
    av_alpha: float = 0.5  # av: fused = alpha*p_visual + (1-alpha)*p_audio
    output: Optional[str] = None  # JSONL path; default stdout
    batch_size: int = 8
    max_frames: int = 50
    frame_size: int = 0  # resize decoded video frames; 0 = native
    hidden_dim: int = 128  # visual head width (audio uses audio_hidden)
    audio_hidden: int = 512
    num_aus: int = 17
    lstm_hidden: int = 256  # au_face
    patch_hidden: int = 128  # au_patch hidden_dim
    patch_lstm_hidden: int = 128
    buckets: Tuple[int, ...] = (25, 50, 75)
    sample_buckets: Tuple[int, ...] = (16000, 48000, 160000)
    compute_dtype: str = "bfloat16"
    mask_padding: bool = True
    use_mesh: bool = False  # shard scoring batches over all visible devices
    threshold: float = 0.5  # label = score > threshold in the JSONL
    # w8a8 int8 backbone(s) ("" = fp). All four engines: "w8a8" quantizes
    # every backbone conv incl. depthwise (visual engine measured +5.8%
    # throughput at feature cos 0.9999, PERF.md r3); visual also accepts
    # "w8a8-hybrid" (bf16 Pallas pos middle flow) and "w8a8-pallas"
    # (int8-pointwise Pallas pos middle kernel). Calibrates on the first
    # scored batch.
    quantize: str = ""
    # Serve from AOT artifacts instead of a checkpoint: comma-separated
    # .jaxprog paths and/or directories of them (cli/export_serving.py), one
    # per serving bucket. Checkpoint-free and model-code-free; weights,
    # quantization and preprocessing are baked at export time, so
    # --ckpt_path/--quantize/--use_mesh and the model-width flags are unused.
    artifact: str = ""


def _list_inputs(folder: str, exts) -> List[str]:
    out = []
    for dirpath, _dirs, files in sorted(os.walk(folder)):
        for f in sorted(files):
            if f.lower().endswith(exts) and not f.endswith("_weights.npy"):
                out.append(os.path.join(dirpath, f))
    return out


def _load_visual_item(path: str, cfg: Config) -> np.ndarray:
    """-> (T, H, W, 3) uint8."""
    if path.endswith(".npy"):
        arr = np.load(path)[: cfg.max_frames]
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8) if arr.max() <= 1.5 else arr.astype(np.uint8)
        return arr
    from ..data.native_video import decode_video

    size = (cfg.frame_size, cfg.frame_size) if cfg.frame_size else None
    arr = decode_video(path, size=size, max_frames=cfg.max_frames)
    if arr is None:  # cv2 fallback
        import cv2

        cap = cv2.VideoCapture(path)
        frames = []
        try:
            while len(frames) < cfg.max_frames:
                ok, frame = cap.read()
                if not ok:
                    break
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                if cfg.frame_size:
                    frame = cv2.resize(frame, (cfg.frame_size, cfg.frame_size))
                frames.append(frame)
        finally:
            cap.release()
        if not frames:
            raise ValueError(f"no frames decoded from {path}")
        return np.stack(frames)
    return (np.clip(arr, 0, 1) * 255).astype(np.uint8)


def _load_waveform(path: str) -> np.ndarray:
    """.wav (int PCM normalized) or .npy -> (samples,) float32."""
    if path.endswith(".wav"):
        from scipy.io import wavfile

        _sr, wav = wavfile.read(path)
        wav = wav.astype(np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        if np.abs(wav).max() > 1.5:
            wav = wav / 32768.0
        return wav
    return np.load(path).astype(np.float32).ravel()


def _pad_stack(items: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad ragged leading dims to the batch max; returns (batch, lengths)."""
    T = max(a.shape[0] for a in items)
    out = np.zeros((len(items), T) + items[0].shape[1:], items[0].dtype)
    lengths = np.zeros((len(items),), np.int32)
    for i, a in enumerate(items):
        out[i, : a.shape[0]] = a
        lengths[i] = a.shape[0]
    return out, lengths


def _build_engine(cfg: Config, mesh):
    import jax.numpy as jnp

    from ..models import serve as S

    if cfg.artifact:
        if cfg.quantize:
            raise ValueError("--quantize is baked at export time; drop it with --artifact")
        if mesh is not None:
            raise ValueError("--use_mesh is not supported with --artifact "
                             "(export per-shard programs instead)")
        from ..models.artifact import load_artifact_scorer

        return load_artifact_scorer(
            [p.strip() for p in cfg.artifact.split(",") if p.strip()],
            engine=cfg.engine,
        )
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    common = dict(compute_dtype=cdtype, mesh=mesh, quantize=cfg.quantize or None)
    if cfg.engine == "visual":
        return S.VisualScorer.from_bundle(
            cfg.ckpt_path, hidden_dim=cfg.hidden_dim,
            buckets=cfg.buckets or None, mask_padding=cfg.mask_padding, **common,
        )
    if cfg.engine == "audio":
        return S.AudioScorer.from_bundle(
            cfg.ckpt_path, hidden_dim=cfg.audio_hidden,
            sample_buckets=cfg.sample_buckets or None, mask_padding=cfg.mask_padding, **common,
        )
    if cfg.engine == "au_face":
        return S.AUFaceScorer.from_bundle(
            cfg.ckpt_path, num_aus=cfg.num_aus, lstm_hidden=cfg.lstm_hidden,
            buckets=cfg.buckets or None, **common,
        )
    if cfg.engine == "au_patch":
        return S.AUPatchScorer.from_bundle(
            cfg.ckpt_path, hidden_dim=cfg.patch_hidden, lstm_hidden=cfg.patch_lstm_hidden,
            buckets=cfg.buckets or None, mask_padding=cfg.mask_padding, **common,
        )
    if cfg.engine == "av":
        if not cfg.audio_ckpt_path:
            raise ValueError("engine av needs --audio_ckpt_path (ckpt_path = visual bundle)")
        return S.AVScorer(
            S.VisualScorer.from_bundle(
                cfg.ckpt_path, hidden_dim=cfg.hidden_dim,
                buckets=cfg.buckets or None, mask_padding=cfg.mask_padding, **common,
            ),
            S.AudioScorer.from_bundle(
                cfg.audio_ckpt_path, hidden_dim=cfg.audio_hidden,
                sample_buckets=cfg.sample_buckets or None,
                mask_padding=cfg.mask_padding, **common,
            ),
            alpha=cfg.av_alpha,
        )
    raise ValueError(f"unknown engine {cfg.engine!r}")


def _iter_batches(paths: List[str], n: int):
    for i in range(0, len(paths), n):
        yield paths[i : i + n]


def main(argv=None, *, log=print):
    from ..core.config import parse_config

    cfg = parse_config(Config, argv, prog="serve")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    mesh = None
    if cfg.use_mesh:
        from ..parallel import auto_data_mesh

        mesh = auto_data_mesh(cfg.batch_size)
    engine = _build_engine(cfg, mesh)

    if cfg.engine == "av" and not cfg.audio_input:
        # validated up front — inside the scoring loop a missing flag would
        # surface only on the first chunk (or never, on an empty input dir)
        raise ValueError("--audio_input (wav/npy root) required for av")
    if cfg.engine == "au_face" and not cfg.au_input:
        raise ValueError("--au_input (AU patch root) required for au_face")
    if cfg.engine in ("visual", "av"):
        paths = _list_inputs(cfg.input, (".npy",) + VIDEO_EXTS)
    elif cfg.engine == "audio":
        paths = _list_inputs(cfg.input, (".npy", ".wav"))
    else:
        paths = _list_inputs(cfg.input, (".npy",))
    if not paths:
        raise FileNotFoundError(f"no scoreable inputs under {cfg.input}")
    log(f"[serve] {cfg.engine}: {len(paths)} inputs, batch {cfg.batch_size}")

    sink = open(cfg.output, "w") if cfg.output else None
    emitted = 0
    try:
        for chunk in _iter_batches(paths, cfg.batch_size):
            if cfg.engine == "visual":
                items = [_load_visual_item(p, cfg) for p in chunk]
                batch, lengths = _pad_stack(items)
                scores = engine.score(batch, lengths)
            elif cfg.engine == "audio":
                batch, _lengths = _pad_stack([_load_waveform(p) for p in chunk])
                scores = engine.score(batch)
            elif cfg.engine == "av":  # paired visual + audio by stem
                items, waves = [], []
                for p in chunk:
                    stem = os.path.splitext(os.path.basename(p))[0]
                    for ext in (".wav", ".npy"):
                        ap = os.path.join(cfg.audio_input, stem + ext)
                        if os.path.exists(ap):
                            break
                    else:
                        raise FileNotFoundError(f"no audio for {stem} under {cfg.audio_input}")
                    items.append(_load_visual_item(p, cfg))
                    waves.append(_load_waveform(ap))
                batch, lengths = _pad_stack(items)
                wbatch, _wl = _pad_stack(waves)
                scores = engine.score(batch, wbatch, lengths)
            elif cfg.engine == "au_patch":
                items, weights = [], []
                for p in chunk:
                    arr = np.load(p)[: cfg.max_frames]
                    if arr.dtype != np.uint8:
                        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
                    items.append(arr)
                    wp = p[:-4] + "_weights.npy"
                    w = (
                        np.load(wp).astype(np.float32)[: cfg.max_frames]
                        if os.path.exists(wp)
                        else np.ones(arr.shape[:2], np.float32)
                    )
                    weights.append(w)
                batch, lengths = _pad_stack(items)
                wbatch, _ = _pad_stack(weights)
                scores = engine.score(batch, wbatch, lengths)
            else:  # au_face: pair video npys with AU patch npys by stem
                vids, aus = [], []
                for p in chunk:
                    stem = os.path.splitext(os.path.basename(p))[0]
                    ap = os.path.join(cfg.au_input, stem + ".npy")
                    if not os.path.exists(ap):
                        raise FileNotFoundError(f"no AU patches for {stem} under {cfg.au_input}")
                    v = np.load(p)[: cfg.max_frames]
                    a = np.load(ap)[: cfg.max_frames, : cfg.num_aus]
                    to_u8 = lambda x: x.astype(np.uint8) if x.dtype == np.uint8 else (np.clip(x, 0, 1) * 255).astype(np.uint8)
                    vids.append(to_u8(v))
                    aus.append(to_u8(a))
                vbatch, _ = _pad_stack(vids)
                abatch, alen = _pad_stack(aus)
                mask = (np.arange(abatch.shape[1])[None, :] < alen[:, None]).astype(np.float32)
                mask = np.repeat(mask[:, :, None], abatch.shape[2], axis=2)
                scores = engine.score(vbatch, abatch, au_mask=mask)
            for p, s in zip(chunk, np.asarray(scores).tolist()):
                rec = {"path": p, "score": round(float(s), 6), "fake": bool(s > cfg.threshold)}
                line = json.dumps(rec)
                if sink:
                    sink.write(line + "\n")
                else:
                    log(line)
                emitted += 1
    finally:
        if sink:
            sink.close()
    log(f"[serve] scored {emitted} inputs" + (f" -> {cfg.output}" if cfg.output else ""))
    return emitted


if __name__ == "__main__":
    main()
