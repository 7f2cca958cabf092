"""Export a serving engine's scoring program to a portable AOT artifact.

Writes a serialized StableHLO program (``jax.export``) with the engine's
weights captured as constants and the on-device preprocessing fused in —
deployable on any jax host (no model code or checkpoints at serve time),
lowered for the requested platforms. The batch dimension is symbolic (one
artifact serves any B); the length axes are static — export one artifact
per serving bucket, mirroring models/serve.py's bucket-dispatch strategy.
Beyond-parity capability: the torch reference re-instantiates nn.Modules
from source for every eval run.

    python -m multimodal_deepfake_detection_tpu.cli.export_serving \
        --engine visual --ckpt_path best.npz --frames 50 --size 256 \
        --platforms tpu --out visual_T50.jaxprog

Replay:
    from multimodal_deepfake_detection_tpu.models.export import load_exported
    prog = load_exported(open("visual_T50.jaxprog", "rb").read())
    probs = prog.call(frames_u8, lengths)

With ``--quantize`` and ``--calib_npy`` (a representative input batch), the
artifact bakes the w8a8 backbone (int8 weights + calibrated scales);
``--refine_passes N`` additionally applies the closed-form per-channel affine
refinement on the calibration batch (visual/audio/au_patch engines),
shrinking PTQ's error at zero serving cost before the weights are frozen
into the artifact.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class Config:
    engine: str = "visual"  # visual | audio | au_face | au_patch | av
    ckpt_path: str = "Checkpoints/XceptionLSTMV_ArcFace_Best.npz"
    audio_ckpt_path: str = ""  # av: the audio bundle (ckpt_path = visual)
    av_alpha: float = 0.5  # av: fused score = alpha*visual + (1-alpha)*audio
    out: str = "scoring_program.jaxprog"
    # static length axes of the exported program (one artifact per bucket)
    frames: int = 50  # visual/au_face T
    size: int = 256  # visual frame H=W
    num_samples: int = 48000  # audio waveform length
    au_frames: int = 50  # au_face Ta / au_patch T
    num_aus: int = 17
    patch_size: int = 32  # au_face/au_patch patch h=w
    # model widths (as in cli/serve.py)
    hidden_dim: int = 128
    audio_hidden: int = 512
    lstm_hidden: int = 256
    patch_hidden: int = 128
    patch_lstm_hidden: int = 128
    compute_dtype: str = "bfloat16"
    mask_padding: bool = True
    batch: str = "b"  # symbolic batch dim name; an int string bakes it static
    platforms: Tuple[str, ...] = ()  # e.g. ("tpu",) or ("cpu","tpu"); () = current
    quantize: str = ""  # "" | w8a8 | w8a8-hybrid | w8a8-pallas (visual; others w8a8)
    calib_npy: str = ""  # representative batch for --quantize calibration
    refine_passes: int = 0  # >0: affine PTQ refinement on the calib batch (visual/audio/au_patch)


def main(argv=None, *, log=print):
    from ..core.config import parse_config

    cfg = parse_config(Config, argv, prog="export_serving")
    import numpy as np

    import jax.numpy as jnp

    from ..models import export as E
    from ..models import serve as S

    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    platforms = list(cfg.platforms) or None
    batch = int(cfg.batch) if cfg.batch.isdigit() else cfg.batch
    common = dict(compute_dtype=cdtype, quantize=cfg.quantize or None)

    calib = np.load(cfg.calib_npy) if cfg.calib_npy else None
    if cfg.quantize and calib is None:
        raise ValueError("--quantize requires --calib_npy (a representative input batch)")
    if cfg.refine_passes and cfg.engine not in ("visual", "audio", "au_patch"):
        raise ValueError(
            "--refine_passes needs a single-input calibratable engine (visual/audio/au_patch)"
        )
    if cfg.refine_passes and not cfg.quantize:
        raise ValueError("--refine_passes refines a quantized backbone; set --quantize too")
    refine = dict(refine_passes=cfg.refine_passes)

    if cfg.engine == "visual":
        scorer = S.VisualScorer.from_bundle(
            cfg.ckpt_path, hidden_dim=cfg.hidden_dim,
            mask_padding=cfg.mask_padding, **common,
        )
        if calib is not None:
            scorer.calibrate(calib, **refine)
        blob = E.export_visual(
            scorer, T=cfg.frames, H=cfg.size, W=cfg.size, batch=batch, platforms=platforms
        )
    elif cfg.engine == "audio":
        scorer = S.AudioScorer.from_bundle(
            cfg.ckpt_path, hidden_dim=cfg.audio_hidden,
            mask_padding=cfg.mask_padding, **common,
        )
        if calib is not None:
            scorer.calibrate(calib, **refine)
        blob = E.export_audio(scorer, cfg.num_samples, batch=batch, platforms=platforms)
    elif cfg.engine == "au_face":
        scorer = S.AUFaceScorer.from_bundle(
            cfg.ckpt_path, num_aus=cfg.num_aus, lstm_hidden=cfg.lstm_hidden,
            mask_padding=cfg.mask_padding, **common,
        )
        if calib is not None:
            raise ValueError("au_face export: calibrate via the Python API (two inputs)")
        blob = E.export_au_face(
            scorer, T=cfg.frames, Ta=cfg.au_frames, A=cfg.num_aus,
            face_hw=(cfg.size, cfg.size), patch_hw=(cfg.patch_size, cfg.patch_size),
            batch=batch, platforms=platforms,
        )
    elif cfg.engine == "av":
        if not cfg.audio_ckpt_path:
            raise ValueError("engine av needs --audio_ckpt_path (ckpt_path = visual bundle)")
        if calib is not None:
            raise ValueError("av export: calibrate the sub-engines via the Python API")
        av = S.AVScorer.from_bundles(
            cfg.ckpt_path, cfg.audio_ckpt_path, alpha=cfg.av_alpha,
            hidden_dim=cfg.hidden_dim, audio_hidden=cfg.audio_hidden,
            mask_padding=cfg.mask_padding, **common,
        )
        blob = E.export_av(
            av, T=cfg.frames, H=cfg.size, W=cfg.size, num_samples=cfg.num_samples,
            batch=batch, platforms=platforms,
        )
    elif cfg.engine == "au_patch":
        scorer = S.AUPatchScorer.from_bundle(
            cfg.ckpt_path, hidden_dim=cfg.patch_hidden,
            lstm_hidden=cfg.patch_lstm_hidden, mask_padding=cfg.mask_padding, **common,
        )
        if calib is not None:
            scorer.calibrate(calib, **refine)
        blob = E.export_au_patch(
            scorer, T=cfg.au_frames, A=cfg.num_aus,
            patch_hw=(cfg.patch_size, cfg.patch_size), batch=batch, platforms=platforms,
        )
    else:
        raise ValueError(f"unknown engine {cfg.engine!r}")

    with open(cfg.out, "wb") as f:
        f.write(blob)
    log(f"[export_serving] {cfg.engine}: wrote {len(blob) / 1e6:.1f} MB -> {cfg.out}")
    return cfg.out


if __name__ == "__main__":
    main()
