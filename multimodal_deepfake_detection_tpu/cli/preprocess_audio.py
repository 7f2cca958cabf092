"""Offline audio MFCC preprocessing CLI.

Replaces ``python wavfake_audio_dataset.py`` (reference layer L0): walks
``dataset_root/{fake,real}/``, extracts 16 kHz mono audio (.wav directly;
video tracks via ffmpeg when present), computes MFCC(n=13, 25 ms / 10 ms)
with the on-device frontend (``ops/mfcc.py``), splits 120/24/24 frames, and
saves ``{label}_*.npy`` per clip.
"""
from __future__ import annotations

import dataclasses

from ..core.config import parse_config
from ..data.preprocess import process_audio_mfcc


@dataclasses.dataclass
class Config:
    dataset_root: str = "dataset"
    out_root: str = "processed_audio"
    sr: int = 16000
    n_mfcc: int = 13
    n_fft: int = 400
    hop_length: int = 160
    train_frames: int = 120
    eval_frames: int = 24
    test_frames: int = 24


def main(argv=None, *, log=print):
    config = parse_config(Config, argv, prog="preprocess_audio")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    written = process_audio_mfcc(
        config.dataset_root,
        config.out_root,
        sr=config.sr,
        n_mfcc=config.n_mfcc,
        n_fft=config.n_fft,
        hop_length=config.hop_length,
        splits=(
            ("train", config.train_frames),
            ("eval", config.eval_frames),
            ("test", config.test_frames),
        ),
        log=log,
    )
    log(f"wrote {len(written)} clips -> {config.out_root}")
    return written


if __name__ == "__main__":
    main()
