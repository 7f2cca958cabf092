"""Offline face/frame preprocessing CLI (UADFV + FakeAVCeleb modes).

Replaces ``python UADFV_face_dataset.py`` / ``python
FakeAVCeleb_face_dataset.py`` (reference layer L0). Expects the raw layout
documented by ``/root/reference/folder_structure.php``:
``dataset_root/{fake,real}/...``; emits the npy trees the dataloaders consume.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

from ..core.config import parse_config
from ..data.preprocess import process_fakeavceleb_frames, process_uadfv_faces


@dataclasses.dataclass
class Config:
    dataset_root: str = "dataset"
    out_root: str = "processed"
    mode: str = "uadfv"  # 'uadfv' (face crops) | 'fakeavceleb' (full frames)
    detector: str = "center"  # 'center' | 'none' | 'yunet'
    detector_model: Optional[str] = None  # ONNX path for yunet
    margin: int = 20
    size: int = 256
    max_frames: int = 300  # fakeavceleb cap
    seed: int = 0


def main(argv=None, *, log=print):
    config = parse_config(Config, argv, prog="preprocess_faces")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    if config.mode == "uadfv":
        written = process_uadfv_faces(
            config.dataset_root,
            config.out_root,
            detector=config.detector,
            detector_model=config.detector_model,
            margin=config.margin,
            size=config.size,
            log=log,
        )
    elif config.mode == "fakeavceleb":
        written = process_fakeavceleb_frames(
            config.dataset_root,
            config.out_root,
            size=config.size,
            max_frames=config.max_frames,
            seed=config.seed,
            log=log,
        )
    else:
        raise ValueError(f"unknown mode {config.mode!r}")
    log(f"wrote {len(written)} items -> {config.out_root}")
    return written


if __name__ == "__main__":
    main()
