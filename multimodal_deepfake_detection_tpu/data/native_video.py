"""ctypes bindings for the native (C++) MJPEG-AVI decode engine.

``native/video_decode.cc`` parses the AVI RIFF container, decodes MJPEG
frames with libjpeg in a GIL-free thread pool, and fuses decode -> bilinear
resize -> RGB float32/255 into one pass writing straight into the batch
buffer — replacing the reference's four-pass cv2 Python loop
(``/root/reference/video_dataloader_enhanced.py`` raw-video branch; mirrored
by ``data/video_enhanced.py::_decode_video``).

The wrapper builds the library on first use (g++, cached). ``decode_video``
returns None for anything the engine can't handle (non-AVI container,
non-MJPEG codec, missing toolchain) so callers fall back to cv2.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LIB_FAILED = False
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)


def _load_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None:
        return _LIB
    if _LIB_FAILED:
        raise ImportError("native video decode engine unavailable")
    so_path = os.path.join(_NATIVE_DIR, "libvideo_decode.so")
    src = os.path.join(_NATIVE_DIR, "video_decode.cc")
    try:
        if not os.path.exists(so_path) or (
            os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so_path)
        ):
            subprocess.run(
                ["sh", os.path.join(_NATIVE_DIR, "build.sh")], check=True, capture_output=True
            )
        lib = ctypes.CDLL(so_path)
    except Exception as e:  # toolchain or load failure -> permanent fallback
        _LIB_FAILED = True
        raise ImportError(f"native video decode engine unavailable: {e}") from e
    lib.vd_open.restype = ctypes.c_void_p
    lib.vd_open.argtypes = [ctypes.c_char_p]
    lib.vd_frame_count.restype = ctypes.c_int64
    lib.vd_frame_count.argtypes = [ctypes.c_void_p]
    lib.vd_width.restype = ctypes.c_int32
    lib.vd_width.argtypes = [ctypes.c_void_p]
    lib.vd_height.restype = ctypes.c_int32
    lib.vd_height.argtypes = [ctypes.c_void_p]
    lib.vd_decode_f32.restype = ctypes.c_int64
    lib.vd_decode_f32.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.vd_close.restype = None
    lib.vd_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_video_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


def probe(path: str) -> Optional[Tuple[int, int, int]]:
    """(frames, height, width) if the engine can open the file, else None."""
    try:
        lib = _load_lib()
    except Exception:
        return None
    h = lib.vd_open(path.encode())
    if not h:
        return None
    try:
        return int(lib.vd_frame_count(h)), int(lib.vd_height(h)), int(lib.vd_width(h))
    finally:
        lib.vd_close(h)


def decode_video(
    path: str,
    *,
    size: Optional[Tuple[int, int]] = None,
    max_frames: Optional[int] = None,
    threads: int = 4,
) -> Optional[np.ndarray]:
    """Decode an MJPEG AVI to (T, H, W, 3) float32 RGB in [0, 1].

    ``size`` is (width, height) like cv2.resize; None keeps the stream size.
    Returns None when the file/codec isn't supported (caller falls back to
    cv2) or no frame decodes.
    """
    try:
        lib = _load_lib()
    except Exception:
        return None
    h = lib.vd_open(path.encode())
    if not h:
        return None
    try:
        n = int(lib.vd_frame_count(h))
        if max_frames is not None:
            n = min(n, int(max_frames))
        if n == 0:
            return None
        if size is None:
            out_w, out_h = int(lib.vd_width(h)), int(lib.vd_height(h))
        else:
            out_w, out_h = int(size[0]), int(size[1])
        if out_w <= 0 or out_h <= 0:
            return None
        out = np.empty((n, out_h, out_w, 3), np.float32)
        got = lib.vd_decode_f32(
            h, 0, n, out_w, out_h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), int(threads),
        )
        if got <= 0:
            return None
        return out
    finally:
        lib.vd_close(h)
