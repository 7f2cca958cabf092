"""ctypes bindings for the native (C++) video decode engines.

Two engines, tried in order by :func:`decode_video`:

* ``native/video_decode.cc`` — MJPEG-AVI fast path: RIFF parse + libjpeg in
  a GIL-free thread pool, fused decode -> bilinear resize -> RGB float32/255.
* ``native/video_decode_av.cc`` — universal engine over the system
  libavformat/libavcodec/libswscale: **H.264 mp4 and every other format the
  real datasets use** (``/root/reference/folder_structure.php:5-18``:
  ``video.mp4``), decode -> sws_scale(RGB24) -> float32/255 fused into the
  batch buffer with libavcodec frame threading.

Both replace the reference's four-pass cv2 Python loop
(``/root/reference/train_visual.py:243-270`` raw-video branch; mirrored by
``data/video_enhanced.py::_decode_video``). The wrapper builds the libraries
on first use (g++, cached). ``decode_video`` returns None for anything no
engine can handle so callers fall back to cv2.
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


_AV_LIB = None
_AV_LIB_FAILED = False


def _load_av_lib():
    """The libav universal engine (built only when libav*-dev exists)."""
    global _AV_LIB, _AV_LIB_FAILED
    if _AV_LIB is not None:
        return _AV_LIB
    if _AV_LIB_FAILED:
        raise ImportError("native libav decode engine unavailable")
    so_path = os.path.join(_NATIVE_DIR, "libvideo_decode_av.so")
    src = os.path.join(_NATIVE_DIR, "video_decode_av.cc")
    try:
        if not os.path.exists(so_path) or (
            os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so_path)
        ):
            subprocess.run(
                ["sh", os.path.join(_NATIVE_DIR, "build.sh")], check=True, capture_output=True
            )
        lib = ctypes.CDLL(so_path)
    except Exception as e:
        _AV_LIB_FAILED = True
        raise ImportError(f"native libav decode engine unavailable: {e}") from e
    lib.vdav_probe.restype = ctypes.c_int64
    lib.vdav_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vdav_decode_f32.restype = ctypes.c_int64
    lib.vdav_decode_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.vdav_encode_test.restype = ctypes.c_int64
    lib.vdav_encode_test.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_char_p,
    ]
    _AV_LIB = lib
    return lib


def encode_test_video(path: str, frames_u8: np.ndarray, *, codec: str = "libx264") -> int:
    """Author an H.264 (or named-codec) mp4 from (T, H, W, 3) uint8 RGB.

    Test/bench helper: the image's cv2 ships no H.264 encoder, the system
    libavcodec does. Returns packets written (<= 0 on failure)."""
    lib = _load_av_lib()
    arr = np.ascontiguousarray(frames_u8, np.uint8)
    T, H, W = arr.shape[:3]
    return int(
        lib.vdav_encode_test(
            path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            T, W, H, codec.encode(),
        )
    )


def native_video_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        try:
            _load_av_lib()
            return True
        except Exception:
            return False


def decode_video_av(
    path: str,
    *,
    size: Optional[Tuple[int, int]] = None,
    max_frames: Optional[int] = None,
    threads: int = 0,
) -> Optional[np.ndarray]:
    """Decode any libav-supported video (H.264 mp4, ...) to (T, H, W, 3)
    float32 RGB in [0, 1]. ``size`` is (width, height); None keeps stream
    size. Returns None on failure (caller falls back)."""
    try:
        lib = _load_av_lib()
    except Exception:
        return None
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    est = lib.vdav_probe(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if est < 0:
        return None
    cap = int(max_frames) if max_frames is not None else (int(est) if est > 0 else 100_000)
    if cap <= 0:
        return None
    if size is None:
        out_w, out_h = int(w.value), int(h.value)
    else:
        out_w, out_h = int(size[0]), int(size[1])
    if out_w <= 0 or out_h <= 0:
        return None
    out = np.empty((cap, out_h, out_w, 3), np.float32)
    got = lib.vdav_decode_f32(
        path.encode(), cap, out_w, out_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), int(threads),
    )
    if got <= 0:
        return None
    return out[: int(got)]


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
    """Decode a video to (T, H, W, 3) float32 RGB in [0, 1].

    Tries the MJPEG-AVI fast path first, then the libav universal engine
    (H.264 mp4 etc.). ``size`` is (width, height) like cv2.resize; None keeps
    the stream size. Returns None when no engine supports the file (caller
    falls back to cv2) or no frame decodes.
    """
    try:
        lib = _load_lib()
    except Exception:
        return decode_video_av(path, size=size, max_frames=max_frames)
    h = lib.vd_open(path.encode())
    if not h:
        return decode_video_av(path, size=size, max_frames=max_frames)
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
