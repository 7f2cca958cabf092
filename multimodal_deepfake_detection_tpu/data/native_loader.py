"""ctypes bindings for the native (C++) npy batch-collate engine.

``native/npy_collate.cc`` does the hot host-side data work — npy parsing,
uint8 -> f32/255 conversion, zero-padded batch assembly — in GIL-free native
threads. This wrapper builds the shared library on first use (g++, cached)
and exposes ``native_pad_collate`` with the same contract as the Python
``pad_collate``; ``DataLoader`` call sites can swap it in via ``collate=``.
Falls back loudly (ImportError) if no C++ toolchain exists — the pure-Python
path is always available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

from .collate import bucket_length

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so_path = os.path.join(_NATIVE_DIR, "libnpy_collate.so")
    src = os.path.join(_NATIVE_DIR, "npy_collate.cc")
    if not os.path.exists(so_path) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so_path)
    ):
        subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")], check=True, capture_output=True)
    lib = ctypes.CDLL(so_path)
    lib.npy_shape.restype = ctypes.c_int64
    lib.npy_shape.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.collate_batch_f32.restype = ctypes.c_int64
    lib.collate_batch_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


def npy_shape(path: str) -> Tuple[int, ...]:
    lib = _load_lib()
    buf = (ctypes.c_int64 * 8)()
    rank = lib.npy_shape(path.encode(), buf, 8)
    if rank < 0:
        raise ValueError(f"unreadable npy: {path}")
    return tuple(buf[i] for i in range(rank))


def native_collate_paths(
    paths: Sequence[str],
    labels: Sequence[int],
    *,
    item_shape: Tuple[int, ...],
    max_t: int,
    batch_size: Optional[int] = None,
    normalize_u8: bool = True,
    num_threads: int = 4,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load+collate npy files directly into a (B, max_t, *item_shape) batch.

    Bypasses per-item Python entirely: one C call does parse/convert/pad for
    the whole batch on native threads. ``item_shape`` is the per-step shape
    (e.g. (256, 256, 3) for face frames, (13,) for MFCC rows).
    """
    lib = _load_lib()
    n = len(paths)
    B = batch_size if batch_size is not None else n
    item_elems = int(np.prod(item_shape))
    batch = np.zeros((B, max_t) + tuple(item_shape), np.float32)
    lengths = np.zeros((B,), np.int64)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    fails = lib.collate_batch_f32(
        blob,
        n,
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_t,
        item_elems,
        1 if normalize_u8 else 0,
        num_threads,
    )
    if fails:
        raise IOError(f"native collate: {fails}/{n} items failed to load")
    out_labels = np.zeros((B,), np.float32)
    out_labels[:n] = np.asarray(labels, np.float32)
    return batch, out_labels, lengths.astype(np.int32)


class NativeNpyCollate:
    """Drop-in ``collate=`` for DataLoader over an NpyFolderDataset.

    Works path-level: the loader hands (array, label) items, but this class is
    instead bound to the *dataset* and indexes — use via
    ``DataLoader(ds, ..., collate=NativeNpyCollate(ds, buckets, batch_size))``
    combined with ``raw_indices=True``-style datasets, or more simply through
    ``native_collate_paths`` in custom pipelines. For the standard flat-tree
    case, prefer ``make_native_loader``.
    """

    def __init__(self, dataset, *, buckets=None, batch_size=None, num_threads: int = 4):
        self.dataset = dataset
        self.buckets = buckets
        self.batch_size = batch_size
        self.num_threads = num_threads
        self.item_shape = npy_shape(dataset.files[0])[1:]
        if dataset.kind == "audio":
            # audio items are (T, 13) on disk but models take (T, 3, 13)
            self.item_shape = (13,)

    def __call__(self, items):
        raise NotImplementedError("use collate_indices via make_native_loader")

    def collate_indices(self, indices):
        ds = self.dataset
        paths = [ds.files[int(i)] for i in indices]
        labels = [ds.all_labels[int(i)] for i in indices]
        max_len = max(npy_shape(p)[0] for p in paths)
        if ds.max_frames is not None:
            max_len = min(max_len, ds.max_frames)
        T = bucket_length(max_len, self.buckets)
        batch, lab, lengths = native_collate_paths(
            paths,
            labels,
            item_shape=self.item_shape,
            max_t=T,
            batch_size=self.batch_size,
            normalize_u8=(ds.kind == "video"),
            num_threads=self.num_threads,
        )
        if ds.kind == "audio":
            batch = np.repeat(batch[:, :, None, :], 3, axis=2)  # (B,T,3,13)
        return batch, lab, lengths


def make_native_loader(dataset, batch_size, *, buckets=None, shuffle=False, seed=0, num_threads=4, prefetch=2):
    """A DataLoader whose batches are assembled by the C++ engine."""
    from .loader import DataLoader

    nc = NativeNpyCollate(dataset, buckets=buckets, batch_size=batch_size, num_threads=num_threads)

    class _IndexDataset:
        """Identity dataset: items ARE indices; the collate resolves them."""

        def __init__(self, ds):
            self._ds = ds
            self.all_labels = ds.all_labels

        def __len__(self):
            return len(self._ds)

        def __getitem__(self, i):
            return i

    return DataLoader(
        _IndexDataset(dataset),
        batch_size,
        shuffle=shuffle,
        seed=seed,
        collate=lambda idxs: nc.collate_indices(idxs),
        prefetch=prefetch,
    )
