"""Artifact-backed serving: live-engine ``score()`` over exported programs.

models/export.py writes portable StableHLO scoring artifacts (weights baked,
preprocessing fused); this module closes the deployment loop by giving those
artifacts the SAME ``score()`` surface as the live engines in models/serve.py
— including multi-artifact time/sample bucket dispatch — so ``cli/serve.py``,
``cli/serve_daemon.py`` and the micro-batching adapters (serving/batcher.py)
run checkpoint-free and model-code-free from ``.jaxprog`` files alone.

Beyond-parity capability: the torch reference re-instantiates nn.Modules from
source and reloads ``.pth`` checkpoints for every eval run (e.g.
``/root/reference/test_visual.py:572-608``); it has no deployable serving
artifact at all.

Engine identity comes from the ``.jaxprog`` container's embedded manifest
(models/export.py: engine, bucket dims, quant mode, framework version); for
raw pre-manifest blobs the fallback is structural detection — each engine's
exported calling convention has a unique (arity, ndim, dtype) signature, so
the arrays inside the artifact identify it with no sidecar metadata:

========  =====================================================================
engine    exported positional args (B symbolic or static)
========  =====================================================================
visual    frames (B,T,H,W,3) u8, lengths (B,) i32
audio     waveforms (B,S) f32, frame_lengths (B,) i32
au_patch  patches (B,T,A,h,w,3) u8, weights (B,T,A) f32, lengths (B,) i32
au_face   videos (B,T,H,W,3) u8, patches (B,Ta,A,h,w,3) u8,
          au_mask (B,Ta,A) f32, au_weight (B,Ta,A) f32
av        frames (B,T,H,W,3) u8, lengths (B,) i32,
          waveforms (B,S) f32, frame_lengths (B,) i32
========  =====================================================================

Bucket dispatch mirrors the live engines (data/collate.py::bucket_length):
the smallest artifact whose static length axis covers the input is chosen,
the input zero-padded up to it (lengths clipped), and inputs longer than the
largest artifact are truncated to it. ``au_face`` artifacts bake their
valid-length gates (export_au_face), so they require an exact (T, Ta) match —
padding would silently change the gating.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..data.collate import bucket_length
from .export import load_exported, read_manifest

__all__ = ["ArtifactScorer", "load_artifact_scorer", "detect_engine"]

Source = Union[str, bytes]

# engine -> ((ndim, dtype kind) per positional arg); uniquely identifying
_SIGNATURES: Dict[str, Tuple[Tuple[int, str], ...]] = {
    "visual": ((5, "u"), (1, "i")),
    "audio": ((2, "f"), (1, "i")),
    "au_patch": ((6, "u"), (3, "f"), (1, "i")),
    "au_face": ((5, "u"), (6, "u"), (3, "f"), (3, "f")),
    "av": ((5, "u"), (1, "i"), (2, "f"), (1, "i")),
}


def detect_engine(prog) -> str:
    """Identify which serving engine an exported program scores for."""
    sig = tuple((a.ndim, np.dtype(a.dtype).kind) for a in prog.in_avals)
    for name, want in _SIGNATURES.items():
        if sig == want:
            return name
    raise ValueError(
        f"not a recognized scoring artifact: input signature {sig} matches no "
        f"engine (see models/export.py for the exported calling conventions)"
    )


def _static(dim) -> Optional[int]:
    """An int dim stays; a symbolic dim (the batch) becomes None."""
    return int(dim) if isinstance(dim, int) else None


def _pad_time(a: np.ndarray, T: int) -> np.ndarray:
    """Zero-pad or truncate axis 1 to exactly ``T`` (live-engine semantics)."""
    if a.shape[1] > T:
        return a[:, :T]
    if a.shape[1] < T:
        pad = np.zeros((a.shape[0], T - a.shape[1]) + a.shape[2:], a.dtype)
        return np.concatenate([a, pad], axis=1)
    return a


class _Program:
    """One loaded artifact: its jitted call, bucket key, and fixed dims."""

    def __init__(self, prog, engine: str):
        self.engine = engine
        self.call = jax.jit(prog.call)  # caches the compile per concrete B
        shapes = [a.shape for a in prog.in_avals]
        self.batch = _static(shapes[0][0])  # None = symbolic (any B)
        s0 = shapes[0]
        if engine == "visual":
            self.key: Tuple[int, ...] = (int(s0[1]),)  # (T,)
            self.fixed = ("HW", (int(s0[2]), int(s0[3])))
        elif engine == "audio":
            self.key = (int(s0[1]),)  # (S,)
            self.fixed = ("", ())
        elif engine == "au_patch":
            self.key = (int(s0[1]),)  # (T,)
            self.fixed = ("Ahw", tuple(int(d) for d in s0[2:5]))
        elif engine == "au_face":
            s1 = shapes[1]
            self.key = (int(s0[1]), int(s1[1]))  # (T, Ta) — exact match
            self.fixed = (
                "HW+Ahw",
                (int(s0[2]), int(s0[3])) + tuple(int(d) for d in s1[2:5]),
            )
        else:  # av
            s2 = shapes[2]
            self.key = (int(s0[1]), int(s2[1]))  # (T, S)
            self.fixed = ("HW", (int(s0[2]), int(s0[3])))


class ArtifactScorer:
    """Score with exported programs through the live engines' ``score()`` API.

    ``sources``: artifact blobs (bytes) and/or paths — each a ``.jaxprog``
    file or a directory of them; every artifact must target the same engine
    and agree on the non-length static dims (H/W, patch A/h/w). One artifact
    per serving bucket, exactly as models/export.py prescribes.

    ``hop_length`` (audio/av only) converts waveform sample counts to MFCC
    frame counts (``1 + samples // hop``) when the caller passes
    ``sample_lengths`` instead of ``frame_lengths`` — it must match the
    AudioScorer the artifact was exported from (default 160, the engine
    default). Mixed-duration audio note: the artifact bakes the on-device
    centered MFCC path, so rows shorter than the sample bucket are zero-pad
    framed (their tail frames masked via ``frame_lengths``) — bit-identical
    to the live engine for full-length rows; the live engine's host-side
    per-row re-centering (AudioScorer.score) remains the exact path for
    mixed-duration batches.
    """

    def __init__(self, sources: Union[Source, Sequence[Source]], *,
                 engine: Optional[str] = None, hop_length: Optional[int] = None):
        blobs = _gather(sources)
        if not blobs:
            raise ValueError("no artifacts given")
        progs = []
        manifest_hops = set()
        for blob in blobs:
            p = load_exported(blob)
            m = read_manifest(blob)
            detected = detect_engine(p)
            if m is not None and "engine" in m:
                if m["engine"] != detected:
                    raise ValueError(
                        f"corrupt artifact: manifest says {m['engine']!r} but the "
                        f"program's input signature is a {detected!r} convention"
                    )
                if "hop_length" in m:
                    manifest_hops.add(int(m["hop_length"]))
            progs.append(_Program(p, detected))
        engines = {p.engine for p in progs}
        if len(engines) > 1:
            raise ValueError(f"artifacts target different engines: {sorted(engines)}")
        self.engine = progs[0].engine
        if engine is not None and engine != self.engine:
            raise ValueError(
                f"expected a {engine!r} artifact, got {self.engine!r}"
            )
        fixed = {p.fixed for p in progs}
        if len(fixed) > 1:
            raise ValueError(f"artifacts disagree on fixed dims: {sorted(fixed)}")
        keys = [p.key for p in progs]
        if len(set(keys)) != len(keys):
            raise ValueError(f"duplicate bucket keys among artifacts: {sorted(keys)}")
        self._programs = {p.key: p for p in progs}
        self.buckets: List[Tuple[int, ...]] = sorted(self._programs)
        if hop_length is None:
            # default from the manifests (the hop the engine was exported
            # with); 160 (the engine default) for raw legacy blobs
            if len(manifest_hops) > 1:
                raise ValueError(f"artifacts disagree on hop_length: {sorted(manifest_hops)}")
            hop_length = manifest_hops.pop() if manifest_hops else 160
        self.hop_length = int(hop_length)

    # -- dispatch ------------------------------------------------------------
    def _pick1(self, t: int) -> _Program:
        """Smallest single-axis bucket >= t; largest if none covers."""
        return self._programs[(bucket_length(t, [k[0] for k in self.buckets]),)]

    def _run(self, prog: _Program, *args: np.ndarray) -> np.ndarray:
        """Handle a static batch dim (pad rows up, slice back), then call."""
        B = args[0].shape[0]
        if prog.batch is not None:
            if B > prog.batch:
                raise ValueError(
                    f"batch {B} exceeds the artifact's static batch {prog.batch}"
                )
            if B < prog.batch:
                args = tuple(
                    np.concatenate(
                        [a, np.zeros((prog.batch - B,) + a.shape[1:], a.dtype)]
                    )
                    for a in args
                )
        return np.asarray(prog.call(*args))[:B]

    # -- live-engine score() signatures ---------------------------------------
    def score(self, *args, **kw) -> np.ndarray:
        return getattr(self, f"_score_{self.engine}")(*args, **kw)

    def _score_visual(self, frames_u8, lengths=None):
        """Mirrors VisualScorer.score (models/serve.py)."""
        frames_u8 = np.asarray(frames_u8)
        B, T = frames_u8.shape[:2]
        lengths = np.full((B,), T, np.int32) if lengths is None else np.asarray(lengths, np.int32)
        prog = self._pick1(T)
        frames_u8 = _pad_time(frames_u8, prog.key[0])
        return self._run(prog, frames_u8, np.minimum(lengths, prog.key[0]))

    def _score_audio(self, waveforms, frame_lengths=None, sample_lengths=None):
        """Mirrors AudioScorer.score; see the class docstring's audio note."""
        waveforms = np.asarray(waveforms, np.float32)
        B, L = waveforms.shape
        prog = self._pick1(L)
        S = prog.key[0]
        if L < S:
            waveforms = np.concatenate([waveforms, np.zeros((B, S - L), np.float32)], axis=1)
        elif L > S:
            waveforms = waveforms[:, :S]
        if frame_lengths is None:
            true = np.minimum(
                np.asarray(sample_lengths) if sample_lengths is not None
                else np.full((B,), L), S,
            )
            frame_lengths = (1 + true // self.hop_length).astype(np.int32)
        return self._run(prog, waveforms, np.asarray(frame_lengths, np.int32))

    def _score_au_patch(self, patches_u8, au_weights=None, lengths=None):
        """Mirrors AUPatchScorer.score."""
        patches_u8 = np.asarray(patches_u8)
        B, T, A = patches_u8.shape[:3]
        if patches_u8.shape[2:5] != self._programs[self.buckets[0]].fixed[1]:
            raise ValueError(
                f"patch dims {patches_u8.shape[2:5]} != artifact's "
                f"{self._programs[self.buckets[0]].fixed[1]}"
            )
        if au_weights is None:
            au_weights = np.ones((B, T, A), np.float32)
        if lengths is None:
            lengths = np.full((B,), T, np.int32)
        prog = self._pick1(T)
        Tb = prog.key[0]
        return self._run(
            prog,
            _pad_time(patches_u8, Tb),
            _pad_time(np.asarray(au_weights, np.float32), Tb),
            np.minimum(np.asarray(lengths, np.int32), Tb),
        )

    def _score_au_face(self, videos_u8, au_patches_u8, au_mask=None, au_weight=None):
        """Mirrors AUFaceScorer.score. Exact (T, Ta) only — the artifact bakes
        its valid-length gates (models/export.py::export_au_face)."""
        videos_u8, au_patches_u8 = np.asarray(videos_u8), np.asarray(au_patches_u8)
        B, T = videos_u8.shape[:2]
        Ta, A = au_patches_u8.shape[1:3]
        prog = self._programs.get((T, Ta))
        if prog is None:
            raise ValueError(
                f"no artifact for (T={T}, Ta={Ta}); au_face artifacts bake "
                f"their valid-length gates — have {self.buckets}"
            )
        ones = np.ones((B, Ta, A), np.float32)
        return self._run(
            prog, videos_u8, au_patches_u8,
            ones if au_mask is None else np.asarray(au_mask, np.float32),
            ones if au_weight is None else np.asarray(au_weight, np.float32),
        )

    def _score_av(self, frames_u8, waveforms, lengths=None, frame_lengths=None,
                  sample_lengths=None):
        """Mirrors AVScorer.score. Buckets on (T, S): smallest covering T,
        then the smallest covering S among that T's artifacts."""
        frames_u8 = np.asarray(frames_u8)
        waveforms = np.asarray(waveforms, np.float32)
        if frames_u8.shape[0] != waveforms.shape[0]:
            raise ValueError(
                f"paired modalities must share B: {frames_u8.shape[0]} vs {waveforms.shape[0]}"
            )
        B, T = frames_u8.shape[:2]
        L = waveforms.shape[1]
        Tb = bucket_length(T, sorted({k[0] for k in self.buckets}))
        Sb = bucket_length(L, sorted(k[1] for k in self.buckets if k[0] == Tb))
        prog = self._programs[(Tb, Sb)]
        frames_u8 = _pad_time(frames_u8, Tb)
        lengths = np.full((B,), T, np.int32) if lengths is None else np.asarray(lengths, np.int32)
        waveforms = (
            np.concatenate([waveforms, np.zeros((B, Sb - L), np.float32)], axis=1)
            if L < Sb else waveforms[:, :Sb]
        )
        if frame_lengths is None:
            true = np.minimum(
                np.asarray(sample_lengths) if sample_lengths is not None
                else np.full((B,), L), Sb,
            )
            frame_lengths = (1 + true // self.hop_length).astype(np.int32)
        return self._run(
            prog, frames_u8, np.minimum(lengths, Tb),
            waveforms, np.asarray(frame_lengths, np.int32),
        )


def _gather(sources: Union[Source, Sequence[Source]]) -> List[bytes]:
    """Expand paths/dirs/blobs into artifact byte strings."""
    if isinstance(sources, (str, bytes)):
        sources = [sources]
    blobs: List[bytes] = []
    for src in sources:
        if isinstance(src, bytes):
            blobs.append(src)
        elif os.path.isdir(src):
            names = sorted(n for n in os.listdir(src) if n.endswith(".jaxprog"))
            if not names:
                raise FileNotFoundError(f"no .jaxprog artifacts under {src}")
            for n in names:
                with open(os.path.join(src, n), "rb") as f:
                    blobs.append(f.read())
        else:
            with open(src, "rb") as f:
                blobs.append(f.read())
    return blobs


def load_artifact_scorer(sources: Union[Source, Sequence[Source]], *,
                         engine: Optional[str] = None,
                         hop_length: Optional[int] = None) -> ArtifactScorer:
    """Build an :class:`ArtifactScorer` from paths, directories, or blobs."""
    return ArtifactScorer(sources, engine=engine, hop_length=hop_length)
