"""AOT serving export: serialized StableHLO scoring programs per engine.

A deployment capability beyond the torch reference (which serves nothing —
its eval scripts re-instantiate nn.Modules from source every run): each
serving engine's jitted scoring program — weights captured as constants,
preprocessing fused, optionally the w8a8-quantized backbone — is exported
with ``jax.export`` to a self-contained portable artifact. The artifact
replays with ``jax.export.deserialize(blob).call(...)`` on any host with
jax installed — no model code, checkpoint files, or calibration data
needed — and lowers for the platforms requested at export time (e.g.
``["tpu"]`` from a CPU host).

The batch dimension is symbolic by default (one program serves any B); the
length axes (frames T, waveform samples, patch counts) stay static — export
one artifact per serving bucket, mirroring the engines' own bucket-dispatch
compilation strategy (serve.py).

Platform rules (verified on chip): single-platform artifacts may contain
Mosaic custom calls — the default TPU serving path (Pallas pos middle flow)
and the fully quantized ``"w8a8-pallas"`` path both export and replay
bit-identically to the live scorer (the int8 artifact is ~4x smaller:
int8 weights travel as int8 constants). Multi-platform exports
(``platforms=["cpu", "tpu"]``) require an XLA-only program — build the
scorer with ``use_pallas=False`` (fp) or ``quantize="w8a8"`` (pure-XLA
int8); a Pallas kernel has no CPU lowering outside interpret mode. For the
Pallas-routed quant modes, the interpret flag is pinned to the export
TARGET platform (``_interpret_for_targets``), never the exporting host's.

Host-side concerns stay host-side exactly as in the live engines: callers
pad/bucket to the exported shape and slice the output, and mesh sharding is
not baked in (shard outside, or export per-shard programs).

CLI: ``python -m multimodal_deepfake_detection_tpu.cli.export_serving``.
"""
from __future__ import annotations

import json
import struct
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

# ---------------------------------------------------------------------------
# .jaxprog container: MAGIC | u32 manifest length | JSON manifest | program
#
# The manifest records what the artifact IS (engine, bucket dims, quant mode,
# framework version) so loaders don't have to infer it from the program's
# input signature as engines evolve. Raw ``jax.export`` blobs (pre-manifest
# artifacts) stay loadable — every reader falls back to structural detection
# (models/artifact.py::detect_engine) when the magic is absent.
# ---------------------------------------------------------------------------
_MAGIC = b"MDFDJXPG"
_CONTAINER_FORMAT = 1


def _wrap(blob: bytes, manifest: dict) -> bytes:
    from .. import __version__

    meta = json.dumps(
        {"format": _CONTAINER_FORMAT, "version": __version__, **manifest},
        sort_keys=True,
    ).encode()
    return _MAGIC + struct.pack("<I", len(meta)) + meta + blob


def read_manifest(blob: bytes) -> Optional[dict]:
    """The artifact's manifest dict, or None for a raw (legacy) blob."""
    if not blob.startswith(_MAGIC):
        return None
    (n,) = struct.unpack("<I", blob[len(_MAGIC) : len(_MAGIC) + 4])
    return json.loads(blob[len(_MAGIC) + 4 : len(_MAGIC) + 4 + n])


def _unwrap(blob: bytes) -> bytes:
    if not blob.startswith(_MAGIC):
        return blob
    (n,) = struct.unpack("<I", blob[len(_MAGIC) : len(_MAGIC) + 4])
    return blob[len(_MAGIC) + 4 + n :]


def _quant_mode(scorer) -> Optional[str]:
    return scorer.quantize if getattr(scorer, "_qbackbone", None) is not None else None


def _batch_dim(batch):
    """An int stays static; a string becomes a symbolic dimension."""
    if isinstance(batch, str):
        return jexport.symbolic_shape(batch)[0]
    return int(batch)


def _export(fn, specs, platforms):
    exp = jexport.export(jax.jit(fn), platforms=platforms)(*specs)
    return bytes(exp.serialize())


class _interpret_for_targets:
    """Pin the quant walker's pallas-interpret flag to the export TARGET.

    The flag bakes into the traced program, so deriving it from the
    exporting host's backend is wrong whenever host != target (e.g.
    exporting a ``w8a8-pallas`` scorer for TPU from a CPU host would bake
    the interpret-mode lowering and never run the int8 MXU kernel).
    ``platforms=None`` keeps the runtime default (host == target). A mixed
    cpu+tpu target with a Pallas-routed quant mode is rejected: Mosaic has
    no CPU lowering, and interpret mode everywhere would silently cripple
    the TPU path — use ``quantize="w8a8"``/``use_pallas=False`` instead.
    """

    def __init__(self, scorers, platforms):
        self.scorers = [s for s in scorers if getattr(s, "quantize", None) in
                        ("w8a8-hybrid", "w8a8-pallas")]
        self.forced = None
        if platforms is not None and self.scorers:
            plats = {str(p).lower() for p in platforms}
            if "cpu" in plats and len(plats) > 1:
                raise ValueError(
                    "multi-platform export incl. cpu cannot carry Pallas-routed "
                    "quant modes (w8a8-hybrid/w8a8-pallas); use quantize='w8a8' "
                    "or a single target platform"
                )
            self.forced = "cpu" in plats

    def __enter__(self):
        for s in self.scorers:
            s._force_pallas_interpret = self.forced
        return self

    def __exit__(self, *exc):
        for s in self.scorers:
            s._force_pallas_interpret = None
        return False


def export_visual(scorer, T: int, H: int, W: int, *, batch="b",
                  platforms: Optional[Sequence[str]] = None) -> bytes:
    """VisualScorer -> serialized program: (frames_u8 (B,T,H,W,3) uint8,
    lengths (B,) int32) -> fake probabilities (B,) float32.

    Captures the folded (or, after ``calibrate``, the quantized) backbone
    and head weights as constants. ``batch``: symbolic dim name (default:
    any B) or a static int.
    """
    backbone = scorer._qbackbone if scorer._qbackbone is not None else scorer.folded_backbone
    head = scorer.head_params

    def fn(frames_u8, lengths):
        return scorer._score_impl(backbone, head, frames_u8, lengths)

    B = _batch_dim(batch)
    specs = (
        jax.ShapeDtypeStruct((B, T, H, W, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B,), jnp.int32),
    )
    with _interpret_for_targets([scorer], platforms):
        blob = _export(fn, specs, platforms)
    return _wrap(blob, {"engine": "visual", "T": int(T), "H": int(H), "W": int(W),
                        "quant": _quant_mode(scorer)})


def export_audio(scorer, num_samples: int, *, batch="b",
                 platforms: Optional[Sequence[str]] = None) -> bytes:
    """AudioScorer -> serialized program: (waveforms (B, num_samples)
    float32, frame_lengths (B,) int32) -> fake probabilities (B,).

    Exports the librosa-centered MFCC path (the unbucketed ``score()``
    semantics): waveforms arrive raw, framing/reflection happens on device.
    ``frame_lengths`` gates the LSTM; pass ``1 + num_samples // hop_length``
    for full-length clips.
    """
    backbone = scorer._qbackbone if scorer._qbackbone is not None else scorer.folded_backbone
    head = scorer.head_params

    def fn(waveforms, lengths):
        return scorer._score_impl(backbone, head, waveforms, lengths, centered=True)

    B = _batch_dim(batch)
    specs = (
        jax.ShapeDtypeStruct((B, int(num_samples)), jnp.float32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
    )
    with _interpret_for_targets([scorer], platforms):
        blob = _export(fn, specs, platforms)
    return _wrap(blob, {"engine": "audio", "num_samples": int(num_samples),
                        "hop_length": int(scorer.mfcc_kw.get("hop_length", 160)),
                        "quant": _quant_mode(scorer)})


def export_au_face(scorer, T: int, Ta: int, A: int, face_hw, patch_hw, *, batch="b",
                   platforms: Optional[Sequence[str]] = None) -> bytes:
    """AUFaceScorer -> serialized program: (videos_u8 (B,T,H,W,3) uint8,
    au_patches_u8 (B,Ta,A,h,w,3) uint8, au_mask (B,Ta,A) f32,
    au_weight (B,Ta,A) f32) -> fake probabilities (B,).

    The valid-length gates are baked to the exported (T, Ta) — the same
    contract as one (T, Ta) bucket of the live engine.
    """
    params, bn_state, qb = scorer.params, scorer.bn_state, scorer._qbackbones
    v_valid, au_valid = jnp.int32(T), jnp.int32(Ta)

    def fn(videos_u8, patches_u8, au_mask, au_weight):
        return scorer._score_impl(
            params, bn_state, qb, videos_u8, patches_u8, au_mask, au_weight,
            v_valid, au_valid,
        )

    B = _batch_dim(batch)
    H, W = face_hw
    h, w = patch_hw
    specs = (
        jax.ShapeDtypeStruct((B, T, H, W, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B, Ta, A, h, w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B, Ta, A), jnp.float32),
        jax.ShapeDtypeStruct((B, Ta, A), jnp.float32),
    )
    blob = _export(fn, specs, platforms)
    return _wrap(blob, {"engine": "au_face", "T": int(T), "Ta": int(Ta), "A": int(A),
                        "face_hw": [int(H), int(W)], "patch_hw": [int(h), int(w)],
                        "quant": scorer.quantize if scorer._qbackbones is not None else None})


def export_au_patch(scorer, T: int, A: int, patch_hw, *, batch="b",
                    platforms: Optional[Sequence[str]] = None) -> bytes:
    """AUPatchScorer -> serialized program: (patches_u8 (B,T,A,h,w,3) uint8,
    au_weights (B,T,A) f32, lengths (B,) int32) -> fake probabilities (B,)."""
    params, bn_state, qb = scorer.params, scorer.bn_state, scorer._qbackbone

    def fn(patches_u8, weights, lengths):
        return scorer._score_impl(params, bn_state, qb, patches_u8, weights, lengths)

    B = _batch_dim(batch)
    h, w = patch_hw
    specs = (
        jax.ShapeDtypeStruct((B, T, A, h, w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B, T, A), jnp.float32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
    )
    blob = _export(fn, specs, platforms)
    return _wrap(blob, {"engine": "au_patch", "T": int(T), "A": int(A),
                        "patch_hw": [int(h), int(w)], "quant": _quant_mode(scorer)})


def export_av(av_scorer, T: int, H: int, W: int, num_samples: int, *, batch="b",
              platforms: Optional[Sequence[str]] = None) -> bytes:
    """AVScorer -> ONE serialized program scoring both modalities:
    (frames_u8 (B,T,H,W,3) uint8, lengths (B,) int32, waveforms
    (B, num_samples) float32, frame_lengths (B,) int32) -> fused fake
    probabilities (B,) = alpha * p_visual + (1-alpha) * p_audio.

    Both backbones (and the alpha) bake into a single artifact — joint AV
    deployment from one file."""
    vis, aud = av_scorer.visual, av_scorer.audio
    v_backbone = vis._qbackbone if vis._qbackbone is not None else vis.folded_backbone
    a_backbone = aud._qbackbone if aud._qbackbone is not None else aud.folded_backbone
    v_head, a_head = vis.head_params, aud.head_params
    alpha = jnp.float32(av_scorer.alpha)

    def fn(frames_u8, lengths, waveforms, frame_lengths):
        p_v = vis._score_impl(v_backbone, v_head, frames_u8, lengths)
        p_a = aud._score_impl(a_backbone, a_head, waveforms, frame_lengths, centered=True)
        return alpha * p_v + (1.0 - alpha) * p_a

    B = _batch_dim(batch)
    specs = (
        jax.ShapeDtypeStruct((B, T, H, W, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B,), jnp.int32),
        jax.ShapeDtypeStruct((B, int(num_samples)), jnp.float32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
    )
    with _interpret_for_targets([vis, aud], platforms):
        blob = _export(fn, specs, platforms)
    return _wrap(blob, {"engine": "av", "T": int(T), "H": int(H), "W": int(W),
                        "num_samples": int(num_samples), "alpha": float(av_scorer.alpha),
                        "hop_length": int(aud.mfcc_kw.get("hop_length", 160)),
                        "quant": [_quant_mode(vis), _quant_mode(aud)]})


def load_exported(blob: bytes):
    """Deserialize an exported scoring program (manifest container or raw
    legacy blob); run it via ``.call(*args)``."""
    return jexport.deserialize(_unwrap(blob))
