"""Serving engines: decode-to-logits inference without host round-trips.

Production-path scorers for the two temporal detectors (the BASELINE.json
north-star config: fused device-side preprocessing + batched sharded
inference replacing per-clip Python loops):

* the Xception backbone runs BN-folded (models/fold.py) with the fused Pallas
  middle-flow kernel on TPU;
* preprocessing fuses into the same jit program — uint8 frames are normalized
  and resized on device; raw waveforms go through the on-device MFCC frontend
  (ops/mfcc.py) and channel-tripling without touching the host;
* one compiled program per (batch, length) bucket; scores stream out as
  host scalars only.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..data.collate import bucket_length
from ..ops.lstm import lstm_apply, select_last_step
from ..ops.mfcc import mfcc as mfcc_op
from ..ops.resize import resize_bilinear
from ..parallel.mesh import data_sharding, replicate
from .fold import fold_xception_bn, folded_xception_apply
from .heads import arcface_apply, xception_lstm_head_apply


def _use_pallas_default() -> bool:
    return jax.devices()[0].platform not in ("cpu",)


def _mid_interpret(scorer, mid_pallas: bool) -> bool:
    """Whether the quant walker's pos kernels run in interpret mode.

    Defaults to the current backend (Mosaic is TPU-only; on CPU the kernels
    run interpreted so every quant mode stays testable everywhere). AOT
    export overrides via ``scorer._force_pallas_interpret`` — the flag bakes
    into the traced program, so it must track the export TARGET platform,
    not the exporting host's (models/export.py)."""
    if not mid_pallas:
        return False
    forced = getattr(scorer, "_force_pallas_interpret", None)
    if forced is not None:
        return forced
    return not _use_pallas_default()


# One jitted program per scoring CONFIG, shared by every scorer instance with
# that config (keyed additionally by jit's own input-structure cache): without
# this, each instance's ``jax.jit(partial(self._score_impl))`` is a distinct
# callable and XLA recompiles the identical program per instance — e.g. the
# fp + w8a8(refine=0) + w8a8(refine=1) scorers a dAUC comparison builds, or a
# serving daemon hot-swapping weight trees. Config keys are hashable tuples of
# everything the trace reads from ``self``.
_SCORE_JIT_CACHE: dict = {}


def _shared_score_jit(key, make_fn):
    fn = _SCORE_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(make_fn())
        _SCORE_JIT_CACHE[key] = fn
    return fn


def reset_score_jit_cache() -> None:
    """Drop the shared per-config scoring programs. Scorers built BEFORE the
    reset keep (and keep filling) their jits; scorers built after get fresh
    ones. For tests that assert on ``_score._cache_size()`` — the shared cache
    makes absolute counts depend on every same-config scorer the process ran
    earlier — and for long-lived daemons that want to free retired programs."""
    _SCORE_JIT_CACHE.clear()


class _ShardedScoringMixin:
    """Mesh-sharded batch scoring shared by the serving engines.

    With a ``mesh`` (any ``jax.sharding.Mesh`` with a ``data`` axis), params
    are replicated across the slice and each scoring batch is split over
    ``data`` — the jitted program is identical to single-chip, XLA inserts the
    collectives, and results gather back to the host. The batch is padded up
    to a multiple of the data-axis size with ``lengths == 0`` rows that are
    dropped from the returned scores (BASELINE config-5: batched sharded
    inference over a slice).
    """

    _param_attrs = ("folded_backbone", "head_params")  # replicated over the mesh

    def _init_mesh(self, mesh) -> None:
        self.mesh = mesh
        if mesh is None:
            return
        if "data" not in mesh.axis_names:
            raise ValueError(f"serving mesh needs a 'data' axis, got {mesh.axis_names}")
        self._data_size = int(mesh.shape["data"])
        for attr in self._param_attrs:
            setattr(self, attr, replicate(mesh, getattr(self, attr)))

    def _shard_batch_rows(self, arrays, B: int):
        """Pad every array's leading dim to a multiple of the data-axis size
        and place it split over ``data``. Returns the placed arrays."""
        pad = (-B) % self._data_size
        out = []
        for a in arrays:
            a = np.asarray(a)
            if pad:
                a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
            out.append(jax.device_put(a, data_sharding(self.mesh)))
        return out


def _visual_frames_to_x(frames_u8, frame_size):
    x = frames_u8.reshape((-1,) + frames_u8.shape[2:]).astype(jnp.float32) / 255.0
    if frame_size is not None and x.shape[1:3] != tuple(frame_size):
        x = resize_bilinear(x, frame_size)
    return x


def _visual_score(cfg, backbone, head, frames_u8, lengths):
    """Pure scoring body for VisualScorer (shared-jit per cfg; see _cfg)."""
    arcface_s, frame_size, mask_padding, cdtype, use_pallas, quantize, interpret = cfg
    B, T = frames_u8.shape[:2]
    x = _visual_frames_to_x(frames_u8, frame_size)
    if "w_q" in backbone["conv1"]:  # quantized tree (trace-time branch)
        from .quant import xception_quant_walk

        mid_pallas = quantize in ("w8a8-hybrid", "w8a8-pallas")
        feats = xception_quant_walk(
            backbone, x, quant=True, compute_dtype=cdtype,
            features_only=True, middle_pallas=mid_pallas,
            pallas_interpret=interpret,
        ).reshape(B, T, -1)
    else:
        feats = folded_xception_apply(
            backbone, x, compute_dtype=cdtype, features_only=True,
            use_pallas=use_pallas,
        ).reshape(B, T, -1)
    outputs, _ = lstm_apply(head["lstm"], feats, compute_dtype=cdtype)
    emb = select_last_step(outputs, lengths, mask_padding=mask_padding)
    logits = arcface_apply(head["arcface"], emb, None, s=arcface_s)
    return jax.nn.softmax(logits, axis=-1)[:, 1]


def _load_visual_bundle(path: str, hidden_dim: int, seed: int = 0):
    import jax as _jax

    from ..core.checkpoint import load_bundle, merge_params
    from .heads import arcface_init, xception_lstm_init

    r1, r2 = _jax.random.split(_jax.random.PRNGKey(seed))
    params, bn_state = xception_lstm_init(r1, hidden_dim)
    params["arcface"] = arcface_init(r2, hidden_dim, 2)
    bundle = load_bundle(path)
    model = {k: v for k, v in params.items() if k != "arcface"}
    model = merge_params(model, bundle["model"], strict=True)
    params = dict(model, arcface=merge_params(params["arcface"], bundle["arcface"], strict=True))
    if "state" in bundle:
        bn_state = merge_params(bn_state, bundle["state"], strict=False)
    return params, bn_state


def _load_audio_bundle(path: str, hidden_dim: int, seed: int = 0):
    import jax as _jax

    from ..core.checkpoint import load_bundle, merge_params
    from .heads import xception_lstm_init

    params, bn_state = xception_lstm_init(_jax.random.PRNGKey(seed), hidden_dim)
    bundle = load_bundle(path)
    params = merge_params(params, bundle["model"], strict=True)
    if "state" in bundle:
        bn_state = merge_params(bn_state, bundle["state"], strict=False)
    return params, bn_state


class VisualScorer(_ShardedScoringMixin):
    """XceptionLSTMV + ArcFace scoring on raw uint8 frame stacks."""

    @classmethod
    def from_bundle(cls, path: str, hidden_dim: int = 128, **kw):
        """Build directly from a train_visual {model, arcface[, state]} bundle."""
        return cls(*_load_visual_bundle(path, hidden_dim), **kw)

    def __init__(
        self,
        params,
        bn_state,
        *,
        arcface_s: float = 30.0,
        frame_size: Optional[Tuple[int, int]] = None,
        compute_dtype=jnp.bfloat16,
        use_pallas: Optional[bool] = None,
        mask_padding: bool = True,
        mesh=None,
        buckets: Optional[Sequence[int]] = None,
        quantize: Optional[str] = None,
    ):
        """``quantize``: opt-in w8a8 post-training quantization of the
        backbone (models/quant.py) — ``"w8a8"`` (every MXU conv + depthwise
        int8, pure XLA; measured 35.8 ms vs the fp default's 36.8 at B=256
        on v5e), ``"w8a8-hybrid"`` (int8 entry/exit + the bf16 Pallas pos
        middle flow; 32.9 ms), or ``"w8a8-pallas"`` (int8 entry/exit + the
        int8-pointwise Pallas pos middle kernel — the MXU runs int8 at 2x
        the bf16 rate; 29.6 ms = 8,651 frames/s, all at feature cos 0.9999
        — PERF.md r3). Requires a calibration batch: call
        :meth:`calibrate` first, else the first scored batch calibrates
        implicitly. The fp path stays the default — quantization changes
        scores within calibration tolerance, not bit-exactly.
        """
        self.folded_backbone = jax.device_put(fold_xception_bn(params["backbone"], bn_state["backbone"]))
        self.head_params = jax.device_put({k: v for k, v in params.items() if k != "backbone"})
        self.arcface_s = arcface_s
        self.frame_size = frame_size
        self.mask_padding = mask_padding
        self.compute_dtype = compute_dtype
        self.use_pallas = _use_pallas_default() if use_pallas is None else use_pallas
        if quantize not in (None, "w8a8", "w8a8-hybrid", "w8a8-pallas"):
            raise ValueError(
                f"quantize must be None, 'w8a8', 'w8a8-hybrid' or 'w8a8-pallas', got {quantize!r}"
            )
        self.quantize = quantize
        self._qbackbone = None
        # length buckets: pad T up to a bucket so the jit sees a small, fixed
        # set of shapes instead of one compile per distinct clip length
        self.buckets = tuple(buckets) if buckets else None
        self._init_mesh(mesh)
        cfg = self._cfg()
        self._score = _shared_score_jit(("visual", cfg), lambda: partial(_visual_score, cfg))

    def _cfg(self) -> tuple:
        """Hashable tuple of everything the traced program reads from self."""
        mid_pallas = self.quantize in ("w8a8-hybrid", "w8a8-pallas")
        return (
            float(self.arcface_s),
            tuple(self.frame_size) if self.frame_size is not None else None,
            bool(self.mask_padding), self.compute_dtype, bool(self.use_pallas),
            self.quantize, _mid_interpret(self, mid_pallas),
        )

    def _frames_to_x(self, frames_u8):
        return _visual_frames_to_x(frames_u8, self._cfg()[1])

    def calibrate(self, frames_u8: np.ndarray, *, refine_passes: int = 0) -> None:
        """Fit w8a8 activation scales on a representative uint8 frame batch
        and switch the backbone to the quantized tree (no-op when
        ``quantize=None``). ``refine_passes > 0`` additionally applies the
        closed-form per-channel affine refinement
        (models/quant.py::refine_quantized_xception) on the same frames —
        recovers part of PTQ's error at zero serving cost."""
        if self.quantize is None:
            return
        from .quant import calibrate_amax, quantize_folded_xception, refine_quantized_xception

        x = self._frames_to_x(np.asarray(frames_u8))
        amaxes = calibrate_amax(self.folded_backbone, x, compute_dtype=self.compute_dtype)
        qtree = quantize_folded_xception(
            self.folded_backbone,
            amaxes,
            quant_depthwise=True,
            skip_middle=(self.quantize == "w8a8-hybrid"),
        )
        if refine_passes:
            qtree = refine_quantized_xception(
                qtree, self.folded_backbone, x, passes=refine_passes,
                compute_dtype=self.compute_dtype,
            )
        self._qbackbone = (
            replicate(self.mesh, qtree) if self.mesh is not None else jax.device_put(qtree)
        )

    def _score_impl(self, backbone, head, frames_u8, lengths):
        # re-resolves the config at call time so models/export.py's
        # _force_pallas_interpret override reaches the trace
        return _visual_score(self._cfg(), backbone, head, frames_u8, lengths)

    def score(self, frames_u8: np.ndarray, lengths: Optional[np.ndarray] = None) -> np.ndarray:
        """frames_u8: (B, T, H, W, 3) uint8 -> fake probabilities (B,)."""
        if self.quantize is not None and self._qbackbone is None:
            self.calibrate(frames_u8)  # implicit first-batch calibration
        B, T = frames_u8.shape[:2]
        if lengths is None:
            lengths = np.full((B,), T, np.int32)
        if self.buckets:
            Tb = bucket_length(T, self.buckets)
            if Tb > T:
                pad = np.zeros((B, Tb - T) + frames_u8.shape[2:], frames_u8.dtype)
                frames_u8 = np.concatenate([frames_u8, pad], axis=1)
            elif Tb < T:  # longer than the largest bucket: truncate (collate contract)
                frames_u8 = frames_u8[:, :Tb]
                lengths = np.minimum(lengths, Tb)
        if self.mesh is not None:
            frames_u8, lengths = self._shard_batch_rows((frames_u8, lengths), B)
        backbone = self._qbackbone if self._qbackbone is not None else self.folded_backbone
        out = self._score(backbone, self.head_params, frames_u8, lengths)
        return np.asarray(out)[:B]


def _audio_wave_to_imgs(waveforms, mfcc_kw, centered: bool):
    # waveform -> MFCC -> channel-triple -> (13,1)->64x64 images, on device
    feats_mfcc = mfcc_op(waveforms, center=centered, **dict(mfcc_kw))  # (B, T, 13)
    B, T, n = feats_mfcc.shape
    imgs = feats_mfcc.reshape(B * T, n, 1, 1)
    imgs = jnp.broadcast_to(imgs, (B * T, n, 1, 3))  # channel-triple
    imgs = resize_bilinear(imgs, (64, 64))
    return imgs, B, T


def _audio_score(cfg, backbone, head, waveforms, lengths):
    """Pure scoring body for AudioScorer (shared-jit per cfg; see _cfg)."""
    mfcc_kw, mask_padding, cdtype, use_pallas, quantize, interpret, centered = cfg
    imgs, B, T = _audio_wave_to_imgs(waveforms, mfcc_kw, centered)
    if "w_q" in backbone["conv1"]:  # quantized tree (trace-time branch)
        from .quant import xception_quant_walk

        mid_pallas = quantize in ("w8a8-hybrid", "w8a8-pallas")
        feats = xception_quant_walk(
            backbone, imgs, quant=True, compute_dtype=cdtype,
            features_only=True, middle_pallas=mid_pallas,
            pallas_interpret=interpret,
        ).reshape(B, T, -1)
    else:
        feats = folded_xception_apply(
            backbone, imgs, compute_dtype=cdtype, features_only=True,
            use_pallas=use_pallas,
        ).reshape(B, T, -1)
    return xception_lstm_head_apply(
        head, feats, lengths=lengths, mask_padding=mask_padding,
        compute_dtype=cdtype,
    )[:, 0]


class AudioScorer(_ShardedScoringMixin):
    """XceptionLSTMA scoring straight from raw 16 kHz waveforms."""

    @classmethod
    def from_bundle(cls, path: str, hidden_dim: int = 512, **kw):
        """Build directly from a train_audio {model[, state]} bundle."""
        return cls(*_load_audio_bundle(path, hidden_dim), **kw)

    def __init__(
        self,
        params,
        bn_state,
        *,
        sr: int = 16000,
        n_mfcc: int = 13,
        n_fft: int = 400,
        hop_length: int = 160,
        compute_dtype=jnp.bfloat16,
        use_pallas: Optional[bool] = None,
        mask_padding: bool = True,
        mesh=None,
        sample_buckets: Optional[Sequence[int]] = None,
        quantize: Optional[str] = None,
    ):
        self.mask_padding = mask_padding
        self.folded_backbone = jax.device_put(fold_xception_bn(params["backbone"], bn_state["backbone"]))
        self.head_params = jax.device_put({k: v for k, v in params.items() if k != "backbone"})
        if quantize not in (None, "w8a8", "w8a8-hybrid", "w8a8-pallas"):
            raise ValueError(
                f"quantize must be None, 'w8a8', 'w8a8-hybrid' or 'w8a8-pallas', got {quantize!r}"
            )
        self.quantize = quantize
        self._qbackbone = None
        self.mfcc_kw = dict(sr=sr, n_mfcc=n_mfcc, n_fft=n_fft, hop_length=hop_length)
        self.compute_dtype = compute_dtype
        self.use_pallas = _use_pallas_default() if use_pallas is None else use_pallas
        # waveform-length buckets: each call's sample axis is padded up to a
        # bucket so the jit sees a small fixed shape set (one compile per
        # bucket) instead of one multi-second compile per distinct length.
        # Exactness: the true signal is reflect-padded HOST-side (librosa's
        # centering) and framed uncentered on device, so every frame of the
        # original length is bit-identical under the zero-pad; the pad frames
        # are masked off via frame lengths.
        self.sample_buckets = tuple(sorted(sample_buckets)) if sample_buckets else None
        self._init_mesh(mesh)
        cfg_c, cfg_u = self._cfg(True), self._cfg(False)
        self._score = _shared_score_jit(("audio", cfg_c), lambda: partial(_audio_score, cfg_c))
        self._score_uncentered = _shared_score_jit(
            ("audio", cfg_u), lambda: partial(_audio_score, cfg_u)
        )

    def _cfg(self, centered: bool) -> tuple:
        """Hashable tuple of everything the traced program reads from self."""
        mid_pallas = self.quantize in ("w8a8-hybrid", "w8a8-pallas")
        return (
            tuple(sorted(self.mfcc_kw.items())), bool(self.mask_padding),
            self.compute_dtype, bool(self.use_pallas), self.quantize,
            _mid_interpret(self, mid_pallas), bool(centered),
        )

    def _wave_to_imgs(self, waveforms, centered: bool):
        return _audio_wave_to_imgs(waveforms, self.mfcc_kw, centered)

    def calibrate(self, waveforms: np.ndarray, *, refine_passes: int = 0) -> None:
        """Fit w8a8 activation scales on a representative waveform batch
        (no-op when ``quantize=None``). ``refine_passes > 0`` applies the
        closed-form per-channel affine refinement on the derived MFCC images
        (see VisualScorer.calibrate)."""
        if self.quantize is None:
            return
        from .quant import calibrate_amax, quantize_folded_xception, refine_quantized_xception

        imgs = jax.jit(lambda w: self._wave_to_imgs(w, centered=True)[0])(
            jnp.asarray(waveforms, jnp.float32)
        )
        amaxes = calibrate_amax(self.folded_backbone, imgs, compute_dtype=self.compute_dtype)
        qtree = quantize_folded_xception(
            self.folded_backbone, amaxes, quant_depthwise=True,
            skip_middle=(self.quantize == "w8a8-hybrid"),
        )
        if refine_passes:
            qtree = refine_quantized_xception(
                qtree, self.folded_backbone, imgs, passes=refine_passes,
                compute_dtype=self.compute_dtype,
            )
        self._qbackbone = (
            replicate(self.mesh, qtree) if self.mesh is not None else jax.device_put(qtree)
        )

    def _score_impl(self, backbone, head, waveforms, lengths, centered: bool = True):
        # re-resolves the config at call time so models/export.py's
        # _force_pallas_interpret override reaches the trace
        return _audio_score(self._cfg(centered), backbone, head, waveforms, lengths)

    def score(
        self,
        waveforms: np.ndarray,
        frame_lengths: Optional[np.ndarray] = None,
        sample_lengths: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """waveforms: (B, samples) float -> fake probabilities (B,).

        ``sample_lengths`` (B,) marks each row's true waveform length when the
        batch mixes clips of different durations (rows zero-padded to a common
        sample axis, e.g. by a batching server): each row is reflect-centered
        HOST-side on its OWN true length (librosa semantics) and its MFCC
        frames beyond ``1 + len//hop`` are masked, so per-row scores are
        bit-identical to scoring that clip alone. Without it, a batch is
        treated as uniform-length (the true signal is every row's full axis).
        """
        if self.quantize is not None and self._qbackbone is None:
            self.calibrate(waveforms)  # implicit first-batch calibration
        B, L = waveforms.shape[:2]
        score_fn = self._score
        n_fft, hop = self.mfcc_kw["n_fft"], self.mfcc_kw["hop_length"]
        if sample_lengths is not None:
            # Mixed-length batch: per-row centering on the true signal, then a
            # shared zero-padded sample axis framed uncentered on device.
            sample_lengths = np.asarray(sample_lengths, np.int64)
            if sample_lengths.shape != (B,):
                raise ValueError(f"sample_lengths must be ({B},), got {sample_lengths.shape}")
            Lb = bucket_length(L, self.sample_buckets) if self.sample_buckets else L
            if Lb < L:  # longer than the largest bucket: truncate
                waveforms, L = waveforms[:, :Lb], Lb
                sample_lengths = np.minimum(sample_lengths, Lb)
            if np.any(sample_lengths <= n_fft // 2):
                raise ValueError(
                    f"every sample_length must exceed n_fft//2 = {n_fft // 2} "
                    "for reflect centering (librosa constraint)"
                )
            half = n_fft // 2
            centered = np.zeros((B, Lb + 2 * half), np.float32)
            wf = np.asarray(waveforms, np.float32)
            for i, Li in enumerate(sample_lengths):
                centered[i, : Li + 2 * half] = np.pad(wf[i, :Li], (half, half), mode="reflect")
            n_valid = (1 + sample_lengths // hop).astype(np.int32)
            frame_lengths = n_valid if frame_lengths is None else np.minimum(frame_lengths, n_valid)
            waveforms = centered
            score_fn = self._score_uncentered
        elif self.sample_buckets:
            Lb = bucket_length(L, self.sample_buckets)
            if Lb < L:  # longer than the largest bucket: truncate
                waveforms, L = waveforms[:, :Lb], Lb
            # librosa centering done here, on the TRUE length; then zero-pad
            waveforms = np.pad(
                np.asarray(waveforms, np.float32),
                ((0, 0), (n_fft // 2, n_fft // 2)),
                mode="reflect",
            )
            waveforms = np.pad(waveforms, ((0, 0), (0, Lb - L)))
            n_valid = 1 + L // hop  # frames of the true signal — all exact
            valid = np.full((B,), n_valid, np.int32)
            frame_lengths = valid if frame_lengths is None else np.minimum(frame_lengths, valid)
            score_fn = self._score_uncentered
        if self.mesh is not None:
            if frame_lengths is None:
                waveforms, = self._shard_batch_rows((waveforms,), B)
            else:
                waveforms, frame_lengths = self._shard_batch_rows((waveforms, frame_lengths), B)
        backbone = self._qbackbone if self._qbackbone is not None else self.folded_backbone
        out = score_fn(backbone, self.head_params, waveforms, frame_lengths)
        return np.asarray(out)[:B]


def _load_au_face_bundle(path: str, *, num_aus: int = 17, lstm_hidden: int = 256, seed: int = 0):
    """Flexible AU-face bundle load (mirrors cli/test_au_face.py:63-84 —
    the reference's flexible checkpoint unwrapping, /root/reference/
    test_au_face.py:107-141): {model: ...} or bare tree, strict -> non-strict
    fallback, optional bn state."""
    from ..core.checkpoint import load_bundle, merge_params
    from .au_face import au_face_detector_init

    params, bn_state = au_face_detector_init(
        jax.random.PRNGKey(seed), num_aus=num_aus,
        face_dim=2 * lstm_hidden, au_dim=2 * lstm_hidden, lstm_hidden=lstm_hidden,
    )
    bundle = load_bundle(path)
    tree = bundle.get("model", bundle)
    try:
        params = merge_params(params, tree, strict=True)
    except (KeyError, ValueError):
        params = merge_params(params, tree, strict=False)
    if isinstance(bundle, dict) and "state" in bundle:
        bn_state = merge_params(bn_state, bundle["state"], strict=False)
    return params, bn_state


def _au_face_score(cfg, params, bn_state, qbackbones, videos_u8, patches_u8, au_mask,
                   au_weight, v_valid, au_valid):
    """Pure scoring body for AUFaceScorer (shared-jit per cfg; see _cfg)."""
    from .au_face import au_face_detector_apply
    from .quant import resnet18_quant_walk

    frame_size, patch_size, cdtype = cfg
    videos = AUFaceScorer._prep(videos_u8, frame_size)
    patches = AUFaceScorer._prep(patches_u8, patch_size)
    bfns = {}
    if qbackbones is not None:
        for key in ("face", "au"):
            bfns[f"{key}_backbone_fn"] = partial(
                lambda q, flat: resnet18_quant_walk(q, flat, quant=True, compute_dtype=cdtype),
                qbackbones[key],
            )
    logits, _, _, _ = au_face_detector_apply(
        params, bn_state, videos, patches, au_mask, au_weight,
        v_valid=v_valid, au_valid=au_valid,
        train=False, compute_dtype=cdtype, **bfns,
    )
    return jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))


class AUFaceScorer(_ShardedScoringMixin):
    """Cross-modal AU+face scoring (AUFaceCrossDetector) on raw uint8 inputs.

    Scores with the model's own logits head — sigmoid(logits[:, 0]) — exactly
    as the reference eval harness does (/root/reference/test_au_face.py:
    147-184 via cli/test_au_face.py). Completes serving coverage of the third
    model family next to VisualScorer (ArcFace visual) and AudioScorer.
    """

    _param_attrs = ("params", "bn_state")

    @classmethod
    def from_bundle(cls, path: str, num_aus: int = 17, lstm_hidden: int = 256, **kw):
        """Build from a train_au_face {model[, embed, arcface, state]} bundle."""
        return cls(*_load_au_face_bundle(path, num_aus=num_aus, lstm_hidden=lstm_hidden), **kw)

    def __init__(
        self,
        params,
        bn_state,
        *,
        compute_dtype=jnp.bfloat16,
        frame_size: Optional[Tuple[int, int]] = None,
        patch_size: Optional[Tuple[int, int]] = None,
        mesh=None,
        buckets: Optional[Sequence[int]] = None,
        quantize: Optional[str] = None,
    ):
        self.params = jax.device_put(params)
        self.bn_state = jax.device_put(bn_state)
        self.compute_dtype = compute_dtype
        self.frame_size = frame_size
        self.patch_size = patch_size
        if quantize not in (None, "w8a8"):
            raise ValueError(f"quantize must be None or 'w8a8', got {quantize!r}")
        self.quantize = quantize
        self._qbackbones = None  # {"face": qtree, "au": qtree} after calibrate
        # (T, Ta) length buckets: both time axes pad up to a bucket and the
        # true lengths travel as traced scalars (v_valid / au_valid) that gate
        # the biLSTMs, cross-attention keys and pools — one compile per bucket
        # pair, logits invariant to the pad width (au_face.py).
        self.buckets = tuple(sorted(buckets)) if buckets else None
        self._init_mesh(mesh)
        cfg = self._cfg()
        self._score = _shared_score_jit(("au_face", cfg), lambda: partial(_au_face_score, cfg))

    def _cfg(self) -> tuple:
        """Hashable tuple of everything the traced program reads from self."""
        return (
            tuple(self.frame_size) if self.frame_size is not None else None,
            tuple(self.patch_size) if self.patch_size is not None else None,
            self.compute_dtype,
        )

    @staticmethod
    def _prep(u8, size):
        x = u8.astype(jnp.float32) / 255.0
        if size is not None and x.shape[-3:-1] != tuple(size):
            flat = x.reshape((-1,) + x.shape[-3:])
            x = resize_bilinear(flat, size).reshape(x.shape[:-3] + tuple(size) + (3,))
        return x

    def calibrate(
        self, videos_u8: np.ndarray, au_patches_u8: np.ndarray, *, refine_passes: int = 0,
    ) -> None:
        """Fit the w8a8 face + AU ResNet-18 backbones on a representative
        batch (no-op when ``quantize=None``). ``refine_passes > 0`` applies
        the closed-form affine refinement to both streams (see
        VisualScorer.calibrate)."""
        if self.quantize is None:
            return
        from .fold import fold_resnet18_bn
        from .quant import (
            calibrate_resnet18_amax,
            quantize_folded_resnet18,
            refine_quantized_resnet18,
        )

        qb = {}
        for key, u8, size in (
            ("face", videos_u8, self.frame_size),
            ("au", au_patches_u8, self.patch_size),
        ):
            x = self._prep(np.asarray(u8), size)
            flat = x.reshape((-1,) + x.shape[-3:])
            folded = fold_resnet18_bn(
                self.params[f"{key}_backbone"], self.bn_state[f"{key}_backbone"]
            )
            amaxes = calibrate_resnet18_amax(folded, flat, compute_dtype=self.compute_dtype)
            qb[key] = quantize_folded_resnet18(folded, amaxes)
            if refine_passes:
                qb[key] = refine_quantized_resnet18(
                    qb[key], folded, flat, passes=refine_passes,
                    compute_dtype=self.compute_dtype,
                )
        self._qbackbones = (
            replicate(self.mesh, qb) if self.mesh is not None else jax.device_put(qb)
        )

    def _score_impl(self, params, bn_state, qbackbones, videos_u8, patches_u8, au_mask,
                    au_weight, v_valid, au_valid):
        return _au_face_score(self._cfg(), params, bn_state, qbackbones, videos_u8,
                              patches_u8, au_mask, au_weight, v_valid, au_valid)

    @staticmethod
    def _pad_time(arr: np.ndarray, Tb: int) -> np.ndarray:
        T = arr.shape[1]
        if Tb == T:
            return arr
        if Tb < T:
            return arr[:, :Tb]
        pad = np.zeros((arr.shape[0], Tb - T) + arr.shape[2:], arr.dtype)
        return np.concatenate([arr, pad], axis=1)

    def score(
        self,
        videos_u8: np.ndarray,
        au_patches_u8: np.ndarray,
        au_mask: Optional[np.ndarray] = None,
        au_weight: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """videos_u8: (B, T, H, W, 3); au_patches_u8: (B, Ta, A, h, w, 3)
        uint8 -> fake probabilities (B,)."""
        if self.quantize is not None and self._qbackbones is None:
            self.calibrate(videos_u8, au_patches_u8)  # implicit first batch
        B, T = videos_u8.shape[:2]
        Ta, A = au_patches_u8.shape[1:3]
        if au_mask is None:
            au_mask = np.ones((B, Ta, A), np.float32)
        if au_weight is None:
            au_weight = np.ones((B, Ta, A), np.float32)
        if self.buckets:
            Tb = bucket_length(T, self.buckets)
            Tab = bucket_length(Ta, self.buckets)
            videos_u8 = self._pad_time(videos_u8, Tb)
            au_patches_u8 = self._pad_time(au_patches_u8, Tab)
            au_mask = self._pad_time(au_mask, Tab)
            au_weight = self._pad_time(au_weight, Tab)
            T, Ta = min(T, Tb), min(Ta, Tab)
        arrays = (videos_u8, au_patches_u8, au_mask, au_weight)
        if self.mesh is not None:
            arrays = self._shard_batch_rows(arrays, B)
        out = self._score(
            self.params, self.bn_state, self._qbackbones, *arrays, jnp.int32(T), jnp.int32(Ta)
        )
        return np.asarray(out)[:B]


def _au_patch_score(cfg, params, bn_state, qbackbone, patches_u8, weights, lengths):
    """Pure scoring body for AUPatchScorer (shared-jit per cfg; see _cfg)."""
    from .quant import resnet18_quant_walk
    from .resnet_lstm import au_patch_classifier_apply

    patch_size, mask_padding, cdtype = cfg
    x = AUFaceScorer._prep(patches_u8, patch_size)
    backbone_fn = (
        None
        if qbackbone is None
        else lambda flat: resnet18_quant_walk(qbackbone, flat, quant=True, compute_dtype=cdtype)
    )
    logits, _ = au_patch_classifier_apply(
        params, bn_state, x, weights, lengths=lengths,
        mask_padding=mask_padding, train=False, compute_dtype=cdtype,
        backbone_fn=backbone_fn,
    )
    return jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))


class AUPatchScorer(_ShardedScoringMixin):
    """AU-patch ResNet-LSTM scoring (AUPatchResNetClassifierWithAUAttention)
    on raw uint8 patch stacks — plain sigmoid scores as in the reference eval
    loop (/root/reference/test_au_patch.py:473 via cli/test_au_patch.py).
    Completes serving coverage of all four model families.

    Note: the default ``mask_padding=True`` is the repo-wide quality mode; for
    caller-supplied ``lengths < T`` the reference's pad-consuming eval path is
    reproduced exactly only with ``mask_padding=False`` (fidelity mode).
    """

    _param_attrs = ("params", "bn_state")

    @classmethod
    def from_bundle(cls, path: str, hidden_dim: int = 128, lstm_hidden: int = 128, **kw):
        """Build from a train_au_patch {model[, state]} bundle."""
        from ..core.checkpoint import load_bundle, merge_params
        from .resnet_lstm import au_patch_classifier_init

        params, bn_state = au_patch_classifier_init(
            jax.random.PRNGKey(0), hidden_dim=hidden_dim, lstm_hidden=lstm_hidden
        )
        bundle = load_bundle(path)
        params = merge_params(params, bundle.get("model", bundle), strict=True)
        if isinstance(bundle, dict) and "state" in bundle:
            bn_state = merge_params(bn_state, bundle["state"], strict=False)
        return cls(params, bn_state, **kw)

    def __init__(
        self,
        params,
        bn_state,
        *,
        compute_dtype=jnp.bfloat16,
        patch_size: Optional[Tuple[int, int]] = None,
        mask_padding: bool = True,
        mesh=None,
        buckets: Optional[Sequence[int]] = None,
        quantize: Optional[str] = None,
    ):
        self.params = jax.device_put(params)
        self.bn_state = jax.device_put(bn_state)
        self.compute_dtype = compute_dtype
        self.patch_size = patch_size
        self.mask_padding = mask_padding
        if quantize not in (None, "w8a8"):
            raise ValueError(f"quantize must be None or 'w8a8', got {quantize!r}")
        self.quantize = quantize
        self._qbackbone = None
        # T buckets: pad the patch time axis up to a bucket; ``lengths`` gates
        # the biLSTM per sample (quality mode) or at the batch max (fidelity),
        # so scores match the unbucketed call — one compile per (T, A) bucket.
        self.buckets = tuple(sorted(buckets)) if buckets else None
        self._init_mesh(mesh)
        cfg = self._cfg()
        self._score = _shared_score_jit(("au_patch", cfg), lambda: partial(_au_patch_score, cfg))

    def _cfg(self) -> tuple:
        """Hashable tuple of everything the traced program reads from self."""
        return (
            tuple(self.patch_size) if self.patch_size is not None else None,
            bool(self.mask_padding), self.compute_dtype,
        )

    def _prep_patches(self, patches_u8):
        return AUFaceScorer._prep(patches_u8, self._cfg()[0])

    def calibrate(self, patches_u8: np.ndarray, *, refine_passes: int = 0) -> None:
        """Fit the w8a8 ResNet-18 backbone on a representative patch batch
        (no-op when ``quantize=None``). ``refine_passes > 0`` applies the
        closed-form affine refinement (see VisualScorer.calibrate)."""
        if self.quantize is None:
            return
        from .fold import fold_resnet18_bn
        from .quant import (
            calibrate_resnet18_amax,
            quantize_folded_resnet18,
            refine_quantized_resnet18,
        )

        x = self._prep_patches(np.asarray(patches_u8))
        flat = x.reshape((-1,) + x.shape[-3:])
        folded = fold_resnet18_bn(self.params["backbone"], self.bn_state["backbone"])
        amaxes = calibrate_resnet18_amax(folded, flat, compute_dtype=self.compute_dtype)
        qtree = quantize_folded_resnet18(folded, amaxes)
        if refine_passes:
            qtree = refine_quantized_resnet18(
                qtree, folded, flat, passes=refine_passes,
                compute_dtype=self.compute_dtype,
            )
        self._qbackbone = (
            replicate(self.mesh, qtree) if self.mesh is not None else jax.device_put(qtree)
        )

    def _score_impl(self, params, bn_state, qbackbone, patches_u8, weights, lengths):
        return _au_patch_score(self._cfg(), params, bn_state, qbackbone,
                               patches_u8, weights, lengths)

    def score(
        self,
        patches_u8: np.ndarray,
        au_weights: Optional[np.ndarray] = None,
        lengths: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """patches_u8: (B, T, A, h, w, 3) uint8 -> fake probabilities (B,)."""
        if self.quantize is not None and self._qbackbone is None:
            self.calibrate(patches_u8)  # implicit first-batch calibration
        B, T, A = patches_u8.shape[:3]
        if au_weights is None:
            au_weights = np.ones((B, T, A), np.float32)
        if lengths is None:
            lengths = np.full((B,), T, np.int32)
        if self.buckets:
            Tb = bucket_length(T, self.buckets)
            patches_u8 = AUFaceScorer._pad_time(patches_u8, Tb)
            au_weights = AUFaceScorer._pad_time(au_weights, Tb)
            lengths = np.minimum(lengths, Tb)
        arrays = (patches_u8, au_weights, lengths)
        if self.mesh is not None:
            arrays = self._shard_batch_rows(arrays, B)
        out = self._score(self.params, self.bn_state, self._qbackbone, *arrays)
        return np.asarray(out)[:B]


class AVScorer:
    """Fused audio-visual scoring: BASELINE config-5 at the serving level.

    Composes a :class:`VisualScorer` and an :class:`AudioScorer` over paired
    clips and returns the convex combination
    ``alpha * p_visual + (1 - alpha) * p_audio`` — the fusion rule of the
    batch eval harness (cli/test_av_fused.py). Each sub-engine keeps its own
    bucket dispatch / mesh / quantization configuration; construct them with
    whatever deployment levers apply and hand them here.

    The torch reference has no fused AV scoring at all — its modalities are
    scored by separate scripts (/root/reference/test_visual.py,
    train_audio.py eval loop); this engine and its AOT export
    (models/export.py::export_av) are beyond-parity capabilities.
    """

    def __init__(self, visual: "VisualScorer", audio: "AudioScorer", *, alpha: float = 0.5):
        if not 0.0 <= alpha <= 1.0:
            raise ValueError(f"alpha must be in [0, 1], got {alpha}")
        self.visual = visual
        self.audio = audio
        self.alpha = float(alpha)

    @classmethod
    def from_bundles(cls, visual_path: str, audio_path: str, *, alpha: float = 0.5,
                     hidden_dim: int = 128, audio_hidden: int = 512, **kw):
        """Build both engines from their train-CLI bundles; ``**kw`` (e.g.
        ``compute_dtype``, ``mesh``, ``mask_padding``) goes to both."""
        return cls(
            VisualScorer.from_bundle(visual_path, hidden_dim=hidden_dim, **kw),
            AudioScorer.from_bundle(audio_path, hidden_dim=audio_hidden, **kw),
            alpha=alpha,
        )

    def score(
        self,
        frames_u8: np.ndarray,
        waveforms: np.ndarray,
        lengths: Optional[np.ndarray] = None,
        frame_lengths: Optional[np.ndarray] = None,
        sample_lengths: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """(B, T, H, W, 3) uint8 frames + (B, samples) float waveforms of the
        SAME B clips -> fused fake probabilities (B,). ``sample_lengths``
        marks per-row true waveform lengths for mixed-duration batches (see
        :meth:`AudioScorer.score`)."""
        if frames_u8.shape[0] != waveforms.shape[0]:
            raise ValueError(
                f"paired modalities must share B: {frames_u8.shape[0]} vs {waveforms.shape[0]}"
            )
        p_v = self.visual.score(frames_u8, lengths)
        p_a = self.audio.score(waveforms, frame_lengths, sample_lengths=sample_lengths)
        return self.alpha * p_v + (1.0 - self.alpha) * p_a
