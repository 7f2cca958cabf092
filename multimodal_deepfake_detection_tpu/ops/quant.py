"""int8 post-training-quantization primitives (w8a8 serving path).

TPU MXUs execute int8xint8->int32 matmuls/convs at 2x the bf16 rate
(v5e: 394 TOPS vs 197 TFLOP/s), so a quantized serving path has a 2x
compute ceiling over the bf16 one on the conv-dominated Xception backbone.
The reference has no quantization at all (pure fp torch,
/root/reference/Xception.py); this is a framework capability beyond parity,
opt-in per engine, with the accuracy contract delegated to calibration +
tests rather than bit-parity.

Scheme (standard symmetric PTQ):

* **weights**: per-output-channel symmetric int8 — ``s_w[o] = amax(|w[..., o]|)/127``,
  ``w_q = round(w / s_w)``. Per-channel keeps the quantization error of the
  BN-folded kernels (whose per-channel magnitudes vary by the folded
  ``scale/sqrt(var)``) independent across channels.
* **activations**: per-tensor symmetric int8 with a *static* calibrated scale
  (amax over a calibration batch, recorded per conv input site). Static
  scales keep the quantize op a cheap elementwise multiply (no data-dependent
  reductions in the serving path).
* **compute**: int8 conv with ``preferred_element_type=int32`` (exact —
  3x3x728 dot products of +/-127 values stay far inside int32), then one
  fused dequant epilogue ``y_f32 = y_i32 * (s_in * s_w) + b``.

MXU-bound convs (regular + pointwise) are always quantized. Depthwise 3x3s
are VPU-bound (no int8 compute speedup, ~3% of FLOPs) but quantizing them
too (``depthwise_conv2d_w8a8``, the shipped ``quant_depthwise=True`` default)
keeps the activation chain int8 end-to-end through each sepconv unit, halving
the HBM traffic of the bandwidth-bound entry blocks — measured faster
(PERF.md round-3 w8a8 section).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_QMAX = 127.0


def absmax_scale(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Symmetric int8 scale: amax(|x|)/127 (floored away from zero)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis)
    return jnp.maximum(amax, 1e-12) / _QMAX


def quantize(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Round-to-nearest symmetric int8."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)


def quantize_weight(w: jnp.ndarray):
    """Per-output-channel (last axis) int8 weight quantization.

    Returns (w_q int8, s_w fp32[O]).
    """
    s_w = absmax_scale(w, axis=tuple(range(w.ndim - 1)))
    return quantize(w, s_w), s_w


def conv2d_w8a8(
    qparams: dict,
    x: jnp.ndarray,
    *,
    stride=1,
    padding=0,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """NHWC int8 convolution with fused dequant epilogue.

    ``qparams``: {"w_q": int8 HWIO, "s_w": fp32[O], "s_in": fp32 scalar or
    fp32[Ci], "b": fp32[O] (optional), "s_dq": fp32 scalar (required when
    ``s_in`` is per-channel)}. ``x`` is a float tensor; it is quantized with
    the static calibrated ``s_in`` on the way in (one elementwise op that XLA
    fuses into the producer — a (Ci,) ``s_in`` broadcasts over the lane axis
    at the same VPU cost as a scalar).

    Per-channel ``s_in`` comes from activation-scale folding
    (models/quant.py::quantize_folded_xception act_scales="channel"): the
    per-input-channel part of the scale is folded into the weights before
    THEY are quantized, so the int8 dot needs only the remaining scalar
    ``s_dq`` in its dequant epilogue.
    """
    s_in = qparams["s_in"]
    s_dq = qparams.get("s_dq", s_in)
    xq = quantize(x, s_in)
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    y = jax.lax.conv_general_dilated(
        xq,
        qparams["w_q"],
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (s_dq * qparams["s_w"])
    if "b" in qparams:
        out = out + qparams["b"]
    return out.astype(out_dtype)


def depthwise_conv2d_w8a8(
    qparams: dict,
    x: jnp.ndarray,
    *,
    padding=1,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """NHWC int8 depthwise (groups=C) 3x3 with fused dequant epilogue.

    Depthwise FLOPs are negligible, but quantizing them keeps the activation
    chain int8 *end-to-end* through a sepconv unit — the entry blocks are
    HBM-bandwidth bound (PERF.md), so materializing the big 125^2/63^2
    tensors at 1 byte instead of 2 is the actual win this op buys.

    ``s_in`` may be per-channel (see conv2d_w8a8): depthwise maps input
    channel c to output channel c, so the fold lands on the OUTPUT-channel
    axis and the per-output ``s_w`` absorbs it; ``s_dq`` carries the scalar
    part.
    """
    s_in = qparams["s_in"]
    s_dq = qparams.get("s_dq", s_in)
    xq = quantize(x, s_in)
    c = x.shape[-1]
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    N, H, W, _ = x.shape
    if H * W <= 16:
        # Degenerate-spatial escape hatch (measured, round 5): the XLA-TPU
        # int8 depthwise emitter produces a BATCH-CONSTANT result for tiny
        # spatial dims (hit at 1x1 — a 32^2 micro input's exit flow, conv4
        # C=1536) when compiled inside a large program, while the identical
        # op standalone is exact. An unrolled integer shift-add is the same
        # exact math without the conv emitter, and at <=16 positions it costs
        # a handful of VPU multiply-adds.
        kh, kw = qparams["w_q"].shape[:2]
        xi = jnp.pad(xq.astype(jnp.int32), ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        w = qparams["w_q"].astype(jnp.int32)
        y = sum(
            xi[:, dy : dy + H, dx : dx + W, :] * w[dy, dx, 0, :][None, None, None, :]
            for dy in range(kh)
            for dx in range(kw)
        )
    else:
        y = jax.lax.conv_general_dilated(
            xq,
            qparams["w_q"],
            window_strides=(1, 1),
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            preferred_element_type=jnp.int32,
        )
    return (y.astype(jnp.float32) * (s_dq * qparams["s_w"])).astype(out_dtype)


def dequant_error(w: jnp.ndarray) -> float:
    """Max abs reconstruction error of per-channel int8 on ``w`` (diagnostics)."""
    w_q, s_w = quantize_weight(w)
    return float(jnp.max(jnp.abs(w_q.astype(jnp.float32) * s_w - w.astype(jnp.float32))))
