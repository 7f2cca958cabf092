"""Pallas kernel: a fused Xception middle-flow block, resident in VMEM.

The middle flow is 8 identical residual blocks of three
[ReLU -> depthwise3x3 -> pointwise1x1 -> BN] units at 16x16x728 (for 256^2
inputs) — 24 of the network's 36 separable convs and over half its FLOPs.
Under plain XLA every conv round-trips its activation through HBM; at these
shapes one image's whole block state (373 KB activation, ~3.2 MB bf16 of
pointwise weights) fits in VMEM, so this kernel executes an ENTIRE residual
block per grid step with zero intermediate HBM traffic.

Layout choices (TPU tiling):
* activations are (H*W, C): channels ride the 128-wide lane axis, spatial
  positions the sublane axis — the natural VPU/MXU layout;
* the 3x3 depthwise conv is 9 shifted row-slices of a zero-margined scratch
  copy, each an (HW, C) fused multiply-add on the VPU. Horizontal taps mask
  the rows that would wrap across image columns;
* the pointwise conv is one (HW, C) x (C, C) MXU matmul per unit, bf16 in /
  fp32 accumulate, with the folded-BN bias added in the epilogue.

BN is pre-folded into (w_pw, b) — this is the inference/serving path
(training keeps the XLA path with live batch statistics).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(x_ref, dw_ref, pw_ref, b_ref, out_ref, pad_ref, acc_ref, *, H, W, C, reps, ips):
    # x_ref/out_ref: (ips, HW, C); dw_ref: (reps, 9, C); pw_ref: (reps, C, C);
    # b_ref: (reps, C); pad_ref scratch: (ips, HW + 2W + 2, C) bf16;
    # acc_ref scratch: (ips * HW, C) f32.
    HW = H * W
    O = W + 1  # offset of row 0 inside each image's zero-margined scratch

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0)
    wpos = row_ids % W
    m_left = (wpos != 0).astype(jnp.float32)  # dx-shift -1 invalid at w == 0
    m_right = (wpos != W - 1).astype(jnp.float32)  # dx-shift +1 invalid at w == W-1

    h = x_ref[:].astype(jnp.float32)  # (ips, HW, C)
    for r in range(reps):
        h = jnp.maximum(h, 0.0)
        pad_ref[:] = jnp.zeros((ips, HW + 2 * W + 2, C), jnp.bfloat16)
        pad_ref[:, O : O + HW, :] = h.astype(jnp.bfloat16)
        # per-image depthwise (9 shifted VPU FMAs), accumulated fp32 into the
        # shared (ips*HW, C) buffer that feeds one large MXU matmul
        for k in range(ips):
            acc = jnp.zeros((HW, C), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    start = dy * W + dx  # = O + (dy-1)*W + (dx-1)
                    tap = dw_ref[r, dy * 3 + dx, :].astype(jnp.float32)
                    contrib = pad_ref[k, start : start + HW, :].astype(jnp.float32) * tap[None, :]
                    if dx == 0:
                        contrib = contrib * m_left
                    elif dx == 2:
                        contrib = contrib * m_right
                    acc = acc + contrib
            acc_ref[k * HW : (k + 1) * HW, :] = acc
        out2 = (
            jnp.dot(
                acc_ref[:].astype(jnp.bfloat16),
                pw_ref[r].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            + b_ref[r][None, :].astype(jnp.float32)
        )
        h = out2.reshape(ips, HW, C)
    out_ref[:] = (h + x_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret", "images_per_step"))
def middle_block_pallas(x, dw, pw, b, *, interpret: bool = False, images_per_step: int = 2):
    """Fused middle-flow residual block.

    Args:
        x: (B, H, W, C) activations (bf16 or f32).
        dw: (reps, 9, C) depthwise taps, tap index = dy*3 + dx.
        pw: (reps, C, C) BN-folded pointwise weights.
        b: (reps, C) folded biases.
        images_per_step: images packed per grid step — larger packs give the
            pointwise matmul more rows (M = ips*H*W) for MXU efficiency at the
            cost of VMEM; must divide the batch (auto-reduced otherwise).
    Returns (B, H, W, C), dtype of x.
    """
    B, H, W, C = x.shape
    reps, HW = dw.shape[0], H * W
    ips = images_per_step
    while B % ips:
        ips //= 2
    ips = max(ips, 1)
    x2 = x.reshape(B, HW, C)
    kernel = partial(_block_kernel, H=H, W=W, C=C, reps=reps, ips=ips)
    out = pl.pallas_call(
        kernel,
        grid=(B // ips,),
        in_specs=[
            pl.BlockSpec((ips, HW, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((reps, 9, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((reps, C, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((reps, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ips, HW, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((ips, HW + 2 * W + 2, C), jnp.bfloat16),
            pltpu.VMEM((ips * HW, C), jnp.float32),
        ],
        interpret=interpret,
    )(x2, dw, pw, b)
    return out.reshape(B, H, W, C)


def _block_kernel_v2(
    x_ref, dw_ref, pw_ref, b_ref, out_ref, pad_ref,
    *, H, W, C, reps, ips, acc_dtype, pad_dtype, per_image_dot,
):
    """Round-2 rewrite of ``_block_kernel`` (same math, leaner data movement).

    Measured changes vs v1 (PERF.md round 2):
    * the zero margin of the padded scratch is written ONCE per grid-step
      pass (scratch persists; only the interior changes per rep) instead of a
      full (ips, HW+2W+2, C) memset every rep;
    * the depthwise taps accumulate directly as VALUES (no fp32 ``acc_ref``
      VMEM staging round-trip) and feed the MXU matmul straight;
    * tap accumulation dtype is a parameter: bf16 halves the VPU/spill
      traffic (serving default), fp32 reproduces v1 bit-behavior;
    * inter-rep activations round-trip as bf16 (relu+cast fused into the
      matmul epilogue) rather than fp32 values;
    * weights arrive pre-cast (dw/pw bf16) — no in-kernel weight conversion.
    """
    HW = H * W
    O = W + 1

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0)
    wpos = row_ids % W
    m_left = (wpos != 0).astype(acc_dtype)
    m_right = (wpos != W - 1).astype(acc_dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():  # zero margins once; interior is overwritten every rep
        pad_ref[:, :O, :] = jnp.zeros((ips, O, C), pad_dtype)
        pad_ref[:, O + HW :, :] = jnp.zeros((ips, W + 1, C), pad_dtype)

    def dw_taps(r, src):
        """src: (n, HW, C) or (HW, C) slice view base — returns depthwise sum."""
        acc = None
        for dy in range(3):
            for dx in range(3):
                start = dy * W + dx
                tap = dw_ref[r, dy * 3 + dx, :].astype(acc_dtype)
                contrib = src(start).astype(acc_dtype) * tap
                if dx == 0:
                    contrib = contrib * m_left
                elif dx == 2:
                    contrib = contrib * m_right
                acc = contrib if acc is None else acc + contrib
        return acc

    interior = jnp.maximum(x_ref[:], 0).astype(pad_dtype)  # (ips, HW, C)
    for r in range(reps):
        pad_ref[:, O : O + HW, :] = interior
        if per_image_dot:
            # separate dots per image: image k+1's depthwise (VPU) can overlap
            # image k's pointwise (MXU) in the Mosaic schedule
            outs = []
            for k in range(ips):
                acc = dw_taps(r, lambda s, k=k: pad_ref[k, s : s + HW, :])
                outs.append(
                    jnp.dot(
                        acc.astype(jnp.bfloat16), pw_ref[r], preferred_element_type=jnp.float32
                    )
                )
            out2 = jnp.stack(outs) + b_ref[r][None, None, :]
        else:
            acc = dw_taps(r, lambda s: pad_ref[:, s : s + HW, :])
            out2 = (
                jnp.dot(
                    acc.reshape(ips * HW, C).astype(jnp.bfloat16),
                    pw_ref[r],
                    preferred_element_type=jnp.float32,
                )
                + b_ref[r][None, :]
            ).reshape(ips, HW, C)
        if r + 1 < reps:
            interior = jnp.maximum(out2, 0.0).astype(pad_dtype).reshape(ips, HW, C)
    out_ref[:] = (out2.reshape(ips, HW, C) + x_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret", "images_per_step", "precise", "pad_fp32", "per_image_dot"))
def middle_block_pallas_v2(
    x, dw, pw, b, *, interpret: bool = False, images_per_step: int = 2, precise: bool = False,
    pad_fp32: bool = False, per_image_dot: bool = False,
):
    """Leaner fused middle-flow residual block (see ``_block_kernel_v2``).

    Same contract as :func:`middle_block_pallas`. ``precise=True`` accumulates
    the depthwise taps in fp32 (v1 behavior); the default bf16 accumulation
    is the serving path (inference-grade: |rel err| ~1e-2 on the block output,
    indistinguishable at the net's sigmoid/argmax outputs — tests pin this).
    """
    B, H, W, C = x.shape
    reps, HW = dw.shape[0], H * W
    ips = images_per_step
    while B % ips:
        ips //= 2
    ips = max(ips, 1)
    x2 = x.reshape(B, HW, C)
    acc_dtype = jnp.float32 if precise else jnp.bfloat16
    pad_dtype = jnp.float32 if pad_fp32 else jnp.bfloat16
    kernel = partial(
        _block_kernel_v2, H=H, W=W, C=C, reps=reps, ips=ips, acc_dtype=acc_dtype,
        pad_dtype=pad_dtype, per_image_dot=per_image_dot,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // ips,),
        in_specs=[
            pl.BlockSpec((ips, HW, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((reps, 9, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((reps, C, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((reps, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ips, HW, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((ips, HW + 2 * W + 2, C), pad_dtype),
        ],
        interpret=interpret,
    )(x2, dw.astype(jnp.float32), pw.astype(jnp.bfloat16), b.astype(jnp.float32))
    return out.reshape(B, H, W, C)


def pack_middle_block(folded_block):
    """One ``fold_xception_bn(...)['blocks'][i]`` (middle-flow) ->
    (dw (reps, 9, C), pw (reps, C, C), b (reps, C))."""
    dws, pws, bs = [], [], []
    for unit in folded_block["units"]:
        dw = unit["depthwise"]["w"]  # (3, 3, 1, C)
        dws.append(dw[:, :, 0, :].reshape(9, dw.shape[-1]))
        pws.append(unit["pointwise"]["w"][0, 0])  # (1,1,C,C) -> (C,C)
        bs.append(unit["pointwise"]["b"])
    return (
        jnp.stack(dws).astype(jnp.float32),
        jnp.stack(pws),
        jnp.stack(bs).astype(jnp.float32),
    )


def is_middle_block(folded_block) -> bool:
    """True for stride-1, no-projection blocks (the 8 middle-flow blocks)."""
    if "skip" in folded_block:
        return False
    units = folded_block["units"]
    c = units[0]["pointwise"]["w"].shape[-1]
    return all(
        u["pointwise"]["w"].shape[2] == c and u["pointwise"]["w"].shape[3] == c for u in units
    )
