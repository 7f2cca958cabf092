"""Inference-time batch-norm folding for Xception.

In eval mode every BN is an affine map with fixed (running) statistics, so it
folds exactly into the preceding convolution:

    w' = w * scale/sqrt(var+eps)        (per output channel)
    b' = bias - mean * scale/sqrt(var+eps)

This removes all 38 BN ops (and their fp32 cast round-trips through HBM) from
the serving path — the convs land on the MXU with their epilogue reduced to a
bias-add + ReLU that XLA fuses in. Numerically identical to the unfolded
eval-mode forward at fp32 (tested in tests/test_fold.py); used by bench.py
and the eval CLIs. The train path keeps live BN.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, global_avg_pool, linear, max_pool2d
from .xception import XCEPTION_BLOCK_SPECS

_EPS = 1e-5


def _fold(conv_params, bn_params, bn_state):
    scale_eff = bn_params["scale"].astype(jnp.float32) * jax.lax.rsqrt(bn_state["var"] + _EPS)
    w = conv_params["w"].astype(jnp.float32) * scale_eff  # broadcast over O (last axis)
    b = bn_params["bias"].astype(jnp.float32) - bn_state["mean"] * scale_eff
    return {"w": w, "b": b}


def _fold_sep(sep_params, bn_params, bn_state):
    return {
        "depthwise": {"w": sep_params["depthwise"]["w"]},
        "pointwise": _fold(sep_params["pointwise"], bn_params, bn_state),
    }


def fold_xception_bn(params, state):
    """Fold (params, bn_state) into a BN-free inference param tree."""
    out = {
        "conv1": _fold(params["conv1"], params["bn1"], state["bn1"]),
        "conv2": _fold(params["conv2"], params["bn2"], state["bn2"]),
        "blocks": [],
        "conv3": _fold_sep(params["conv3"], params["bn3"], state["bn3"]),
        "conv4": _fold_sep(params["conv4"], params["bn4"], state["bn4"]),
    }
    for bp, bs in zip(params["blocks"], state["blocks"]):
        fb = {
            "units": [
                _fold_sep(u["sep"], u["bn"], s["bn"])
                for u, s in zip(bp["units"], bs["units"])
            ]
        }
        if "skip" in bp:
            fb["skip"] = _fold(bp["skip"]["conv"], bp["skip"]["bn"], bs["skip"]["bn"])
        out["blocks"].append(fb)
    if "fc" in params:
        out["fc"] = params["fc"]
    return out


def fold_resnet18_bn(params, state):
    """Fold the AU-stream ResNet-18 (models/resnet.py) into a BN-free tree.

    Same affine-fold identity as :func:`fold_xception_bn`; used by the
    quantized AU serving path (models/quant.py). Exactness pinned in
    tests/test_fold.py.
    """
    out = {"conv1": _fold(params["conv1"], params["bn1"], state["bn1"]), "stages": []}
    for stage_p, stage_s in zip(params["stages"], state["stages"]):
        stage = []
        for bp, bs in zip(stage_p, stage_s):
            fb = {
                "conv1": _fold(bp["conv1"], bp["bn1"], bs["bn1"]),
                "conv2": _fold(bp["conv2"], bp["bn2"], bs["bn2"]),
            }
            if "downsample" in bp:
                fb["downsample"] = _fold(
                    bp["downsample"]["conv"], bp["downsample"]["bn"], bs["downsample"]["bn"]
                )
            stage.append(fb)
        out["stages"].append(stage)
    return out


def folded_resnet18_apply(params, x, *, compute_dtype=None):
    """BN-free ResNet-18 forward; mirrors models.resnet.resnet18_apply eval."""
    from .resnet import RESNET18_STAGES

    h = jax.nn.relu(conv2d(params["conv1"], x, stride=2, padding=3, compute_dtype=compute_dtype))
    h = max_pool2d(h, 3, 2, 1)
    for (_out_ch, stride), stage in zip(RESNET18_STAGES, params["stages"]):
        for b, bp in enumerate(stage):
            s = stride if b == 0 else 1
            r = jax.nn.relu(conv2d(bp["conv1"], h, stride=s, padding=1, compute_dtype=compute_dtype))
            r = conv2d(bp["conv2"], r, stride=1, padding=1, compute_dtype=compute_dtype)
            idn = (
                conv2d(bp["downsample"], h, stride=s, padding=0, compute_dtype=compute_dtype)
                if "downsample" in bp
                else h
            )
            h = jax.nn.relu(r + idn)
    return global_avg_pool(h)


def _sep_apply(p, x, compute_dtype):
    c = x.shape[-1]
    x = conv2d({"w": p["depthwise"]["w"]}, x, stride=1, padding=1, groups=c, compute_dtype=compute_dtype)
    return conv2d(p["pointwise"], x, stride=1, padding=0, compute_dtype=compute_dtype)


def folded_xception_apply(
    params, x, *, compute_dtype=None, features_only: bool = False, use_pallas: bool = False,
    pallas_interpret: bool = False, upto: str = None,
):
    """BN-free forward; mirrors models.xception.xception_apply eval mode.

    ``use_pallas=True`` routes the 8 middle-flow residual blocks through the
    fused VMEM-resident Pallas kernel (ops/pallas/sepconv_block.py).

    ``upto`` ("stem", "block<k>", or "exit") early-returns that stage's
    (densified) output — the in-situ timing harness (tools/netbench.py) times
    truncated prefixes of the EXACT serving forward, so it cannot drift from
    the path it claims to measure.
    """
    if use_pallas:
        import os as _os

        from ..ops.pallas.sepconv_block import is_middle_block, middle_block_pallas_v2, pack_middle_block
        from ..ops.pallas.sepconv_entry import (
            WHOLE_IMAGE_MAX_ROWS,
            entry_block_pallas,
            is_fusable_entry_block,
            pack_entry_block,
        )

        # position-major middle flow (ops/pallas/sepconv_pos.py): transpose
        # the 16^2 trunk once, run the whole middle run in (POS, B, C).
        # DEFAULT by in-situ measurement (tools/netbench.py, PERF.md r3):
        # net 37.04 ms vs 38.24 at B=256 — every depthwise tap is an aligned
        # (BT, C) tile-plane row offset. MDFD_MIDDLE_LAYOUT=hw restores the
        # image-major v2 kernel.
        use_pos = _os.environ.get("MDFD_MIDDLE_LAYOUT", "pos") == "pos"
        if use_pos:
            from ..ops.pallas.sepconv_pos import (
                from_pos_layout,
                middle_block_pos_pallas,
                to_pos_layout,
            )
    else:
        use_pos = False
    pos_hw = None  # not None => h is (H*W, B, C) position-major

    h = jax.nn.relu(conv2d(params["conv1"], x, stride=2, padding=0, compute_dtype=compute_dtype))
    h = jax.nn.relu(conv2d(params["conv2"], h, stride=1, padding=0, compute_dtype=compute_dtype))
    if upto == "stem":
        return h

    # vw != 0 means h is a fused entry block's storage-padded output whose
    # valid columns are [:vw]; consecutive fused blocks chain WITHOUT an XLA
    # slice-materialization pass between the two pallas calls
    vw = 0
    for k, (spec, bp) in enumerate(zip(XCEPTION_BLOCK_SPECS, params["blocks"])):
        _, _, _, stride, start_with_relu, _ = spec
        # the fused middle kernels are designed for the production 16^2 trunk
        # (pad-margin/row-offset schemes need W >= the 3x3 halo); degenerate
        # trunks (tiny eval inputs -> W < 4) route to XLA, which is also what
        # the perf argument would pick there (measured r5: the pos kernel's
        # scores drift wildly at W=2)
        mid_ok = pos_hw is not None or (h.shape[1] >= 4 and h.shape[2] >= 4)
        is_pos_middle = (
            use_pos and mid_ok and stride == 1 and start_with_relu and is_middle_block(bp)
        )
        if pos_hw is not None and not is_pos_middle:  # leaving the pos run
            h = from_pos_layout(h, *pos_hw)
            pos_hw = None
        logical_w = vw or h.shape[2]
        if use_pallas and stride == 2 and is_fusable_entry_block(bp, (0, h.shape[1], logical_w)):
            # whole-block fusion: [relu] -> sepconv pair -> maxpool3x3/s2 ->
            # + skip conv, one kernel, one HBM read of h, pooled-only write
            # (ops/pallas/sepconv_entry[_striped].py; measured in PERF.md r2)
            if h.shape[1] > WHOLE_IMAGE_MAX_ROWS:  # too tall for whole-image VMEM: striped
                from ..ops.pallas.sepconv_entry_striped import entry_block_striped_pallas

                if vw:  # striped kernel takes dense input
                    h = h[:, :, :vw, :]
                    vw = 0
                h = entry_block_striped_pallas(
                    h, *pack_entry_block(bp), leading_relu0=start_with_relu,
                    interpret=pallas_interpret,
                ).astype(h.dtype)
                # the striped kernel's storage pad is NOT the whole-image
                # kernel's bordered valid_w layout — densify here so a
                # following fused block (e.g. MDFD_ENTRY_FUSE_H=125,63,32)
                # sees dense input instead of mis-shaped borders
                vw_s = (logical_w + 1) // 2
                if h.shape[2] != vw_s:
                    h = h[:, :, :vw_s, :]
                if upto == f"block{k + 1}":
                    return h
                continue
            else:
                h = entry_block_pallas(
                    h, *pack_entry_block(bp), leading_relu0=start_with_relu,
                    valid_w=vw, interpret=pallas_interpret,
                ).astype(h.dtype)
            vw = (logical_w + 1) // 2
            if upto == f"block{k + 1}":
                return h[:, :, :vw, :]
            continue
        if vw:  # densify for a non-fused consumer
            h = h[:, :, :vw, :]
            vw = 0
        if use_pallas and mid_ok and stride == 1 and start_with_relu and is_middle_block(bp):
            dw, pw, b = pack_middle_block(bp)
            if use_pos:
                if pos_hw is None:
                    pos_hw = (h.shape[1], h.shape[2])
                    h = to_pos_layout(h)
                h = middle_block_pos_pallas(h, dw, pw, b, interpret=pallas_interpret)
            else:
                # v2 kernel, measured-best config (tools/microbench.py middle,
                # PERF.md round 2): fp32 tap accumulation (bit-identical to v1
                # and FASTER than bf16 accumulation on the fp32-native VPU),
                # per-image dots for VPU/MXU overlap, 4 images per grid step.
                h = middle_block_pallas_v2(
                    h, dw, pw, b, interpret=pallas_interpret,
                    images_per_step=4, precise=True, per_image_dot=True,
                )
            if upto == f"block{k + 1}":
                return from_pos_layout(h, *pos_hw) if pos_hw is not None else h
            continue
        inp = h
        # NOTE: two Pallas alternatives for these entry/exit units were built,
        # hardware-validated, and measured SLOWER than XLA at B=256 @ 256^2
        # (PERF.md): per-unit fusion 44.0 ms/net, streamed pair fusion with
        # manual HBM DMA 79.7 ms/net, vs 39.4 ms with XLA here + Pallas middle
        # flow. XLA's conv pipeline wins at these bandwidth-bound shapes, so
        # entry/exit stay on XLA (kernels remain in ops/pallas for shapes
        # where they pay, and as the base for a double-buffered variant).
        for i, unit in enumerate(bp["units"]):
            if i > 0 or start_with_relu:
                h = jax.nn.relu(h)
            h = _sep_apply(unit, h, compute_dtype)
        if stride != 1:
            h = max_pool2d(h, 3, stride, 1)
        if "skip" in bp:
            skip = conv2d(bp["skip"], inp, stride=stride, padding=0, compute_dtype=compute_dtype)
        else:
            skip = inp
        h = h + skip
        if upto == f"block{k + 1}":
            return h

    if vw:
        h = h[:, :, :vw, :]
    h = jax.nn.relu(_sep_apply(params["conv3"], h, compute_dtype))
    h = jax.nn.relu(_sep_apply(params["conv4"], h, compute_dtype))
    if upto == "exit":
        return h
    feats = global_avg_pool(h)
    if features_only or "fc" not in params:
        return feats
    return linear(params["fc"], feats, compute_dtype=compute_dtype)
