"""ResNet-18 feature extractor, TPU-native (NHWC/HWIO, functional pytrees).

The AU-patch classifier's per-patch backbone ("ResNetLSTM",
``/root/reference/test_au_patch.py:267-289``: ``model.feature_extractor`` ->
512-d features) implies a torchvision-style resnet18. Rebuilt here with the
same structure — 7x7 stride-2 stem, 3x3 stride-2 maxpool, four stages of two
BasicBlocks (64/128/256/512), global average pool — under this framework's
conventions: channel-last, explicit BN state, bf16 compute_dtype, one traced
graph. ``resnet18_params_from_torch`` ports torchvision state_dicts for
parity tests / checkpoint migration.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import (
    batch_norm,
    batch_norm_init,
    conv2d,
    conv2d_init,
    global_avg_pool,
    max_pool2d,
)

# (out_channels, stride) for the first block of each stage; 2 blocks per stage.
RESNET18_STAGES = ((64, 1), (128, 2), (256, 2), (512, 2))
FEATURE_DIM = 512


def _basic_block_init(rng, in_ch, out_ch, stride, dtype):
    k1, k2, k3 = jax.random.split(rng, 3)
    bn1_p, bn1_s = batch_norm_init(out_ch, dtype=dtype)
    bn2_p, bn2_s = batch_norm_init(out_ch, dtype=dtype)
    params = {
        "conv1": conv2d_init(k1, in_ch, out_ch, 3, dtype=dtype),
        "bn1": bn1_p,
        "conv2": conv2d_init(k2, out_ch, out_ch, 3, dtype=dtype),
        "bn2": bn2_p,
    }
    state = {"bn1": bn1_s, "bn2": bn2_s}
    if stride != 1 or in_ch != out_ch:
        dbn_p, dbn_s = batch_norm_init(out_ch, dtype=dtype)
        params["downsample"] = {"conv": conv2d_init(k3, in_ch, out_ch, 1, dtype=dtype), "bn": dbn_p}
        state["downsample"] = {"bn": dbn_s}
    return params, state


def _basic_block_apply(p, s, x, stride, *, train, compute_dtype):
    ns = {}
    h = conv2d(p["conv1"], x, stride=stride, padding=1, compute_dtype=compute_dtype)
    h, ns["bn1"] = batch_norm(p["bn1"], s["bn1"], h, train=train)
    h = jax.nn.relu(h)
    h = conv2d(p["conv2"], h, stride=1, padding=1, compute_dtype=compute_dtype)
    h, ns["bn2"] = batch_norm(p["bn2"], s["bn2"], h, train=train)
    if "downsample" in p:
        idn = conv2d(p["downsample"]["conv"], x, stride=stride, padding=0, compute_dtype=compute_dtype)
        idn, dbn = batch_norm(p["downsample"]["bn"], s["downsample"]["bn"], idn, train=train)
        ns["downsample"] = {"bn": dbn}
    else:
        idn = x
    return jax.nn.relu(h + idn), ns


def resnet18_init(rng, *, dtype=jnp.float32):
    keys = jax.random.split(rng, 1 + 2 * len(RESNET18_STAGES))
    bn_p, bn_s = batch_norm_init(64, dtype=dtype)
    params = {"conv1": conv2d_init(keys[0], 3, 64, 7, dtype=dtype), "bn1": bn_p, "stages": []}
    state = {"bn1": bn_s, "stages": []}
    in_ch = 64
    ki = 1
    for out_ch, stride in RESNET18_STAGES:
        stage_p, stage_s = [], []
        for b in range(2):
            bp, bs = _basic_block_init(keys[ki], in_ch, out_ch, stride if b == 0 else 1, dtype)
            stage_p.append(bp)
            stage_s.append(bs)
            in_ch = out_ch
            ki += 1
        params["stages"].append(stage_p)
        state["stages"].append(stage_s)
    return params, state


def resnet18_apply(params, state, x, *, train=False, compute_dtype=None) -> Tuple[jnp.ndarray, dict]:
    """(N, H, W, 3) -> (N, 512) pooled features + new BN state."""
    ns = {"stages": []}
    h = conv2d(params["conv1"], x, stride=2, padding=3, compute_dtype=compute_dtype)
    h, ns["bn1"] = batch_norm(params["bn1"], state["bn1"], h, train=train)
    h = jax.nn.relu(h)
    h = max_pool2d(h, 3, 2, 1)
    for (out_ch, stride), stage_p, stage_s in zip(RESNET18_STAGES, params["stages"], state["stages"]):
        stage_ns = []
        for b, (bp, bs) in enumerate(zip(stage_p, stage_s)):
            h, bns = _basic_block_apply(bp, bs, h, stride if b == 0 else 1, train=train, compute_dtype=compute_dtype)
            stage_ns.append(bns)
        ns["stages"].append(stage_ns)
    return global_avg_pool(h), ns


def resnet18_params_from_torch(sd):
    """Port a torchvision resnet18 state_dict (fc ignored)."""
    from ..utils.torch_port import conv_w, _bn  # noqa: local import to avoid cycle

    params = {"conv1": {"w": conv_w(sd["conv1.weight"])}, "stages": []}
    p_bn1, s_bn1 = _bn(sd, "bn1")
    params["bn1"] = p_bn1
    state = {"bn1": s_bn1, "stages": []}
    for li in range(1, 5):
        stage_p, stage_s = [], []
        for b in range(2):
            pre = f"layer{li}.{b}"
            bn1_p, bn1_s = _bn(sd, f"{pre}.bn1")
            bn2_p, bn2_s = _bn(sd, f"{pre}.bn2")
            bp = {
                "conv1": {"w": conv_w(sd[f"{pre}.conv1.weight"])},
                "bn1": bn1_p,
                "conv2": {"w": conv_w(sd[f"{pre}.conv2.weight"])},
                "bn2": bn2_p,
            }
            bs = {"bn1": bn1_s, "bn2": bn2_s}
            if f"{pre}.downsample.0.weight" in sd:
                dbn_p, dbn_s = _bn(sd, f"{pre}.downsample.1")
                bp["downsample"] = {"conv": {"w": conv_w(sd[f"{pre}.downsample.0.weight"])}, "bn": dbn_p}
                bs["downsample"] = {"bn": dbn_s}
            stage_p.append(bp)
            stage_s.append(bs)
        params["stages"].append(stage_p)
        state["stages"].append(stage_s)
    return params, state
