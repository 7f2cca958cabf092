"""Xception backbone (Chollet 2017), TPU-native.

Re-designed from the behavior of the reference implementation
(``/root/reference/Xception.py:103-201``): entry flow (conv1/conv2 + 3
strided residual blocks), middle flow (8 x 728-channel blocks), exit flow
(block12 + two separable convs to 1536/2048), global average pool, fc.

Differences from the reference are deliberate TPU choices, not omissions:

* NHWC activations / HWIO kernels (MXU-native layouts; the reference is NCHW).
* The whole block structure is a data-driven spec list walked by `lax`-traced
  Python — one traced graph, no module objects, so XLA sees a single fusable
  program for all 36 convolutions.
* Explicit functional params/state pytrees: `grad`, `jit`, `pjit`, EMA and the
  torch-checkpoint importer all operate on plain dicts.
* bf16 compute / fp32 BN statistics via the ``compute_dtype`` argument.

Block semantics match the reference exactly (``/root/reference/Xception.py:50-99``):
each block is `reps` units of [ReLU -> sepconv3x3 -> BN] with an optional
leading-ReLU drop, a stride-2 3x3 max-pool tail when strided, and a 1x1-conv+BN
projection skip whenever channels or stride change.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BLOCK_BARRIER = os.environ.get("MDFD_BLOCK_BARRIER", "0") == "1"

from ..ops.conv import (
    batch_norm,
    batch_norm_init,
    conv2d,
    conv2d_init,
    global_avg_pool,
    linear,
    linear_init,
    max_pool2d,
    separable_conv2d,
    separable_conv2d_init,
)

# (in_ch, out_ch, reps, stride, start_with_relu, grow_first)
# Entry: blocks 0-2; middle: 3-10; exit: 11.  /root/reference/Xception.py:126-140
XCEPTION_BLOCK_SPECS = (
    (64, 128, 2, 2, False, True),
    (128, 256, 2, 2, True, True),
    (256, 728, 2, 2, True, True),
) + ((728, 728, 3, 1, True, True),) * 8 + (
    (728, 1024, 2, 2, True, False),
)


def _block_unit_channels(spec):
    """Per-rep (in, out) channel pairs for one block's separable convs."""
    in_ch, out_ch, reps, _, _, grow_first = spec
    if grow_first:
        return [(in_ch, out_ch)] + [(out_ch, out_ch)] * (reps - 1)
    return [(in_ch, in_ch)] * (reps - 1) + [(in_ch, out_ch)]


def _block_init(rng, spec, dtype):
    in_ch, out_ch, reps, stride, _, _ = spec
    units = _block_unit_channels(spec)
    keys = jax.random.split(rng, len(units) + 1)
    params, state = {"units": []}, {"units": []}
    for k, (ci, co) in zip(keys[:-1], units):
        bn_p, bn_s = batch_norm_init(co, dtype=dtype)
        params["units"].append({"sep": separable_conv2d_init(k, ci, co, 3, dtype=dtype), "bn": bn_p})
        state["units"].append({"bn": bn_s})
    if out_ch != in_ch or stride != 1:
        bn_p, bn_s = batch_norm_init(out_ch, dtype=dtype)
        params["skip"] = {"conv": conv2d_init(keys[-1], in_ch, out_ch, 1, dtype=dtype), "bn": bn_p}
        state["skip"] = {"bn": bn_s}
    return params, state


def _block_apply(params, state, spec, x, *, train, compute_dtype):
    _, _, _, stride, start_with_relu, _ = spec
    new_state = {"units": []}
    h = x
    for i, (unit_p, unit_s) in enumerate(zip(params["units"], state["units"])):
        if i > 0 or start_with_relu:
            h = jax.nn.relu(h)
        h = separable_conv2d(unit_p["sep"], h, stride=1, padding=1, compute_dtype=compute_dtype)
        h, bn_s = batch_norm(unit_p["bn"], unit_s["bn"], h, train=train)
        new_state["units"].append({"bn": bn_s})
    if stride != 1:
        h = max_pool2d(h, 3, stride, 1)
    if "skip" in params:
        skip = conv2d(params["skip"]["conv"], x, stride=stride, padding=0, compute_dtype=compute_dtype)
        skip, bn_s = batch_norm(params["skip"]["bn"], state["skip"]["bn"], skip, train=train)
        new_state["skip"] = {"bn": bn_s}
    else:
        skip = x
    return h + skip, new_state


def xception_init(rng, *, num_classes: Optional[int] = 1000, dtype=jnp.float32):
    """Initialize Xception params and BN state.

    ``num_classes=None`` omits the fc head — the frozen-feature-extractor
    configuration both LSTM heads use (``fc = nn.Identity()``,
    ``/root/reference/XceptionLSTMV.py:13``).
    """
    keys = jax.random.split(rng, len(XCEPTION_BLOCK_SPECS) + 5)
    params, state = {}, {}

    params["conv1"] = conv2d_init(keys[0], 3, 32, 3, dtype=dtype)
    params["bn1"], state["bn1"] = batch_norm_init(32, dtype=dtype)
    params["conv2"] = conv2d_init(keys[1], 32, 64, 3, dtype=dtype)
    params["bn2"], state["bn2"] = batch_norm_init(64, dtype=dtype)

    params["blocks"], state["blocks"] = [], []
    for k, spec in zip(keys[2 : 2 + len(XCEPTION_BLOCK_SPECS)], XCEPTION_BLOCK_SPECS):
        bp, bs = _block_init(k, spec, dtype)
        params["blocks"].append(bp)
        state["blocks"].append(bs)

    params["conv3"] = separable_conv2d_init(keys[-3], 1024, 1536, 3, dtype=dtype)
    params["bn3"], state["bn3"] = batch_norm_init(1536, dtype=dtype)
    params["conv4"] = separable_conv2d_init(keys[-2], 1536, 2048, 3, dtype=dtype)
    params["bn4"], state["bn4"] = batch_norm_init(2048, dtype=dtype)

    if num_classes is not None:
        params["fc"] = linear_init(keys[-1], 2048, num_classes, dtype=dtype)
    return params, state


def xception_apply(
    params,
    state,
    x: jnp.ndarray,
    *,
    train: bool = False,
    compute_dtype=None,
    features_only: bool = False,
    upto: Optional[str] = None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, dict]:
    """Forward pass on NHWC images.

    Returns ``(outputs, new_bn_state)``. ``features_only`` (or a params tree
    without ``fc``) yields 2048-d pooled features — the per-frame embedding the
    temporal heads consume. Stride/padding trace the reference layer-by-layer
    (``/root/reference/Xception.py:167-199``). ``upto`` ("stem", "block<k>",
    "exit") early-returns that stage's output with the BN state gathered so
    far — the live-BN analog of ``fold.folded_xception_apply(upto=)``, used by
    the train-step attribution harness (tools/trainbench.py). ``remat``
    rematerializes each block under ``jax.checkpoint`` — the backward pass
    recomputes block-internal activations instead of reloading them from HBM
    (gradients unchanged; a wall-clock/memory trade measured per-config in
    PERF.md).
    """
    new_state = {}
    h = conv2d(params["conv1"], x, stride=2, padding=0, compute_dtype=compute_dtype)
    h, new_state["bn1"] = batch_norm(params["bn1"], state["bn1"], h, train=train)
    h = jax.nn.relu(h)
    h = conv2d(params["conv2"], h, stride=1, padding=0, compute_dtype=compute_dtype)
    h, new_state["bn2"] = batch_norm(params["bn2"], state["bn2"], h, train=train)
    h = jax.nn.relu(h)
    if upto == "stem":
        return h, new_state

    def block_fn(bp, bs, spec, h):
        out, nbs = _block_apply(bp, bs, spec, h, train=train, compute_dtype=compute_dtype)
        if _BLOCK_BARRIER:
            # experiment gate (MDFD_BLOCK_BARRIER=1, tools/trainbench.py):
            # pin a fusion boundary at every block edge — probes whether the
            # backward's compositional cost comes from XLA building
            # unfortunate cross-block fusions
            out = jax.lax.optimization_barrier(out)
        return out, nbs

    if remat:
        block_fn = jax.checkpoint(block_fn, static_argnums=(2,))

    new_state["blocks"] = []
    for k, (spec, bp, bs) in enumerate(zip(XCEPTION_BLOCK_SPECS, params["blocks"], state["blocks"])):
        h, nbs = block_fn(bp, bs, spec, h)
        new_state["blocks"].append(nbs)
        if upto == f"block{k + 1}":
            return h, new_state

    h = separable_conv2d(params["conv3"], h, stride=1, padding=1, compute_dtype=compute_dtype)
    h, new_state["bn3"] = batch_norm(params["bn3"], state["bn3"], h, train=train)
    h = jax.nn.relu(h)
    h = separable_conv2d(params["conv4"], h, stride=1, padding=1, compute_dtype=compute_dtype)
    h, new_state["bn4"] = batch_norm(params["bn4"], state["bn4"], h, train=train)
    h = jax.nn.relu(h)
    if upto == "exit":
        return h, new_state

    feats = global_avg_pool(h)
    if features_only or "fc" not in params:
        return feats, new_state
    return linear(params["fc"], feats, compute_dtype=compute_dtype), new_state
