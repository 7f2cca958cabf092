"""NHWC convolution / normalization / pooling primitives.

TPU-first layer library used by every model in the framework. Design rules:

* **NHWC layout** everywhere — the native TPU convolution layout; the channel
  axis lands on the 128-wide lane dimension so XLA tiles convs straight onto
  the MXU. (The PyTorch reference is NCHW because cuDNN prefers it; that is a
  GPU-ism we do not carry over.)
* **HWIO kernels** — XLA's native filter layout.
* **Functional + explicit state** — parameters and batch-norm statistics are
  plain pytrees threaded through `apply` functions; nothing is hidden, so
  `jax.jit` / `pjit` / `grad` compose freely.
* **Mixed precision** — convs/matmuls accept a ``compute_dtype`` (bf16 on
  TPU); batch-norm statistics stay fp32.

Semantics deliberately match ``torch.nn`` defaults where the reference relies
on them (He-normal conv init with fan = k*k*out as in
``/root/reference/Xception.py:154-161``; BN eps=1e-5, momentum=0.1 with
unbiased running var; max-pool padding with -inf), so ported checkpoints and
parity tests line up bit-for-bit at fp32.
"""
from __future__ import annotations

import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp

Params = dict
State = dict

# Experiment gate (tools/trainbench.py): single-pass BN batch variance.
_BN_SINGLE_PASS = os.environ.get("MDFD_BN_SINGLE_PASS", "0") == "1"


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


# ---------------------------------------------------------------------------
# Conv2D
# ---------------------------------------------------------------------------

def conv2d_init(
    rng,
    in_channels: int,
    out_channels: int,
    kernel_size,
    *,
    bias: bool = False,
    dtype=jnp.float32,
    groups: int = 1,
) -> Params:
    """He-normal init with fan = kh*kw*out_channels.

    Matches the reference's explicit re-init of every Conv2d
    (``/root/reference/Xception.py:154-157``: normal(0, sqrt(2/n)) with
    n = kh*kw*out_channels), which overrides the torch default.
    """
    kh, kw = _pair(kernel_size)
    n = kh * kw * out_channels
    std = math.sqrt(2.0 / n)
    w = jax.random.normal(rng, (kh, kw, in_channels // groups, out_channels), dtype) * std
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_channels,), dtype)
    return p


def conv2d(
    params: Params,
    x: jnp.ndarray,
    *,
    stride=1,
    padding=0,
    groups: int = 1,
    compute_dtype=None,
) -> jnp.ndarray:
    """2-D convolution, NHWC x HWIO -> NHWC.

    ``padding`` is symmetric int/pair (torch-style) or an XLA padding string.
    """
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    sh, sw = _pair(stride)
    if isinstance(padding, str):
        pad = padding
    else:
        ph, pw = _pair(padding)
        pad = ((ph, ph), (pw, pw))
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(sh, sw),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Separable conv (depthwise 3x3 + pointwise 1x1) — Xception's workhorse
# ---------------------------------------------------------------------------

def separable_conv2d_init(
    rng,
    in_channels: int,
    out_channels: int,
    kernel_size=3,
    *,
    dtype=jnp.float32,
) -> Params:
    """Depthwise (groups=in) + pointwise 1x1, both bias-free.

    Mirrors ``SeparableConv2d`` (``/root/reference/Xception.py:37-47``). The
    depthwise kernel is stored HWIO with I=1, O=in_channels — the layout
    ``feature_group_count=in_channels`` expects.
    """
    r1, r2 = jax.random.split(rng)
    return {
        "depthwise": conv2d_init(r1, in_channels, in_channels, kernel_size, dtype=dtype, groups=in_channels),
        "pointwise": conv2d_init(r2, in_channels, out_channels, 1, dtype=dtype),
    }


def separable_conv2d(
    params: Params,
    x: jnp.ndarray,
    *,
    stride=1,
    padding=1,
    compute_dtype=None,
) -> jnp.ndarray:
    c = x.shape[-1]
    x = conv2d(params["depthwise"], x, stride=stride, padding=padding, groups=c, compute_dtype=compute_dtype)
    x = conv2d(params["pointwise"], x, stride=1, padding=0, compute_dtype=compute_dtype)
    return x


# ---------------------------------------------------------------------------
# BatchNorm (explicit running-stat state)
# ---------------------------------------------------------------------------

def batch_norm_init(num_features: int, *, dtype=jnp.float32) -> Tuple[Params, State]:
    params = {"scale": jnp.ones((num_features,), dtype), "bias": jnp.zeros((num_features,), dtype)}
    state = {
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
    }
    return params, state


def batch_norm(
    params: Params,
    state: State,
    x: jnp.ndarray,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, State]:
    """Channel-last batch norm over all leading axes.

    Training uses biased batch variance for normalization but updates the
    running variance with the unbiased estimate — the exact torch BN contract
    the ported Xception running stats assume.
    Statistics are computed in fp32 regardless of activation dtype.
    """
    orig_dtype = x.dtype
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes)
        if _BN_SINGLE_PASS:
            # E[x^2] - E[x]^2: both moments fuse into ONE reduction pass over
            # the conv output (jnp.var re-reads the activation for the
            # centered second pass). fp32 accumulation; the standard BN-stats
            # formulation (cuDNN/XLA use the same). Experiment-gated:
            # MDFD_BN_SINGLE_PASS=1, measured in tools/trainbench.py.
            var = jnp.maximum(jnp.mean(xf * xf, axis=reduce_axes) - mean * mean, 0.0)
        else:
            var = jnp.var(xf, axis=reduce_axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    scale = params["scale"].astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    shift = params["bias"].astype(jnp.float32) - mean * scale
    out = x.astype(jnp.float32) * scale + shift
    return out.astype(orig_dtype), new_state


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

def max_pool2d(x: jnp.ndarray, kernel_size=3, stride=2, padding=1) -> jnp.ndarray:
    """Max pool with implicit -inf padding (torch semantics)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    # scalar -inf init keeps the reduce_window in the select-and-scatter form
    # XLA recognizes (and JAX can reverse-differentiate)
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, C); the adaptive_avg_pool2d(1,1) analog."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(
    rng,
    in_features: int,
    out_features: int,
    *,
    bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    bound = 1.0 / math.sqrt(in_features)
    r1, r2 = jax.random.split(rng)
    p = {"w": jax.random.uniform(r1, (in_features, out_features), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(r2, (out_features,), dtype, -bound, bound)
    return p


def linear(params: Params, x: jnp.ndarray, *, compute_dtype=None) -> jnp.ndarray:
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jnp.dot(x, w, preferred_element_type=x.dtype)
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out
