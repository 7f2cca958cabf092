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
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.precision import at_least_f32

Params = dict
State = dict

# Experiment gates (tools/trainbench.py):
# single-pass BN batch variance (E[x^2] - E[x]^2, one reduction pass)
_BN_SINGLE_PASS = os.environ.get("MDFD_BN_SINGLE_PASS", "0") == "1"
# max-pool implementation: "shift" pools via 9 strided slices + elementwise
# max, whose backward is pure elementwise select ops — avoiding XLA's
# select-and-scatter lowering for the reduce_window backward
_POOL_IMPL = os.environ.get("MDFD_POOL_IMPL", "reduce_window")
# custom-VJP depthwise conv: backward computes dX as the flipped-kernel
# depthwise conv and dW as 9 shifted multiply-reduces, instead of XLA's
# grouped-conv kernel-grad lowering
_DW_CUSTOM = os.environ.get("MDFD_DW_CUSTOM", "0") == "1"
# pointwise-conv implementation: "dot" routes 1x1/stride-1/group-1 convs
# through a reshaped dot_general — a bitcast view (C stays on the lane axis)
# whose autodiff backward is two more matmuls, sidestepping XLA's
# 125x125-window kernel-grad conv lowering in the entry-block backward
# (PERF.md round-3 HLO evidence)
_PW_IMPL = os.environ.get("MDFD_PW_IMPL", "conv")
# custom-VJP train-mode batch norm: hand-written textbook backward
# (dbias/dscale reductions + one fused elementwise pass) instead of the
# autodiff chain through jnp.mean/jnp.var. DEFAULT ON by measurement
# (PERF.md round-3 matrix: step 47.61 ms vs 52.3 at B=64 — the single-pass
# E[x^2]-E[x]^2 stats fuse the forward's variance into one activation read,
# and the fused backward saves another ~4 ms). MDFD_BN_CUSTOM=0 restores
# the autodiff path.
_BN_CUSTOM = os.environ.get("MDFD_BN_CUSTOM", "1") == "1"
# bf16 dx-chain inside the custom BN backward: keeps the fp32 dbias/dscale
# reductions but computes the full-size dx elementwise pass in bf16 (the fp32
# intermediates at entry shapes are 512 MB apiece and the backward is
# HBM-bound on them). Experiment gate; gradient error vs fp32 chain is
# bounded by bf16 rounding of already-bf16 activations.
_BN_BWD_BF16 = os.environ.get("MDFD_BN_BWD_BF16", "0") == "1"


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
    if (
        _PW_IMPL == "dot"
        and w.shape[0] == w.shape[1] == 1
        and groups == 1
        and (sh, sw) == (1, 1)
        and (pad == "VALID" or pad == ((0, 0), (0, 0)))
    ):
        b, h, wd, ci = x.shape
        out = jax.lax.dot_general(
            x.reshape(b * h * wd, ci),
            w.reshape(ci, w.shape[-1]),
            (((1,), (0,)), ((), ())),
            preferred_element_type=x.dtype,
        ).reshape(b, h, wd, w.shape[-1])
    else:
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
    w = params["depthwise"]["w"]
    if (
        _DW_CUSTOM
        and stride == 1
        and padding == 1
        and w.shape[:2] == (3, 3)
        and "b" not in params["depthwise"]
    ):
        xin = x if compute_dtype is None else x.astype(compute_dtype)
        win = w if compute_dtype is None else w.astype(compute_dtype)
        x = _depthwise3x3_custom(xin, win)
    else:
        x = conv2d(params["depthwise"], x, stride=stride, padding=padding, groups=c, compute_dtype=compute_dtype)
    x = conv2d(params["pointwise"], x, stride=1, padding=0, compute_dtype=compute_dtype)
    return x


@jax.custom_vjp
def _depthwise3x3_custom(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3, stride 1, pad 1 — forward identical to the grouped conv;
    the custom backward sidesteps XLA's grouped kernel-grad lowering."""
    return _dw3x3(x, w)


def _dw3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=x.shape[-1],
    )


def _dw3x3_fwd(x, w):
    return _dw3x3(x, w), (x, w)


def _dw3x3_bwd(res, dy):
    x, w = res
    B, H, W, C = x.shape
    # dX: depthwise conv of dy with the spatially flipped taps (stride 1 pad 1)
    dx = _dw3x3(dy, w[::-1, ::-1])
    # dW[ky,kx,0,c] = sum_{b,h,w} xpad[b,h+ky,w+kx,c] * dy[b,h,w,c]:
    # nine shifted elementwise multiply-reduces; XLA fuses them into a single
    # pass over (x, dy) with 9 accumulators — no grouped-conv kernel-grad.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for ky in range(3):
        for kx in range(3):
            prod = at_least_f32(xp[:, ky : ky + H, kx : kx + W, :]) * at_least_f32(dy)
            taps.append(jnp.sum(prod, axis=(0, 1, 2)))
    dw = jnp.stack(taps).reshape(3, 3, 1, C).astype(w.dtype)
    return dx, dw


_depthwise3x3_custom.defvjp(_dw3x3_fwd, _dw3x3_bwd)


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


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train_core(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5):
    """Train-mode BN normalize: returns (out_f32, mean, var) with batch stats.

    The custom backward is the standard fused BN-VJP (two reductions + one
    elementwise pass) instead of autodiff through jnp.mean/jnp.var; the
    single-pass variance fuses the forward stats into one activation read.
    Default path (gradient-equivalence tested); MDFD_BN_CUSTOM=0 restores
    autodiff BN."""
    xf = at_least_f32(x)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    var = jnp.maximum(jnp.mean(xf * xf, axis=axes) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    out = (xf - mean) * (rstd * scale) + bias
    return out, mean, var


def _bn_train_core_fwd(x, scale, bias, eps):
    out, mean, var = _bn_train_core(x, scale, bias, eps)
    rstd = jax.lax.rsqrt(var + eps)
    return (out, mean, var), (x, mean, rstd, scale)


def _bn_train_core_bwd(eps, res, cts):
    dy, _dmean, _dvar = cts  # (mean, var) feed only the stop_gradient'd
    # running-state update, so their cotangents are exactly zero
    x, mean, rstd, scale = res
    xf = at_least_f32(x)
    dyf = at_least_f32(dy)
    axes = tuple(range(x.ndim - 1))
    n = x.size // x.shape[-1]
    xhat = (xf - mean) * rstd
    dbias = jnp.sum(dyf, axis=axes)
    dscale = jnp.sum(dyf * xhat, axis=axes)
    if _BN_BWD_BF16 and x.dtype == jnp.bfloat16:
        # dx elementwise chain entirely in bf16: the fp32 intermediates at
        # entry shapes are 512 MB apiece and the backward is HBM-bound on
        # them (PERF.md round 3). The reductions above stay fp32; the
        # per-channel fp32 scalars fold into three bf16 vectors, so the only
        # full-size tensors touched are bf16: dy, x, dx.
        # dx = a*dy - b - c*(x - mean), a = scale*rstd, b = a*dbias/n,
        # c = a*rstd*dscale/n
        a = (scale * rstd).astype(jnp.bfloat16)
        bvec = ((scale * rstd / n) * dbias).astype(jnp.bfloat16)
        cvec = ((scale * rstd * rstd / n) * dscale).astype(jnp.bfloat16)
        dx = dy.astype(jnp.bfloat16) * a - bvec - (x - mean.astype(jnp.bfloat16)) * cvec
        return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)
    dx = (scale * rstd / n) * (n * dyf - dbias - xhat * dscale)
    return dx.astype(x.dtype), dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_bn_train_core.defvjp(_bn_train_core_fwd, _bn_train_core_bwd)


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
    if train and _BN_CUSTOM:
        out, mean, var = _bn_train_core(
            x, at_least_f32(params["scale"]), at_least_f32(params["bias"]), eps
        )
        # Running-state updates are no-grad buffer writes (torch BN contract);
        # stop_gradient makes the custom VJP's zero-cotangent assumption for
        # the (mean, var) outputs exact by construction.
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
        return out.astype(orig_dtype), new_state
    if train:
        xf = at_least_f32(x)
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
    scale = at_least_f32(params["scale"]) * jax.lax.rsqrt(var + eps)
    shift = at_least_f32(params["bias"]) - mean * scale
    out = at_least_f32(x) * scale + shift
    return out.astype(orig_dtype), new_state


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

def max_pool2d(x: jnp.ndarray, kernel_size=3, stride=2, padding=1) -> jnp.ndarray:
    """Max pool with implicit -inf padding (torch semantics).

    Two lowerings, same forward values: ``reduce_window`` (XLA's native pool;
    its backward is a select-and-scatter), or ``shift``
    (``MDFD_POOL_IMPL=shift``): kh*kw strided slices combined with elementwise
    ``maximum``, whose backward is a chain of selects — measured per-config in
    tools/trainbench.py. Tie-breaking of the backward differs (ties are
    measure-zero for conv outputs); forwards are bit-identical.
    """
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    if _POOL_IMPL == "shift":
        B, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), constant_values=neg)
        Ho = (H + 2 * ph - kh) // sh + 1
        Wo = (W + 2 * pw - kw) // sw + 1
        out = None
        for dy in range(kh):
            for dx in range(kw):
                sl = jax.lax.slice(
                    xp,
                    (0, dy, dx, 0),
                    (B, dy + (Ho - 1) * sh + 1, dx + (Wo - 1) * sw + 1, C),
                    (1, sh, sw, 1),
                )
                out = sl if out is None else jnp.maximum(out, sl)
        return out
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
    return jnp.mean(at_least_f32(x), axis=(1, 2)).astype(x.dtype)


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
