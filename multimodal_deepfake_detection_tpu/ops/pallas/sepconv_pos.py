"""Position-major (POS, B, C) fused middle-flow block (PERF.md roadmap #1).

The shipped v2 kernel (sepconv_block.py) lays activations out as
(image, H*W, C): spatial positions ride the sublane axis, so 6 of the 9
depthwise tap reads start at ``dy*W + dx`` — off the 8-row sublane tile — and
the per-image tap throughput measured 1.7 T VPU-flop/s vs 2.4 T for aligned
reads (tools/probe_hwmajor.py, PERF.md r2).

This kernel transposes the 16^2 trunk ONCE to position-major ``(H*W, B, C)``
(B<->HW transpose measured 0.11 ms / 157 MB): with a batch tile of 8 on the
sublane axis, EVERY tap offset shifts whole (8, C) tile planes — aligned for
any (dy, dx) — and the horizontal edge masks become per-position scalars.
The pointwise matmul takes M = chunk*8 rows. VMEM discipline: the output
block doubles as the inter-rep activation buffer (pre-relu bf16), so the
live set is pad scratch + x + out + weights (~15 MB at BT=8, C=728).

Same contract/math as middle_block_pallas_v2 precise mode (fp32 tap
accumulation, bf16 inter-rep round-trip, folded-BN pointwise bias).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pos_kernel(x_ref, dw_ref, pw_ref, b_ref, out_ref, pad_ref, *, H, W, C, reps, BT, NCH):
    HW = H * W
    O = W + 1  # pad offset of position 0
    CH = HW // NCH

    @pl.when(pl.program_id(0) == 0)
    def _():  # zero margins once; the interior is rewritten every rep
        pad_ref[:O] = jnp.zeros((O, BT, C), jnp.bfloat16)
        pad_ref[O + HW :] = jnp.zeros((W + 1, BT, C), jnp.bfloat16)

    for r in range(reps):
        src = x_ref if r == 0 else out_ref
        # relu directly in bf16 (max(x, 0) is exact in any dtype) and CHUNKED:
        # a whole-image store temp is a ~3 MB Mosaic stack tenant, and the
        # 16 MB scoped-VMEM budget at BT=8/C=728 has no room for it
        # (measured OOMs: 17.34M/16.59M/16.14M across shrinking variants,
        # PERF.md round 3)
        for c in range(NCH):
            cs = c * CH
            chunk = src[cs : cs + CH]
            pad_ref[O + cs : O + cs + CH] = jnp.maximum(
                chunk, jnp.zeros((), chunk.dtype)
            ).astype(jnp.bfloat16)
        for c in range(NCH):
            cs = c * CH
            acc = None
            for dy in range(3):
                for dx in range(3):
                    start = cs + dy * W + dx
                    tap = dw_ref[r, dy * 3 + dx, :].astype(jnp.float32)
                    contrib = pad_ref[start : start + CH].astype(jnp.float32) * tap[None, None, :]
                    if dx != 1:
                        wpos = (jax.lax.broadcasted_iota(jnp.int32, (CH, 1, 1), 0) + cs) % W
                        m = (wpos != 0) if dx == 0 else (wpos != W - 1)
                        contrib = contrib * m.astype(jnp.float32)
                    acc = contrib if acc is None else acc + contrib
            o = (
                jnp.dot(
                    acc.reshape(CH * BT, C).astype(jnp.bfloat16),
                    pw_ref[r],
                    preferred_element_type=jnp.float32,
                )
                + b_ref[r][None, :]
            ).reshape(CH, BT, C)
            if r + 1 == reps:  # residual add on the final unit
                o = o + x_ref[cs : cs + CH].astype(jnp.float32)
            out_ref[cs : cs + CH] = o.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret", "batch_tile", "pos_chunks"))
def middle_block_pos_pallas(
    xp, dw, pw, b, *, interpret: bool = False, batch_tile: int = 8, pos_chunks: int = 8
):
    """Fused middle-flow residual block on position-major activations.

    Args:
        xp: (H*W, B, C) activations — use :func:`to_pos_layout` once around a
            RUN of middle blocks; consecutive blocks chain with no transpose.
        dw/pw/b: as in middle_block_pallas_v2 (pack_middle_block output).
    Returns (H*W, B, C), dtype of xp. Requires batch_tile | B and
    pos_chunks | H*W; H is inferred as sqrt(H*W) for the square middle trunk.
    VMEM discipline (16 MB scoped limit at BT=8/C=728, measured on the real
    chip — PERF.md round 3): the relu pad-refill is chunked and bf16, and
    pos_chunks=8 bounds the fp32 tap-accumulator stack temporaries (CH*BT*C)
    — whole-image fp32 temps OOM'd the Mosaic stack by up to 1.34 MB.
    """
    HW, B, C = xp.shape
    reps = dw.shape[0]
    H = W = int(round(HW ** 0.5))
    assert H * W == HW, "position-major kernel expects the square middle trunk"
    BT = batch_tile
    # Mosaic requires the sublane (second-minor) block dim be a multiple of 8
    # (or the full axis), so the batch axis pads UP to the tile instead of the
    # tile shrinking below 8 — odd backbone batches (e.g. B*T serving clips)
    # hit this; pad rows are pure compute, sliced off after.
    Bp = -(-B // BT) * BT
    xp_in = jnp.concatenate([xp, jnp.zeros((HW, Bp - B, C), xp.dtype)], 1) if Bp != B else xp
    NCH = pos_chunks
    while HW % NCH:
        NCH //= 2
    NCH = max(NCH, 1)
    kernel = partial(_pos_kernel, H=H, W=W, C=C, reps=reps, BT=BT, NCH=NCH)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // BT,),
        in_specs=[
            pl.BlockSpec((HW, BT, C), lambda i: (0, i, 0)),
            pl.BlockSpec((reps, 9, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((reps, C, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((reps, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((HW, BT, C), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((HW, Bp, C), xp.dtype),
        scratch_shapes=[pltpu.VMEM((HW + 2 * W + 2, BT, C), jnp.bfloat16)],
        # the resident set (double-buffered I/O blocks + pad scratch + packed
        # pointwise weights) legitimately needs ~17 MB at BT=8/C=728; the
        # default 16 MB scoped-VMEM budget is a soft compiler default, not
        # the hardware's (v5e has 128 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(xp_in, dw.astype(jnp.float32), pw.astype(jnp.bfloat16), b.astype(jnp.float32))
    return out[:, :B] if Bp != B else out


def _pos_q_kernel(
    x_ref, dw_ref, pw_ref, sc_ref, b_ref, out_ref, pad_ref, *, H, W, C, reps, BT, NCH
):
    """_pos_kernel with the pointwise matmul in int8 on the MXU (2x rate).

    ``dw_ref`` arrives pre-scaled by 1/s_in[r], so the fp32 tap accumulator is
    already in quantized units — requantization before the matmul is just
    round+clip+convert (3 VPU ops), and ``sc_ref[r] = s_in[r] * s_w[r]`` is
    the fused per-channel dequant epilogue scale.
    """
    HW = H * W
    O = W + 1
    CH = HW // NCH

    @pl.when(pl.program_id(0) == 0)
    def _():
        pad_ref[:O] = jnp.zeros((O, BT, C), jnp.bfloat16)
        pad_ref[O + HW :] = jnp.zeros((W + 1, BT, C), jnp.bfloat16)

    for r in range(reps):
        src = x_ref if r == 0 else out_ref
        for c in range(NCH):
            cs = c * CH
            chunk = src[cs : cs + CH]
            pad_ref[O + cs : O + cs + CH] = jnp.maximum(
                chunk, jnp.zeros((), chunk.dtype)
            ).astype(jnp.bfloat16)
        for c in range(NCH):
            cs = c * CH
            acc = None
            for dy in range(3):
                for dx in range(3):
                    start = cs + dy * W + dx
                    tap = dw_ref[r, dy * 3 + dx, :].astype(jnp.float32)
                    contrib = pad_ref[start : start + CH].astype(jnp.float32) * tap[None, None, :]
                    if dx != 1:
                        wpos = (jax.lax.broadcasted_iota(jnp.int32, (CH, 1, 1), 0) + cs) % W
                        m = (wpos != 0) if dx == 0 else (wpos != W - 1)
                        contrib = contrib * m.astype(jnp.float32)
                    acc = contrib if acc is None else acc + contrib
            qa = jnp.clip(jnp.round(acc), -127.0, 127.0).astype(jnp.int8)
            o = (
                jnp.dot(
                    qa.reshape(CH * BT, C),
                    pw_ref[r],
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                * sc_ref[r][None, :]
                + b_ref[r][None, :]
            ).reshape(CH, BT, C)
            if r + 1 == reps:
                o = o + x_ref[cs : cs + CH].astype(jnp.float32)
            out_ref[cs : cs + CH] = o.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret", "batch_tile", "pos_chunks"))
def middle_block_pos_pallas_w8(
    xp, dw, pw_q, s_w, s_in, s_dq, b, *, interpret: bool = False, batch_tile: int = 8,
    pos_chunks: int = 4,
):
    """int8-pointwise fused middle-flow block on position-major activations.

    Same structure/contract as :func:`middle_block_pos_pallas`, but each
    rep's 1x1 conv runs as an int8xint8->int32 MXU matmul (2x the bf16 rate
    on v5e) with per-output-channel weight scales and a static calibrated
    activation scale: the depthwise taps stay fp32 on the bf16 pad (more
    precise than the XLA w8a8 path, which also quantizes the depthwise
    input), the accumulator is pre-scaled into quantized units by folding
    1/s_in into the tap weights, and the dequant epilogue fuses into the
    matmul output.

    Args:
        xp: (H*W, B, C) bf16/f32 activations (position-major).
        dw: (reps, 9, C) fp depthwise taps (dequantized if the tree stores
            them int8).
        pw_q: (reps, C, C) int8 pointwise weights.
        s_w: (reps, C) fp32 per-output-channel weight scales.
        s_in: (reps, C) fp32 static per-channel activation scales at each
            pointwise input (a per-tensor tree broadcasts its scalar; with
            act_scales="channel" these carry the fold — either way they
            disappear into the tap weights below, at zero kernel cost).
        s_dq: (reps,) fp32 scalar dequant factors for the matmul epilogue.
        b: (reps, C) fp32 folded-BN biases.

    ``pos_chunks`` defaults to 4 here (vs the fp kernel's 8): the int8 MXU
    prefers the larger matmul M (CH*BT = 512 rows) — measured 1.49 vs
    1.64 ms/block at NCH=8 in the chained sweep (PERF.md r3), while the fp
    kernel measures best at 8 (1.82 vs 1.84). The fp32 tap-accumulator
    stack temp at NCH=4 fits inside the raised 40 MB scoped-VMEM budget.
    """
    HW, B, C = xp.shape
    reps = dw.shape[0]
    H = W = int(round(HW ** 0.5))
    assert H * W == HW, "position-major kernel expects the square middle trunk"
    BT = batch_tile
    # batch pads UP to the tile (Mosaic sublane constraint) — see
    # middle_block_pos_pallas
    Bp = -(-B // BT) * BT
    xp_in = jnp.concatenate([xp, jnp.zeros((HW, Bp - B, C), xp.dtype)], 1) if Bp != B else xp
    NCH = pos_chunks
    while HW % NCH:
        NCH //= 2
    NCH = max(NCH, 1)
    s_in = s_in.astype(jnp.float32).reshape(reps, C)
    dw_scaled = dw.astype(jnp.float32) / s_in[:, None, :]
    sc = s_dq.astype(jnp.float32).reshape(reps)[:, None] * s_w.astype(jnp.float32)
    kernel = partial(_pos_q_kernel, H=H, W=W, C=C, reps=reps, BT=BT, NCH=NCH)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // BT,),
        in_specs=[
            pl.BlockSpec((HW, BT, C), lambda i: (0, i, 0)),
            pl.BlockSpec((reps, 9, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((reps, C, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((reps, C), lambda i: (0, 0)),
            pl.BlockSpec((reps, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((HW, BT, C), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((HW, Bp, C), xp.dtype),
        scratch_shapes=[pltpu.VMEM((HW + 2 * W + 2, BT, C), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(xp_in, dw_scaled, pw_q, sc, b.astype(jnp.float32))
    return out[:, :B] if Bp != B else out


def pack_middle_block_q(qblock):
    """One quantized (models/quant.py) middle-flow block ->
    (dw (reps, 9, C) fp32, pw_q (reps, C, C) int8, s_w (reps, C),
    s_in (reps, C), s_dq (reps,), b (reps, C)) for
    :func:`middle_block_pos_pallas_w8`.

    Depthwise nodes may be fp ("w") or quantized ("w_q" — dequantized here:
    the kernel's taps run fp32 either way). ``s_in`` is always packed as a
    per-channel vector (a per-tensor node's scalar broadcasts): with
    activation-scale folding (act_scales="channel") the per-channel part
    folds into the tap weights exactly like the scalar did, and ``s_dq``
    carries the scalar dequant factor for the matmul epilogue."""
    dws, pws, sws, sins, sdqs, bs = [], [], [], [], [], []
    for u in qblock["units"]:
        d = u["depthwise"]
        if "w_q" in d:
            w = d["w_q"].astype(jnp.float32) * d["s_w"]
            if "s_dq" in d:
                # channel-folded depthwise node (act_scales="channel"):
                # w_q*s_w reconstructs the FOLDED weight w*s_fold[c] — undo
                # the output-axis fold (s_fold = s_in/s_dq) to recover the
                # true fp taps the kernel applies to unquantized activations.
                # (Round-5 bug: without this, every channel's tap was off by
                # its fold factor — feature cos 0.11 vs the XLA int8 path.)
                w = w * (d["s_dq"] / jnp.asarray(d["s_in"], jnp.float32))
        else:
            w = d["w"].astype(jnp.float32)
        dws.append(w[:, :, 0, :].reshape(9, w.shape[-1]))
        p = u["pointwise"]
        C = p["w_q"].shape[2]
        pws.append(p["w_q"][0, 0])
        sws.append(p["s_w"].astype(jnp.float32))
        s_in = jnp.asarray(p["s_in"], jnp.float32)
        sins.append(jnp.broadcast_to(s_in.reshape(-1), (C,)) if s_in.ndim == 0 or s_in.size == 1
                    else s_in)
        sdqs.append(jnp.asarray(p.get("s_dq", p["s_in"]), jnp.float32).reshape(()))
        bs.append(p["b"].astype(jnp.float32))
    return (
        jnp.stack(dws),
        jnp.stack(pws),
        jnp.stack(sws),
        jnp.stack(sins),
        jnp.stack(sdqs),
        jnp.stack(bs),
    )


def is_middle_block_q(qblock) -> bool:
    """is_middle_block for quantized trees: stride-1, no projection, square
    int8 pointwise weights."""
    if "skip" in qblock:
        return False
    units = qblock["units"]
    if any("w_q" not in u["pointwise"] for u in units):
        return False
    c = units[0]["pointwise"]["w_q"].shape[-1]
    return all(
        u["pointwise"]["w_q"].shape[2] == c and u["pointwise"]["w_q"].shape[3] == c
        for u in units
    )


def to_pos_layout(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (H*W, B, C); one transpose for a run of middle blocks."""
    B, H, W, C = x.shape
    return jnp.transpose(x.reshape(B, H * W, C), (1, 0, 2))


def from_pos_layout(xp: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(H*W, B, C) -> (B, H, W, C)."""
    HW, B, C = xp.shape
    return jnp.transpose(xp, (1, 0, 2)).reshape(B, H, W, C)
