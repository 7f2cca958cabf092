"""Pallas kernel: one fused separable-conv unit (depthwise3x3 + pointwise).

Complements ``sepconv_block`` (which fuses whole middle-flow residual blocks):
this kernel handles the general ``[relu?] -> dw3x3 -> pw1x1(+folded-BN bias)
-> [relu?]`` unit at ANY (C_in -> C_out) — the entry-flow blocks (64->728
channels at 127^2..31^2) and the exit convs (1024->1536->2048 at 8^2). The
win is eliminating the depthwise intermediate's HBM round trip: the
per-image activation stays in VMEM, the depthwise runs stripe-by-stripe over
rows (1-row halos, edge masks; stripe sizes are static python-unrolled so odd
heights like 127 still get big MXU tiles), and each stripe feeds one matmul
with M = stripe_rows * W.

Max-pools / projection skips stay in XLA (cheap, fuse fine there).

Status: numerically exact (tests/test_pallas_sepconv.py) and hardware-correct,
but measured SLOWER than XLA's convs end-to-end at the entry/exit shapes
(44.0 vs 39.4 ms/net, B=256 @ 256^2) — so the default serving path uses only
the middle-flow block kernel. Kept as an op for shapes where it wins and as
the base for a future manual-DMA variant that also covers block1 (which
exceeds the 16 MB VMEM with double-buffered full-image blocks).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunks(H: int, th: int):
    out, r = [], 0
    while r < H:
        rows = min(th, H - r)
        out.append((r, rows))
        r += rows
    return out


def _unit_kernel(
    x_ref, dw_ref, pw_ref, b_ref, out_ref, pad_ref,
    *, H, W, Cin, Cout, th, leading_relu, trailing_relu,
):
    # x_ref: (1, HW, Cin); out_ref: (1, HW, Cout);
    # dw_ref: (9, Cin); pw_ref: (Cin, Cout); b_ref: (1, Cout)
    # pad_ref scratch: (th*W + 2W + 2, Cin) bf16 — one row stripe + halos
    O = W + 1

    def relu_in(v):
        return jnp.maximum(v, 0.0) if leading_relu else v

    for r0_rows in _chunks(H, th):
        row_start, rows = r0_rows
        r0 = row_start * W
        TW = rows * W
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (TW, 1), 0)
        wpos = row_ids % W
        m_left = (wpos != 0).astype(jnp.float32)
        m_right = (wpos != W - 1).astype(jnp.float32)

        pad_ref[0 : TW + 2 * W + 2, :] = jnp.zeros((TW + 2 * W + 2, Cin), jnp.bfloat16)
        pad_ref[O : O + TW, :] = relu_in(x_ref[0, r0 : r0 + TW, :].astype(jnp.float32)).astype(jnp.bfloat16)
        if row_start > 0:  # top halo row
            pad_ref[O - W : O, :] = relu_in(x_ref[0, r0 - W : r0, :].astype(jnp.float32)).astype(jnp.bfloat16)
        if row_start + rows < H:  # bottom halo row
            pad_ref[O + TW : O + TW + W, :] = relu_in(
                x_ref[0, r0 + TW : r0 + TW + W, :].astype(jnp.float32)
            ).astype(jnp.bfloat16)
        acc = jnp.zeros((TW, Cin), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                start = dy * W + dx
                tap = dw_ref[dy * 3 + dx, :].astype(jnp.float32)
                contrib = pad_ref[start : start + TW, :].astype(jnp.float32) * tap[None, :]
                if dx == 0:
                    contrib = contrib * m_left
                elif dx == 2:
                    contrib = contrib * m_right
                acc = acc + contrib
        out = (
            jnp.dot(acc.astype(jnp.bfloat16), pw_ref[:], preferred_element_type=jnp.float32)
            + b_ref[0][None, :]
        )
        if trailing_relu:
            out = jnp.maximum(out, 0.0)
        out_ref[0, r0 : r0 + TW, :] = out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("leading_relu", "trailing_relu", "row_tile", "interpret"))
def sepconv_unit_pallas(
    x, dw, pw, b, *, leading_relu: bool = True, trailing_relu: bool = False,
    row_tile: int = 32, interpret: bool = False,
):
    """Fused [relu?]->dw3x3(pad1)->pw1x1+b->[relu?] on (B, H, W, Cin).

    dw: (9, Cin) tap-major; pw: (Cin, Cout); b: (Cout,).
    """
    B, H, W, Cin = x.shape
    Cout = pw.shape[1]
    HW = H * W
    th = min(row_tile, H)
    x2 = x.reshape(B, HW, Cin)
    kernel = partial(
        _unit_kernel, H=H, W=W, Cin=Cin, Cout=Cout, th=th,
        leading_relu=leading_relu, trailing_relu=trailing_relu,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HW, Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, Cin), lambda i: (0, 0)),
            pl.BlockSpec((Cin, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, HW, Cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HW, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((th * W + 2 * W + 2, Cin), jnp.bfloat16)],
        interpret=interpret,
    )(x2, dw, pw, b.reshape(1, Cout))
    return out.reshape(B, H, W, Cout)


def unit_fits_vmem(H: int, W: int, Cin: int, Cout: int, *, row_tile: int = 32, budget=13 * 2**20) -> bool:
    """Conservative VMEM estimate: double-buffered in/out blocks + stripe
    scratch + weights must fit under the 16 MB core limit (with headroom)."""
    HW = H * W
    th = min(row_tile, H)
    lanes = lambda c: ((c + 127) // 128) * 128
    in_blk = HW * lanes(Cin) * 2
    out_blk = HW * lanes(Cout) * 2
    scratch = (th * W + 2 * W + 2) * lanes(Cin) * 2
    weights = lanes(Cin) * lanes(Cout) * 4
    return 2 * (in_blk + out_blk) + scratch + weights < budget


def pack_unit(folded_unit):
    """fold-output sep unit -> (dw (9, Cin), pw (Cin, Cout), b (Cout,))."""
    dwk = folded_unit["depthwise"]["w"]  # (3,3,1,Cin)
    return (
        dwk[:, :, 0, :].reshape(9, dwk.shape[-1]).astype(jnp.float32),
        folded_unit["pointwise"]["w"][0, 0],
        folded_unit["pointwise"]["b"].astype(jnp.float32),
    )
