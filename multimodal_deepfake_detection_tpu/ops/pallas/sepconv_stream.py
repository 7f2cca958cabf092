"""Pallas kernel: streamed fusion of an entry-flow sepconv unit PAIR.

The entry blocks (1-3) are HBM-bandwidth bound (PERF.md: 54% of net time) and
their full-image state exceeds VMEM at block1, so unlike the middle-flow
kernel this one STREAMS: the image stays in HBM; each grid step produces one
row-stripe of the block's second-unit output, manually DMA-ing just the
stripe + halos of the input into VMEM and computing both separable units
back-to-back. The three intermediate full-resolution tensors (dw0, pw0-out,
dw1) that XLA would round-trip through HBM never exist.

Fuses:  [relu?] -> dw3x3 -> pw(Cin->Cmid)+b0 -> relu -> dw3x3 -> pw(Cmid->Cout)+b1

Max-pool and the projection skip stay in XLA.

Geometry (flattened row-major positions; one image row = W positions):
each 3x3 conv needs a margin of W+1 positions on both sides of its output
range, so the input stripe carries 2(W+1), the unit-0 output ("mid") W+1.
The input is zero-padded by 2W+2 positions in XLA so every DMA has a static
size and image-edge halos are zeros; mid rows that fall outside the image
are explicitly zeroed (their pw bias would otherwise leak into unit 1's
halo). Horizontal taps mask wrapped columns, with each tensor's own column
phase.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_pw(src, n_out, off, col_phase, W, dw_ref, pw_ref, b_ref, relu_in):
    """Fused dw3x3+pw on flattened rows.

    src: (rows, C) f32. Output row k corresponds to src row off+k (center tap).
    ``col_phase``: original column of output row 0 (mod W), for edge masks.
    """
    if relu_in:
        src = jnp.maximum(src, 0.0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0)
    wpos = (row_ids + col_phase) % W
    m_left = (wpos != 0).astype(jnp.float32)
    m_right = (wpos != W - 1).astype(jnp.float32)
    acc = jnp.zeros((n_out, src.shape[1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            start = off + (dy - 1) * W + (dx - 1)
            tap = dw_ref[dy * 3 + dx, :].astype(jnp.float32)
            contrib = src[start : start + n_out, :] * tap[None, :]
            if dx == 0:
                contrib = contrib * m_left
            elif dx == 2:
                contrib = contrib * m_right
            acc = acc + contrib
    return (
        jnp.dot(acc.astype(jnp.bfloat16), pw_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0][None, :].astype(jnp.float32)
    )


def _stream_kernel(
    x_hbm, dw0_ref, pw0_ref, b0_ref, dw1_ref, pw1_ref, b1_ref, out_ref,
    xs_ref, sem,
    *, H, W, Cin, SH, leading_relu0,
):
    img = pl.program_id(0)
    s = pl.program_id(1)
    n_stripes = pl.num_programs(1)
    n_imgs = pl.num_programs(0)
    SW = SH * W
    M = W + 1  # per-conv margin in flattened positions
    HW = H * W
    DMA = -(-(SW + 4 * M) // 16) * 16  # sublane-aligned DMA size

    # stripe s output = orig positions [s*SW, s*SW + SW)
    # xs = orig [s*SW - 2M, s*SW + SW + 2M), i.e. padded [s*SW, s*SW + SW + 4M)
    # Double-buffered across grid steps (scratch persists): step t computes
    # from slot t%2 (whose DMA was started at step t-1) and prefetches t+1.
    t = img * n_stripes + s
    slot = t % 2

    def dma_for(step, slot_idx):
        step_img = step // n_stripes
        step_s = step % n_stripes
        return pltpu.make_async_copy(
            x_hbm.at[step_img, pl.ds(step_s * SW, DMA), :],
            xs_ref.at[slot_idx],
            sem.at[slot_idx],
        )

    @pl.when(t == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(t + 1 < n_imgs * n_stripes)
    def _():
        dma_for(t + 1, (t + 1) % 2).start()

    dma_for(t, slot).wait()
    xs = xs_ref[slot].astype(jnp.float32)

    # unit 0 -> mid: orig [s*SW - M, s*SW + SW + M); center offset in xs = M
    n_mid = SW + 2 * M
    mid = _dw_pw(xs, n_mid, M, (W - 1) % W, W, dw0_ref, pw0_ref, b0_ref, leading_relu0)
    # zero mid rows outside the image (their bias must not leak into halos)
    mid_pos = s * SW - M + jax.lax.broadcasted_iota(jnp.int32, (n_mid, 1), 0)
    mid = jnp.where((mid_pos >= 0) & (mid_pos < HW), mid, 0.0)

    # unit 1 -> out: orig [s*SW, s*SW + SW); center offset in mid = M
    out = _dw_pw(mid, SW, M, 0, W, dw1_ref, pw1_ref, b1_ref, True)
    out_ref[0] = out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("leading_relu0", "stripe_rows", "interpret"))
def sepconv_pair_stream_pallas(
    x, dw0, pw0, b0, dw1, pw1, b1, *, leading_relu0: bool = False,
    stripe_rows: int = 32, interpret: bool = False,
):
    """Streamed fused sepconv pair on (B, H, W, Cin) -> (B, H, W, Cout).

    dw*: (9, C) tap-major; pw0: (Cin, Cmid); pw1: (Cmid, Cout); b*: (C,).
    """
    B, H, W, Cin = x.shape
    Cmid = pw0.shape[1]
    Cout = pw1.shape[1]
    SH = min(stripe_rows, H)
    n_stripes = -(-H // SH)
    Hp = n_stripes * SH
    M = W + 1

    # HBM slicing DMAs require the lane (channel) dim 128-aligned; zero-pad
    # the input channels (zero taps/weight rows contribute nothing).
    Cin_pad = -(-Cin // 128) * 128
    if Cin_pad != Cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cin_pad - Cin)))
        dw0 = jnp.pad(dw0, ((0, 0), (0, Cin_pad - Cin)))
        pw0 = jnp.pad(pw0, ((0, Cin_pad - Cin), (0, 0)))
        Cin = Cin_pad

    SW = SH * W
    DMA = -(-(SW + 4 * M) // 16) * 16  # sublane-aligned per-stripe DMA size
    x2 = x.reshape(B, H * W, Cin)
    # head: 2M zeros; tail covers the last (aligned) DMA window
    tail = (n_stripes - 1) * SW + DMA - (2 * M + H * W)
    x2 = jnp.pad(x2, ((0, 0), (2 * M, tail), (0, 0)))

    kernel = partial(
        _stream_kernel, H=H, W=W, Cin=Cin, SH=SH, leading_relu0=leading_relu0,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_stripes),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((9, Cin), lambda i, s: (0, 0)),
            pl.BlockSpec((Cin, Cmid), lambda i, s: (0, 0)),
            pl.BlockSpec((1, Cmid), lambda i, s: (0, 0)),
            pl.BlockSpec((9, Cmid), lambda i, s: (0, 0)),
            pl.BlockSpec((Cmid, Cout), lambda i, s: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, SW, Cout), lambda i, s: (i, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp * W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, DMA, Cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2.astype(jnp.bfloat16), dw0, pw0, b0.reshape(1, Cmid), dw1, pw1, b1.reshape(1, Cout))
    return out[:, : H * W].reshape(B, H, W, Cout)


def pack_pair(folded_block):
    """fold-output entry block (reps=2, grow_first) -> stream-kernel weights."""
    u0, u1 = folded_block["units"]

    def unpack(u):
        dwk = u["depthwise"]["w"]
        return (
            dwk[:, :, 0, :].reshape(9, dwk.shape[-1]).astype(jnp.float32),
            u["pointwise"]["w"][0, 0],
            u["pointwise"]["b"].astype(jnp.float32),
        )

    dw0, pw0, b0 = unpack(u0)
    dw1, pw1, b1 = unpack(u1)
    return dw0, pw0, b0, dw1, pw1, b1
