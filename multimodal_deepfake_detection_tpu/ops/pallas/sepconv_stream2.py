"""Pallas kernel, round 2: streamed entry-flow sepconv unit PAIR (take 3).

Fuses ``dw3x3 -> pw(Cin->Cmid)+b0 -> relu -> dw3x3 -> pw(Cmid->Cout)+b1`` —
the two separable units of an Xception entry block (the HBM-bound 54% of net
time, /root/reference/Xception.py:167-199) — with the three intermediate
full-resolution tensors never leaving VMEM. Any leading ReLU is fused into
the XLA-side layout pass (elementwise, free), so the kernel always consumes
pre-activated input. Max-pool and the projection skip stay in XLA.

What round 1's ``sepconv_stream`` got wrong (measured: 15.1 vs XLA 8.5 ms on
block2 alone, tools/microbench.py) and this kernel fixes:

* **bordered-column layout** — the input is stored as (H+5, W+2+, C) rows
  with physical zero border columns/rows (one XLA pad pass, fused with the
  ReLU + bf16 cast). Depthwise tap reads then hit *genuine zeros* at every
  image edge and row-wrap position: there are NO in-kernel edge masks, no
  per-stripe iota/mod, and the halo DMA windows are always in-bounds by
  construction (window start = s*SH*W2 exactly).
* **no whole-stripe fp32 values** — round 1 materialized the full stripe as
  an fp32 value (register spills ~2x the byte traffic). Here every tap read
  is a bf16 REF read from VMEM scratch, accumulated in fp32 only per
  row-CHUNK (M = rows*W2 ~ 512, sized for the MXU), exactly the scheme the
  116 TFLOP/s middle-flow kernel uses.
* the unit-0 output is stored once as relu'd bf16 into a mid scratch with
  a single border-zeroing multiply (the only mask left, needed so unit 1's
  halo taps read zeros), instead of a full-stripe ``jnp.where``.

Geometry (flattened stored rows, stride W2 >= W+2):
stored row r' holds image row r = r'-3 (1 lead + 2 top-border zero rows);
2 bottom-border rows + tail alignment padding close the array. Stripe s
computes output image rows [s*SH, s*SH+SH); its DMA window is stored rows
[s*SH, s*SH+SH+5) so every (dy, dx) tap of every mid/out row — including
the dx=-1 read of the very first row — lands inside the window.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v, m):
    return -(-v // m) * m


def _chunks(total, th):
    out, r = [], 0
    while r < total:
        rows = min(th, total - r)
        out.append((r, rows))
        r += rows
    return out


def _stream2_kernel(
    x_hbm, dw0_ref, pw0_ref, b0_ref, dw1_ref, pw1_ref, b1_ref, out_ref,
    xs_ref, mid_ref, sem,
    *, H, W, W2, Cin, Cmid, SH, TH0, TH1, n_stripes, dx_roll, ablate,
):
    img = pl.program_id(0)
    s = pl.program_id(1)
    n_imgs = pl.num_programs(0)
    t = img * n_stripes + s
    slot = t % 2
    XROWS = xs_ref.shape[1]  # (SH+5)*W2 rounded up

    def dma_for(step, slot_idx):
        step_img = step // n_stripes
        step_s = step % n_stripes
        return pltpu.make_async_copy(
            x_hbm.at[step_img, pl.ds(step_s * SH * W2, XROWS), :],
            xs_ref.at[slot_idx],
            sem.at[slot_idx],
        )

    @pl.when(t == 0)
    def _():
        dma_for(0, 0).start()
        # two lead zero rows of the mid scratch (never written; they satisfy
        # unit 1's dy=0 halo reads including the dx=-1 read of the first col)
        mid_ref[: 2 * W2, :] = jnp.zeros((2 * W2, Cmid), jnp.bfloat16)

    @pl.when(t + 1 < n_imgs * n_stripes)
    def _():
        dma_for(t + 1, (t + 1) % 2).start()

    dma_for(t, slot).wait()

    def dw9(src_ref, row0, n, dw_ref, r_off):
        """9-tap depthwise over flattened bordered rows; fp32 accumulate.

        Output row k (k in [0, n)) corresponds to stored row ``row0 + k/W2``;
        ``r_off`` positions the (dy=0, dx=0) tap of output row 0 inside the
        ref. All reads are in-bounds and hit zero borders at image edges.

        ``dx_roll`` mode: only the 3 sublane-tile-ALIGNED center-column loads
        are issued per dy (start = r_off + dy*W2 + 1, a multiple of W2); the
        dx = 0/2 taps reuse them via per-dx vertical accumulators combined
        with two circular rolls. The roll-wrapped elements land only at
        flattened position 0 / n-1 — border columns, masked or sliced away
        downstream — so no edge fixup is needed.
        """
        if ablate == "notap":  # perf diagnosis: center tap only (1 load, 1 mul)
            start = r_off + W2 + 1
            return src_ref[pl.ds(start, n), :].astype(jnp.float32) * dw_ref[4, :][None, :]
        if not dx_roll:
            acc = None
            for dy in range(3):
                for dx in range(3):
                    start = r_off + dy * W2 + dx
                    tap = dw_ref[dy * 3 + dx, :]
                    contrib = src_ref[pl.ds(start, n), :].astype(jnp.float32) * tap[None, :]
                    acc = contrib if acc is None else acc + contrib
            return acc
        # one load per dy, reused by all 3 dx taps: cuts VMEM tap-read traffic
        # 3x vs the slice path (9 loads -> 3 loads + 9 FMAs + 2 rolls)
        accs = [None, None, None]
        for dy in range(3):
            start = r_off + dy * W2 + 1  # aligned: (row0-ish + dy) * W2
            v = src_ref[pl.ds(start, n), :].astype(jnp.float32)
            for dx in range(3):
                contrib = v * dw_ref[dy * 3 + dx, :][None, :]
                accs[dx] = contrib if accs[dx] is None else accs[dx] + contrib
        # out[p] needs col p-1 of the dx=0 taps and col p+1 of the dx=2 taps
        # (pltpu.roll requires non-negative shifts: -1 == n-1 circularly)
        return pltpu.roll(accs[0], 1, axis=0) + accs[1] + pltpu.roll(accs[2], n - 1, axis=0)

    # ---- unit 0: mid rows m in [0, SH+2) = image rows s*SH-1+m -------------
    # stored in mid_ref at row m+2 (rows 0-1 are the permanent zero lead).
    # tap (dy,dx) of mid row m reads xs window row m+dy+1 (window row w =
    # image row s*SH-3+w), flattened start (m+dy+1)*W2 + dx-1.
    n_mid = SH + 2
    # border-column mask: cols 0 and >= W+1 of each W2-row must be zero in mid
    col = jax.lax.broadcasted_iota(jnp.int32, (TH0 * W2, 1), 0) % W2
    mvalid0 = ((col >= 1) & (col <= W)).astype(jnp.float32)
    def pw(acc, pw_ref):
        if ablate == "nomm":  # perf diagnosis: lane-tile instead of the MXU dot
            cout = pw_ref.shape[1]
            reps_c = -(-cout // acc.shape[1])
            return jnp.concatenate([acc] * reps_c, axis=1)[:, :cout]
        return jnp.dot(acc.astype(jnp.bfloat16), pw_ref[:], preferred_element_type=jnp.float32)

    for c0, rows in _chunks(n_mid, TH0):
        n = rows * W2
        acc = dw9(xs_ref.at[slot], c0, n, dw0_ref, (c0 + 1) * W2 - 1)
        m = pw(acc, pw0_ref)
        m = jnp.maximum(m + b0_ref[0][None, :], 0.0) * mvalid0[:n]
        mid_ref[pl.ds((c0 + 2) * W2, n), :] = m.astype(jnp.bfloat16)

    # stripe-boundary rows of mid that fall outside the image must be zero
    # (unit 1 pads with zeros there): mid row 0 = image row s*SH-1 (< 0 only
    # at s == 0), mid row SH+1 = image row s*SH+SH (>= H only at the last
    # stripe, where s*SH+SH == H).
    @pl.when(s == 0)
    def _():
        mid_ref[2 * W2 : 3 * W2, :] = jnp.zeros((W2, Cmid), jnp.bfloat16)

    @pl.when(s == n_stripes - 1)
    def _():
        mid_ref[pl.ds((SH + 3) * W2, W2), :] = jnp.zeros((W2, Cmid), jnp.bfloat16)

    # ---- unit 1: out rows o in [0, SH) = image rows s*SH+o ----------------
    # out row o needs mid image rows s*SH+o-1..+1 = mid rows o..o+2, i.e.
    # tap dy reads mid_ref row o+dy+2.
    for o0, rows in _chunks(SH, TH1):
        n = rows * W2
        acc = dw9(mid_ref, o0, n, dw1_ref, (o0 + 2) * W2 - 1)
        o = pw(acc, pw1_ref)
        o = o + b1_ref[0][None, :]
        out_ref[0, pl.ds(o0 * W2, n), :] = o.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("leading_relu0", "stripe_rows", "row_chunk", "dx_roll", "ablate", "interpret"))
def sepconv_pair_stream2_pallas(
    x, dw0, pw0, b0, dw1, pw1, b1, *, leading_relu0: bool = False,
    stripe_rows: int = 0, row_chunk: int = 512, dx_roll: bool = False,
    ablate: str = "", interpret: bool = False,
):
    """Streamed fused sepconv pair, take 3: (B, H, W, Cin) -> (B, H, W, Cout).

    dw*: (9, C) tap-major; pw0: (Cin, Cmid); pw1: (Cmid, Cout); b*: (C,).
    ``stripe_rows=0`` picks the largest stripe that divides H and fits VMEM.
    ``row_chunk`` ~ target MXU M per chunk matmul.
    """
    B, H, W, Cin = x.shape
    Cmid = pw0.shape[1]
    Cout = pw1.shape[1]
    # Stored row stride: >= W+2 (1 left + >=1 right zero border col), rounded
    # to the bf16 sublane tile (16) so DMA window starts (s*SH*W2) and the
    # dy tap offsets (dy*W2) are tile-aligned — only the dx=0/2 taps are
    # off-tile by +-1, the same alignment class as the middle-flow kernel.
    W2 = _round_up(W + 2, 16)

    SH = stripe_rows or _pick_stripe(H, W2, Cin, Cmid, Cout)
    n_stripes = H // SH
    assert SH * n_stripes == H, f"stripe_rows {SH} must divide H={H}"

    # ---- XLA-side layout pass (single fused pad+relu+cast) ----------------
    xb = x.astype(jnp.float32)
    if leading_relu0:
        xb = jax.nn.relu(xb)
    xb = xb.astype(jnp.bfloat16)
    # lane dim of HBM-sliced DMAs must be 128-aligned: zero-pad channels
    Cin_pad = _round_up(Cin, 128)
    if Cin_pad != Cin:
        xb = jnp.pad(xb, ((0, 0), (0, 0), (0, 0), (0, Cin_pad - Cin)))
        dw0 = jnp.pad(dw0, ((0, 0), (0, Cin_pad - Cin)))
        pw0 = jnp.pad(pw0, ((0, Cin_pad - Cin), (0, 0)))
        Cin = Cin_pad
    # bordered layout: 3 zero rows on top (1 lead + 2 border), 2 on the
    # bottom, 1 zero col left / W2-W-1 right; then tail-pad so the last
    # stripe's DMA window is in-bounds.
    xb = jnp.pad(xb, ((0, 0), (3, 2), (1, W2 - W - 1), (0, 0)))
    P = (H + 5) * W2
    # +8: the last chunk's (dy=2, dx=2) tap reads one position past the
    # nominal (SH+5)*W2 window
    XROWS = _round_up((SH + 5) * W2 + 8, 16)
    tail = (n_stripes - 1) * SH * W2 + XROWS - P
    xb = xb.reshape(B, P, Cin)
    if tail > 0:
        xb = jnp.pad(xb, ((0, 0), (0, tail), (0, 0)))

    TH0 = max(1, min(row_chunk // W2, SH + 2))
    TH1 = max(1, min(row_chunk // W2, SH))

    kernel = partial(
        _stream2_kernel, H=H, W=W, W2=W2, Cin=Cin, Cmid=Cmid, SH=SH,
        TH0=TH0, TH1=TH1, n_stripes=n_stripes, dx_roll=dx_roll, ablate=ablate,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_stripes),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # bordered input, stays in HBM
            pl.BlockSpec((9, Cin), lambda i, s: (0, 0)),
            pl.BlockSpec((Cin, Cmid), lambda i, s: (0, 0)),
            pl.BlockSpec((1, Cmid), lambda i, s: (0, 0)),
            pl.BlockSpec((9, Cmid), lambda i, s: (0, 0)),
            pl.BlockSpec((Cmid, Cout), lambda i, s: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, SH * W2, Cout), lambda i, s: (i, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H * W2, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, XROWS, Cin), jnp.bfloat16),
            pltpu.VMEM(((SH + 4) * W2 + 8, Cmid), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        xb,
        dw0.astype(jnp.float32), pw0.astype(jnp.bfloat16), b0.reshape(1, Cmid).astype(jnp.float32),
        dw1.astype(jnp.float32), pw1.astype(jnp.bfloat16), b1.reshape(1, Cout).astype(jnp.float32),
    )
    # drop the border columns
    return out.reshape(B, H, W2, Cout)[:, :, 1 : W + 1, :]


def _pick_stripe(H, W2, Cin, Cmid, Cout, budget=12 * 2**20):
    """Largest SH dividing H whose buffers fit the VMEM budget."""
    lanes = lambda c: _round_up(c, 128)

    def vmem(SH):
        xs = 2 * _round_up((SH + 5) * W2, 16) * lanes(_round_up(Cin, 128)) * 2
        mid = (SH + 3) * W2 * lanes(Cmid) * 2
        outb = 2 * SH * W2 * lanes(Cout) * 2
        wts = lanes(_round_up(Cin, 128)) * lanes(Cmid) * 2 + lanes(Cmid) * lanes(Cout) * 2
        return xs + mid + outb + wts

    for div in range(1, H + 1):
        if H % div == 0 and vmem(H // div) < budget:
            return H // div
    return 1


def pack_pair2(folded_block):
    """fold-output entry block (reps=2, grow_first) -> stream2 weights."""
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
