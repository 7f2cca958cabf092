"""Pallas kernel, round 2 take 4: whole-image fused entry-flow sepconv pair.

Fuses ``[relu] -> dw3x3 -> pw(Cin->Cmid)+b0 -> relu -> dw3x3 -> pw(Cmid->Cout)
+b1 [-> row-max-pool]`` — one Xception entry/exit block's separable pair
(/root/reference/Xception.py:167-199) — with ALL intermediates resident in
VMEM. Unlike ``sepconv_stream2`` (manual HBM DMA + stripes + an XLA-side
bordered-layout prep pass) this kernel:

* takes the RAW ``(B, H, W, Cin)`` activation as a normal BlockSpec input —
  one image per grid step, double-buffered by the Mosaic pipeline; there is
  no separate XLA pad/cast pass and no halo logic (the whole image is the
  stripe);
* builds the zero-bordered layout in VMEM: border rows/columns of the
  ``(H+4, W2, C)`` scratches are zeroed ONCE (first grid step) and only the
  interior is rewritten per image (the ``sepconv_block.py`` margin trick);
  the leading ReLU fuses into that interior store;
* reads depthwise taps with the measured-best scheme from stream2: per dy
  one sublane-tile-ALIGNED load (W2 is a multiple of 16) reused by all
  three dx taps via two ``pltpu.roll``s (PERF.md round 2).

``entry_pair_pallas`` is the pair alone (column-bordered ``(B, H, W2, Cout)``
output, valid columns ``[:, :, 1:W+1, :]``); ``entry_block_pallas`` below
additionally fuses the block's 3x3/stride-2 max-pool and skip conv.
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


def _entry_kernel(
    x_ref, dw0_ref, pw0_ref, b0_ref, dw1_ref, pw1_ref, b1_ref, out_ref,
    xb_ref, mid_ref,
    *, H, W, W2, Cin, Cmid, TH, leading_relu0,
):
    """One image per grid step; xb/mid are (H+4, W2, C) zero-bordered.

    Row map: xb row r+2 holds image row r (2 zero lead + 2 zero tail rows);
    mid row m+2 holds mid row m = image rows m-1..m+1 of unit 0's output
    (mid rows -1 and H fall outside the image and stay zero).
    """
    @pl.when(pl.program_id(0) == 0)
    def _():  # zero the permanent borders once; interiors rewritten per image
        xb_ref[:2] = jnp.zeros((2, W2, Cin), jnp.bfloat16)
        xb_ref[H + 2 :] = jnp.zeros((2, W2, Cin), jnp.bfloat16)
        xb_ref[:, :1] = jnp.zeros((H + 4, 1, Cin), jnp.bfloat16)
        xb_ref[:, W + 1 :] = jnp.zeros((H + 4, W2 - W - 1, Cin), jnp.bfloat16)
        mid_ref[:2] = jnp.zeros((2, W2, Cmid), jnp.bfloat16)
        mid_ref[H + 2 :] = jnp.zeros((2, W2, Cmid), jnp.bfloat16)
        mid_ref[:, :1] = jnp.zeros((H + 4, 1, Cmid), jnp.bfloat16)
        mid_ref[:, W + 1 :] = jnp.zeros((H + 4, W2 - W - 1, Cmid), jnp.bfloat16)

    # interior copy (chunked; relu in bf16 — exact, and commutes with the
    # serving path's bf16 cast)
    for r0, rows in _chunks(H, TH):
        v = x_ref[0, pl.ds(r0, rows)].astype(jnp.bfloat16)
        if leading_relu0:
            v = jnp.maximum(v, jnp.bfloat16(0))
        xb_ref[pl.ds(r0 + 2, rows), 1 : W + 1, :] = v

    def dw9(src_ref, row0, rows, dw_ref):
        """Depthwise over bordered rows [row0, row0+rows+2) of src.

        Output position p (flattened (rows, W2)) maps to src (row0 + p//W2,
        p%W2 - 1 + dx); per dy one aligned (rows, W2, C) load reused by the
        three dx taps via two rolls (wrap elements land in border columns).
        """
        n = rows * W2
        accs = [None, None, None]
        for dy in range(3):
            v = src_ref[pl.ds(row0 + dy, rows)].astype(jnp.float32).reshape(n, -1)
            for dx in range(3):
                contrib = v * dw_ref[dy * 3 + dx, :][None, :]
                accs[dx] = contrib if accs[dx] is None else accs[dx] + contrib
        return pltpu.roll(accs[0], 1, axis=0) + accs[1] + pltpu.roll(accs[2], n - 1, axis=0)

    # border-column mask for mid stores (cols 0 and >= W+1 must stay zero)
    col = jax.lax.broadcasted_iota(jnp.int32, (TH * W2, 1), 0) % W2
    mvalid = ((col >= 1) & (col <= W)).astype(jnp.float32)

    # ---- unit 0: mid rows m in [0, H) -> mid_ref rows m+2 ------------------
    # mid row m = image row m (same grid, 'same' padding): taps read image
    # rows m-1..m+1 = xb rows m+1..m+3, so dw9 row0 = m+1.
    for m0, rows in _chunks(H, TH):
        n = rows * W2
        acc = dw9(xb_ref, m0 + 1, rows, dw0_ref)
        m = jnp.dot(acc.astype(jnp.bfloat16), pw0_ref[:], preferred_element_type=jnp.float32)
        m = jnp.maximum(m + b0_ref[0][None, :], 0.0) * mvalid[:n]
        mid_ref[pl.ds(m0 + 2, rows)] = m.reshape(rows, W2, Cmid).astype(jnp.bfloat16)

    # ---- unit 1 (+ optional row pool): out rows o in [0, H) ---------------
    for o0, rows in _chunks(H, TH):
        n = rows * W2
        acc = dw9(mid_ref, o0 + 1, rows, dw1_ref)
        o = jnp.dot(acc.astype(jnp.bfloat16), pw1_ref[:], preferred_element_type=jnp.float32)
        o = (o + b1_ref[0][None, :]).reshape(rows, W2, -1)
        out_ref[0, pl.ds(o0, rows)] = o.astype(out_ref.dtype)

    # keep out border columns deterministic (they are sliced away by callers
    # but feed the XLA column-pool window at col 0): zero them
    out_ref[0, :, :1] = jnp.zeros((H, 1, out_ref.shape[-1]), out_ref.dtype)
    out_ref[0, :, W + 1 :] = jnp.zeros((H, W2 - W - 1, out_ref.shape[-1]), out_ref.dtype)


@partial(jax.jit, static_argnames=("leading_relu0", "row_chunk", "interpret"))
def entry_pair_pallas(
    x, dw0, pw0, b0, dw1, pw1, b1, *, leading_relu0: bool = False,
    row_chunk: int = 512, interpret: bool = False,
):
    """Whole-image fused sepconv pair: (B, H, W, Cin) -> (B, H, W2, Cout).

    dw*: (9, C) tap-major; pw0: (Cin, Cmid); pw1: (Cmid, Cout); b*: (C,).
    Valid output columns are ``[:, :, 1:W+1, :]`` (W2 = W+2 rounded up to 16).
    """
    B, H, W, Cin = x.shape
    Cmid = pw0.shape[1]
    Cout = pw1.shape[1]
    W2 = _round_up(W + 2, 16)
    TH = max(1, min(row_chunk // W2, H))

    kernel = partial(
        _entry_kernel, H=H, W=W, W2=W2, Cin=Cin, Cmid=Cmid, TH=TH,
        leading_relu0=leading_relu0,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, Cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, Cin), lambda i: (0, 0)),
            pl.BlockSpec((Cin, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((9, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((Cmid, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W2, Cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W2, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 4, W2, Cin), jnp.bfloat16),
            pltpu.VMEM((H + 4, W2, Cmid), jnp.bfloat16),
        ],
        interpret=interpret,
    )(
        x,
        dw0.astype(jnp.float32), pw0.astype(jnp.bfloat16), b0.reshape(1, Cmid).astype(jnp.float32),
        dw1.astype(jnp.float32), pw1.astype(jnp.bfloat16), b1.reshape(1, Cout).astype(jnp.float32),
    )
    return out


def entry_pair(x, dw0, pw0, b0, dw1, pw1, b1, **kw):
    """Convenience: fused pair with the border columns sliced off."""
    B, H, W, _ = x.shape
    out = entry_pair_pallas(x, dw0, pw0, b0, dw1, pw1, b1, **kw)
    return out[:, :, 1 : W + 1, :]


# ---------------------------------------------------------------------------
# Whole-BLOCK fusion: [relu] -> pair -> maxpool3x3/s2 -> (+ skip conv) in one
# kernel. The input is read from HBM exactly once (the skip conv consumes the
# already-resident bordered copy) and only the pooled quarter-size output is
# written back.
# ---------------------------------------------------------------------------

_NEG = float(jnp.finfo(jnp.bfloat16).min)  # maxpool pad; never a valid max


def _entry_block_kernel(
    x_ref, dw0_ref, pw0_ref, b0_ref, dw1_ref, pw1_ref, b1_ref, skw_ref, skb_ref,
    out_ref, xb_ref, mid_ref, outs_ref,
    *, H, W, W2, Cin, Cmid, Cout, TH, leading_relu0, Hp, Wp,
):
    """One image per grid step -> pooled block output (Hp, W2/2, Cout).

    Layouts (3D refs: rows are whole (W2, C) tile-planes, so every row
    offset is aligned; only the in-row dx/column selections need rolls or
    strided slices):
      xb   (H+4, W2, Cin)   raw input, image row r at xb row r+2, zero borders
      mid  (H+4, W2, Cmid)  unit-0 output (relu'd), same row map, zero borders
      outs (H+2, W2, Cout)  unit-1 output, image row o at outs row o+1;
                            lead/tail rows and border cols are -inf (pool pad)
    """
    W2h = W2 // 2

    @pl.when(pl.program_id(0) == 0)
    def _():
        xb_ref[:2] = jnp.zeros((2, W2, Cin), jnp.bfloat16)
        xb_ref[H + 2 :] = jnp.zeros((2, W2, Cin), jnp.bfloat16)
        xb_ref[:, :1] = jnp.zeros((H + 4, 1, Cin), jnp.bfloat16)
        xb_ref[:, W + 1 :] = jnp.zeros((H + 4, W2 - W - 1, Cin), jnp.bfloat16)
        mid_ref[:2] = jnp.zeros((2, W2, Cmid), jnp.bfloat16)
        mid_ref[H + 2 :] = jnp.zeros((2, W2, Cmid), jnp.bfloat16)
        mid_ref[:, :1] = jnp.zeros((H + 4, 1, Cmid), jnp.bfloat16)
        mid_ref[:, W + 1 :] = jnp.zeros((H + 4, W2 - W - 1, Cmid), jnp.bfloat16)
        outs_ref[:1] = jnp.full((1, W2, Cout), _NEG, jnp.bfloat16)
        outs_ref[H + 1 :] = jnp.full((1, W2, Cout), _NEG, jnp.bfloat16)

    # raw interior copy — NO leading relu here: the skip conv must see the
    # pre-activation input (reference Block applies relu on the main path
    # only, /root/reference/Xception.py:60-67,88-92). The input block may be
    # physically wider than W (a previous fused block's padded output fed in
    # without an XLA slice pass); only cols [:W] are consumed.
    for r0, rows in _chunks(H, TH):
        v = x_ref[0, pl.ds(r0, rows)]
        if v.shape[1] != W:
            v = v[:, :W, :]
        xb_ref[pl.ds(r0 + 2, rows), 1 : W + 1, :] = v.astype(jnp.bfloat16)

    def dw9(src_ref, row0, rows, dw_ref, relu_src):
        n = rows * W2
        accs = [None, None, None]
        for dy in range(3):
            v = src_ref[pl.ds(row0 + dy, rows)].astype(jnp.float32).reshape(n, -1)
            if relu_src:
                v = jnp.maximum(v, 0.0)
            for dx in range(3):
                contrib = v * dw_ref[dy * 3 + dx, :][None, :]
                accs[dx] = contrib if accs[dx] is None else accs[dx] + contrib
        return pltpu.roll(accs[0], 1, axis=0) + accs[1] + pltpu.roll(accs[2], n - 1, axis=0)

    col = jax.lax.broadcasted_iota(jnp.int32, (TH * W2, 1), 0) % W2
    mvalid = ((col >= 1) & (col <= W)).astype(jnp.float32)

    # unit 0 (the leading relu of the main path fuses into the tap loads)
    for m0, rows in _chunks(H, TH):
        n = rows * W2
        acc = dw9(xb_ref, m0 + 1, rows, dw0_ref, leading_relu0)
        m = jnp.dot(acc.astype(jnp.bfloat16), pw0_ref[:], preferred_element_type=jnp.float32)
        m = jnp.maximum(m + b0_ref[0][None, :], 0.0) * mvalid[:n]
        mid_ref[pl.ds(m0 + 2, rows)] = m.reshape(rows, W2, Cmid).astype(jnp.bfloat16)

    # unit 1 -> outs (biased, un-pooled)
    for o0, rows in _chunks(H, TH):
        n = rows * W2
        acc = dw9(mid_ref, o0 + 1, rows, dw1_ref, False)
        o = jnp.dot(acc.astype(jnp.bfloat16), pw1_ref[:], preferred_element_type=jnp.float32)
        o = o + b1_ref[0][None, :]
        outs_ref[pl.ds(o0 + 1, rows)] = o.reshape(rows, W2, Cout).astype(jnp.bfloat16)

    # border columns of outs were written garbage above -> make them pool pads
    outs_ref[1 : H + 1, :1] = jnp.full((H, 1, Cout), _NEG, jnp.bfloat16)
    outs_ref[1 : H + 1, W + 1 :] = jnp.full((H, W2 - W - 1, Cout), _NEG, jnp.bfloat16)

    # ---- fused 3x3/s2 maxpool + skip conv + add ---------------------------
    # pooled row q = max(image rows 2q-1, 2q, 2q+1) = outs rows 2q, 2q+1,
    # 2q+2; the (2k, 2k+1) row pairs come from one read reshaped to
    # (rows, 2*W2, C) (layout-preserving: W2 % 16 == 0). Column stride-2
    # selection is NOT a Mosaic-supported gather; instead column PAIRS are
    # packed onto lanes — reshape (n2, C) -> (n2/2, 2C) — where even/odd
    # columns become lane slices and the pooled output is contiguous.
    THp = max(1, TH // 2)
    for q0, rows in _chunks(Hp, THp):
        n2 = rows * W2
        v01 = outs_ref[pl.ds(2 * q0 + 1, 2 * rows)].reshape(rows, 2 * W2, Cout)
        vm1 = outs_ref[pl.ds(2 * q0, 2 * rows)].reshape(rows, 2 * W2, Cout)
        # fp32 from here: pltpu.roll only supports 32-bit element types
        rowmax = jnp.maximum(
            jnp.maximum(v01[:, :W2, :], v01[:, W2:, :]), vm1[:, :W2, :]
        ).astype(jnp.float32)
        pk = rowmax.reshape(n2 // 2, 2 * Cout)  # lane-packed column pairs
        a = pk[:, :Cout]  # stored cols 2j'
        b = pk[:, Cout:]  # stored cols 2j'+1
        c = pltpu.roll(a, (n2 // 2) - 1, axis=0)  # cols 2j'+2 (wrap is a pad)
        pooled = jnp.maximum(jnp.maximum(a, b), c)
        # skip: img (2q, 2j') = xb rows 2q+2, stored cols 2j'+1 (odd lanes)
        ve = xb_ref[pl.ds(2 * q0 + 2, 2 * rows)].reshape(rows, 2 * W2, Cin)[:, :W2, :]
        xbe = ve.reshape(n2 // 2, 2 * Cin)[:, Cin:]
        sk = jnp.dot(xbe, skw_ref[:], preferred_element_type=jnp.float32) + skb_ref[0][None, :]
        out_ref[0, pl.ds(q0 * W2h, rows * W2h)] = (pooled + sk).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("leading_relu0", "row_chunk", "valid_w", "interpret"))
def entry_block_pallas(
    x, dw0, pw0, b0, dw1, pw1, b1, skw, skb, *, leading_relu0: bool = False,
    row_chunk: int = 512, valid_w: int = 0, interpret: bool = False,
):
    """Whole fused entry/exit block: (B, H, W, Cin) -> (B, Hp, W2/2, Cout).

    Computes ``maxpool3x3/s2(pair([relu(x)])) + conv1x1/s2(x) + skb`` with a
    single HBM read of x and a single pooled write. skw: (Cin, Cout) folded
    skip weights; skb: (Cout,). Valid output columns are ``[:, :, :Wp, :]``
    with Wp = (W+1)//2 (callers slice; XLA fuses it into the consumer).

    ``valid_w``: if nonzero, only input columns [:valid_w] are real (the rest
    is a previous fused block's storage padding, consumed without an XLA
    slice-materialization pass between the two pallas calls).
    """
    B, H, W, Cin = x.shape
    if valid_w:
        W = valid_w
    Cmid = pw0.shape[1]
    Cout = pw1.shape[1]
    W2 = _round_up(W + 2, 16)
    Hp, Wp = (H + 1) // 2, (W + 1) // 2
    TH = max(2, min(row_chunk // W2, H))

    # the column-pair lane packing in the pool/skip stage shape-casts
    # (.., C) -> (.., 2C), which Mosaic supports only for C % 128 == 0:
    # zero-pad Cin/Cout to the lane tile (weights are tiny; for x the pad is
    # only paid when Cin is unaligned — at 256^2 that's exit block 12 only)
    Cin_p = _round_up(Cin, 128)
    Cout_p = _round_up(Cout, 128)
    if Cin_p != Cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cin_p - Cin)))
        dw0 = jnp.pad(dw0, ((0, 0), (0, Cin_p - Cin)))
        pw0 = jnp.pad(pw0, ((0, Cin_p - Cin), (0, 0)))
        skw = jnp.pad(skw, ((0, Cin_p - Cin), (0, 0)))
        Cin = Cin_p
    Cout_orig = Cout
    if Cout_p != Cout:  # dw1 acts on Cmid and needs no pad
        pw1 = jnp.pad(pw1, ((0, 0), (0, Cout_p - Cout)))
        b1 = jnp.pad(b1, ((0, Cout_p - Cout),))
        skw = jnp.pad(skw, ((0, 0), (0, Cout_p - Cout)))
        skb = jnp.pad(skb, ((0, Cout_p - Cout),))
        Cout = Cout_p

    kernel = partial(
        _entry_block_kernel, H=H, W=W, W2=W2, Cin=Cin, Cmid=Cmid, Cout=Cout,
        TH=TH, leading_relu0=leading_relu0, Hp=Hp, Wp=Wp,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, Cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, Cin), lambda i: (0, 0)),
            pl.BlockSpec((Cin, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((9, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((Cmid, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
            pl.BlockSpec((Cin, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hp * (W2 // 2), Cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp * (W2 // 2), Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 4, W2, Cin), jnp.bfloat16),
            pltpu.VMEM((H + 4, W2, Cmid), jnp.bfloat16),
            pltpu.VMEM((H + 2, W2, Cout), jnp.bfloat16),
        ],
        interpret=interpret,
    )(
        x,
        dw0.astype(jnp.float32), pw0.astype(jnp.bfloat16), b0.reshape(1, Cmid).astype(jnp.float32),
        dw1.astype(jnp.float32), pw1.astype(jnp.bfloat16), b1.reshape(1, Cout).astype(jnp.float32),
        skw.astype(jnp.bfloat16), skb.reshape(1, Cout).astype(jnp.float32),
    )
    return out.reshape(B, Hp, W2 // 2, Cout)[..., :Cout_orig]


def entry_block(x, dw0, pw0, b0, dw1, pw1, b1, skw, skb, **kw):
    """Fused block with the invalid pooled columns sliced off."""
    B, H, W, _ = x.shape
    out = entry_block_pallas(x, dw0, pw0, b0, dw1, pw1, b1, skw, skb, **kw)
    return out[:, :, : (W + 1) // 2, :]


def pack_entry_block(folded_block):
    """fold-output stride-2 two-unit block -> ``entry_block`` weights."""
    u0, u1 = folded_block["units"]

    def unpack(u):
        dwk = u["depthwise"]["w"]  # (3, 3, 1, C)
        return (
            dwk[:, :, 0, :].reshape(9, dwk.shape[-1]).astype(jnp.float32),
            u["pointwise"]["w"][0, 0],
            u["pointwise"]["b"].astype(jnp.float32),
        )

    dw0, pw0, b0 = unpack(u0)
    dw1, pw1, b1 = unpack(u1)
    sk = folded_block["skip"]
    return dw0, pw0, b0, dw1, pw1, b1, sk["w"][0, 0], sk["b"].astype(jnp.float32)


# Tallest image the whole-image kernel keeps resident in VMEM; taller inputs
# route to the striped kernel (sepconv_entry_striped.py). fold.py derives its
# striped-vs-whole-image threshold from this same constant.
WHOLE_IMAGE_MAX_ROWS = 96


def is_fusable_entry_block(folded_block, h_shape) -> bool:
    """Gate for routing a stride-2 two-unit skip block through the fused
    kernel. DEFAULT OFF: in-situ measurement (tools/netbench.py, PERF.md r2)
    showed XLA runs the entry flow in batch-minor layouts (batch rides the
    lane axis) reaching 5.1 ms on block2 where this kernel costs 5.9 — and
    any pallas custom call at those edges forces global relayout copies
    (~1 GB at 125^2) that XLA threads upstream, so EVERY fused-entry config
    regresses the net despite the kernel winning in isolation. The kernel
    stays available (exact, hardware-validated) for shapes/batches where the
    balance differs; set MDFD_ENTRY_FUSE_H="63,32" to route specific block
    heights through it.
    """
    if "skip" not in folded_block or len(folded_block["units"]) != 2:
        return False
    import os

    allow = os.environ.get("MDFD_ENTRY_FUSE_H")
    if allow is not None:
        return str(h_shape[1]) in allow.split(",")
    return False
