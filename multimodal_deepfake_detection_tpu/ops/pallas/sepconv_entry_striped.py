"""Striped fused entry block: the 125^2 block 1 case of Xception's entry flow.

Same fusion as ``sepconv_entry.entry_block_pallas`` — ``[relu] -> dw3x3 ->
pw+b -> relu -> dw3x3 -> pw+b -> maxpool3x3/s2 (+ skip conv1x1/s2 + b)`` in
one kernel, one HBM read of x, one pooled write (/root/reference/
Xception.py:50-99,118) — but for images too tall for whole-image VMEM
residency (block 1: 125x125, 10.6 ms on XLA in-situ, the single fattest
entry stage). The image is processed in SH-row stripes:

* grid is (B,); the stripe loop is a STATIC in-kernel Python loop, so every
  DMA extent, emission range and edge fixup is compile-time constant — the
  ragged pooled-row emission per stripe (12/13 rows alternating for
  H=125/SH=25) needs no dynamic control flow;
* input stripes stream HBM->VMEM through a 2-slot manual DMA pipeline
  (stripe s+1 prefetched during s; the next image's first stripe prefetched
  during the last). The input is pre-padded XLA-side to (B, H+4, W2, Cin)
  with zero border rows/cols, so every DMA window is a full-width, always
  in-bounds, tile-aligned slab — and the pad pass subsumes the layout copy
  XLA inserts at custom-call edges anyway;
* the 3x3/s2 max-pool crosses stripe boundaries, so the last two unit-1
  output rows of each stripe are CARRIED in the persistent outs scratch
  (rows sSH-2, sSH-1 live at offsets 0..1 for the next stripe);
* the skip conv is computed on ALL columns from the resident input stripe
  and the stride-2 column selection happens on its OUTPUT via the
  column-pair lane packing (needs Cout % 128 == 0 only — so Cin = 64 needs
  no lane padding and rides its natural half-tile).

Tap scheme and pool packing follow sepconv_entry.py (PERF.md round 2).
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


_NEG = float(jnp.finfo(jnp.bfloat16).min)


def _striped_kernel(
    x_hbm, dw0_ref, pw0_ref, b0_ref, dw1_ref, pw1_ref, b1_ref, skw_ref, skb_ref,
    out_ref, xs_ref, mid_ref, outs_ref, sem,
    *, B, H, W, W2, Cin, Cmid, Cout, SH, NS, TH, Hp, leading_relu0,
):
    img = pl.program_id(0)
    XR = SH + 4  # window rows per stripe: image rows [sSH-2, sSH+SH+2)

    # x_hbm is the XLA-side zero-padded (B, H+4, W2, Cin) layout: padded row
    # p holds image row p-2, with 1 left / W2-W-1 right zero border columns.
    # Every DMA is a full-width whole-tile-plane window — always aligned.
    def dma_for(img_idx, s, slot):
        return pltpu.make_async_copy(
            x_hbm.at[img_idx, pl.ds(s * SH, XR), :, :],
            xs_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(img == 0)
    def _():
        # one-time mid border zeroing (interiors rewritten per chunk) + first DMA
        mid_ref[:, :1] = jnp.zeros((SH + 4, 1, Cmid), jnp.bfloat16)
        mid_ref[:, W + 1 :] = jnp.zeros((SH + 4, W2 - W - 1, Cmid), jnp.bfloat16)
        dma_for(0, 0, 0).start()

    def dw9(src, row0, rows, dw_ref, relu_src):
        n = rows * W2
        accs = [None, None, None]
        for dy in range(3):
            v = src[pl.ds(row0 + dy, rows)].astype(jnp.float32).reshape(n, -1)
            if relu_src:
                v = jnp.maximum(v, 0.0)
            for dx in range(3):
                contrib = v * dw_ref[dy * 3 + dx, :][None, :]
                accs[dx] = contrib if accs[dx] is None else accs[dx] + contrib
        return pltpu.roll(accs[0], 1, axis=0) + accs[1] + pltpu.roll(accs[2], n - 1, axis=0)

    col = jax.lax.broadcasted_iota(jnp.int32, (TH * W2, 1), 0) % W2
    mvalid = ((col >= 1) & (col <= W)).astype(jnp.float32)

    qe_prev = 0
    for s in range(NS):
        slot = (img * NS + s) % 2  # NS odd -> alternates across images too
        # prefetch the next stripe (next image's stripe 0 on the last)
        if s + 1 < NS:
            dma_for(img, s + 1, (img * NS + s + 1) % 2).start()
        else:

            @pl.when(img + 1 < B)
            def _():
                dma_for(img + 1, 0, (img * NS + NS) % 2).start()

        dma_for(img, s, slot).wait()
        xs = xs_ref.at[slot]

        # ---- carry + pool-pad management of the persistent outs buffer ----
        # outs offset u <-> out image row sSH-2+u; unit 1 writes u in [2, SH+2)
        if s == 0:
            outs_ref[:2] = jnp.full((2, W2, Cout), _NEG, jnp.bfloat16)
        else:
            outs_ref[:2] = outs_ref[SH : SH + 2]

        # ---- unit 0: mid rows m in [sSH-1, sSH+SH+1), offset m-sSH+2 ------
        # taps of mid row m read window rows (m-1..m+1)-(sSH-2) = m-sSH+1+dy
        for c0, rows in _chunks(SH + 2, TH):
            n = rows * W2
            m0 = c0 - 1  # first mid row of the chunk, relative to sSH
            acc = dw9(xs, m0 + 1, rows, dw0_ref, leading_relu0)
            m = jnp.dot(acc.astype(jnp.bfloat16), pw0_ref[:], preferred_element_type=jnp.float32)
            m = jnp.maximum(m + b0_ref[0][None, :], 0.0) * mvalid[:n]
            mid_ref[pl.ds(c0 + 1, rows)] = m.reshape(rows, W2, Cmid).astype(jnp.bfloat16)
        if s == 0:  # mid image row -1 lies outside the image: zero
            mid_ref[1:2, 1 : W + 1, :] = jnp.zeros((1, W, Cmid), jnp.bfloat16)
        if s == NS - 1:  # mid image row H
            mid_ref[SH + 2 : SH + 3, 1 : W + 1, :] = jnp.zeros((1, W, Cmid), jnp.bfloat16)

        # ---- unit 1: out rows o in [sSH, sSH+SH), outs offset o-sSH+2 -----
        # taps read mid rows (o-1..o+1)-(sSH-2)... = o-sSH+1+dy
        for c0, rows in _chunks(SH, TH):
            n = rows * W2
            acc = dw9(mid_ref, c0 + 1, rows, dw1_ref, False)
            o = jnp.dot(acc.astype(jnp.bfloat16), pw1_ref[:], preferred_element_type=jnp.float32)
            o = o + b1_ref[0][None, :]
            outs_ref[pl.ds(c0 + 2, rows)] = o.reshape(rows, W2, Cout).astype(jnp.bfloat16)
        # border columns feed the column-pool windows: make them pads
        outs_ref[2 : SH + 2, :1] = jnp.full((SH, 1, Cout), _NEG, jnp.bfloat16)
        outs_ref[2 : SH + 2, W + 1 :] = jnp.full((SH, W2 - W - 1, Cout), _NEG, jnp.bfloat16)
        if s == NS - 1:  # out image row H for the last pool window
            outs_ref[SH + 2 : SH + 3] = jnp.full((1, W2, Cout), _NEG, jnp.bfloat16)

        # ---- pooled emission q in [qe_prev, qe) + skip ---------------------
        qe = Hp if s == NS - 1 else (s * SH + SH) // 2
        qs = qe_prev
        qe_prev = qe
        W2h = W2 // 2
        for q0, rows in _chunks(qe - qs, max(1, TH // 2)):
            q = qs + q0
            n2 = rows * W2
            # out rows 2q..2q+1 at offsets 2q-sSH+2; row 2q-1 one lower
            o0 = 2 * q - s * SH + 2
            v01 = outs_ref[pl.ds(o0, 2 * rows)].reshape(rows, 2 * W2, Cout)
            vm1 = outs_ref[pl.ds(o0 - 1, 2 * rows)].reshape(rows, 2 * W2, Cout)
            rowmax = jnp.maximum(
                jnp.maximum(v01[:, :W2, :], v01[:, W2:, :]), vm1[:, :W2, :]
            ).astype(jnp.float32)
            pk = rowmax.reshape(n2 // 2, 2 * Cout)
            a = pk[:, :Cout]
            b = pk[:, Cout:]
            c = pltpu.roll(a, (n2 // 2) - 1, axis=0)
            pooled = jnp.maximum(jnp.maximum(a, b), c)
            # skip on ALL columns (even rows 2q = window rows 2q-sSH+4... ),
            # stride-2 column selection on the OUTPUT via lane packing
            w0 = 2 * q - s * SH + 2  # window row of image row 2q
            ve = xs[pl.ds(w0, 2 * rows)].reshape(rows, 2 * W2, Cin)[:, :W2, :]
            sk_full = jnp.dot(
                ve.reshape(n2, Cin).astype(jnp.bfloat16), skw_ref[:],
                preferred_element_type=jnp.float32,
            )
            skp = sk_full.reshape(n2 // 2, 2 * Cout)[:, Cout:]  # odd stored cols
            out = pooled + skp + skb_ref[0][None, :]
            out_ref[0, pl.ds(q * W2h, rows * W2h)] = out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("leading_relu0", "stripe_rows", "row_chunk", "interpret"))
def entry_block_striped_pallas(
    x, dw0, pw0, b0, dw1, pw1, b1, skw, skb, *, leading_relu0: bool = False,
    stripe_rows: int = 0, row_chunk: int = 1024, interpret: bool = False,
):
    """Striped fused entry block: (B, H, W, Cin) -> (B, Hp, W2/2, Cout).

    Valid output columns are [:, :, :Wp, :], Wp = (W+1)//2. Requires
    stripe_rows | H (auto-picked otherwise) and pads Cout to the lane tile
    (the pool/skip lane packing needs Cout % 128 == 0; Cin is unrestricted).
    """
    B, H, W, Cin = x.shape
    Cmid = pw0.shape[1]
    Cout = pw1.shape[1]
    W2 = _round_up(W + 2, 16)
    Hp = (H + 1) // 2

    # Stripe height: a divisor of H in [2, 40]. SH >= 2 is required — the
    # pool-carry copy outs_ref[:2] = outs_ref[SH:SH+2] self-overlaps at SH=1
    # (row 1 read and written in one aliased VMEM assignment).
    SH = stripe_rows or next(
        (H // d for d in range(2, H + 1) if H % d == 0 and 2 <= (H // d) <= 40), 0
    )
    if SH < 2 or H % SH:
        raise ValueError(
            f"no stripe height in [2, 40] divides H={H}; pass stripe_rows explicitly"
        )
    NS = H // SH

    # HBM DMA windows must be whole-lane-tile: pad Cin to 128 (zero channels
    # are inert; the pad fuses into the bordered-layout pass below, and the
    # VMEM stripe buffers were physically 128-lane anyway)
    Cin_p = _round_up(Cin, 128)
    if Cin_p != Cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cin_p - Cin)))
        dw0 = jnp.pad(dw0, ((0, 0), (0, Cin_p - Cin)))
        pw0 = jnp.pad(pw0, ((0, Cin_p - Cin), (0, 0)))
        skw = jnp.pad(skw, ((0, Cin_p - Cin), (0, 0)))
        Cin = Cin_p

    Cout_orig = Cout
    Cout_p = _round_up(Cout, 128)
    if Cout_p != Cout:
        pw1 = jnp.pad(pw1, ((0, 0), (0, Cout_p - Cout)))
        b1 = jnp.pad(b1, ((0, Cout_p - Cout),))
        skw = jnp.pad(skw, ((0, 0), (0, Cout_p - Cout)))
        skb = jnp.pad(skb, ((0, Cout_p - Cout),))
        Cout = Cout_p

    TH = max(2, min(row_chunk // W2, SH))
    kernel = partial(
        _striped_kernel, B=B, H=H, W=W, W2=W2, Cin=Cin, Cmid=Cmid, Cout=Cout,
        SH=SH, NS=NS, TH=TH, Hp=Hp, leading_relu0=leading_relu0,
    )
    # bordered layout pass: 2 zero rows top/bottom, 1 left + W2-W-1 right
    # zero cols. ONE fused XLA pad (it also subsumes the layout copy XLA
    # would otherwise insert at the custom-call edge, PERF.md r2).
    x = jnp.pad(x, ((0, 0), (2, 2), (1, W2 - W - 1), (0, 0)))

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM, manual DMA
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
            pltpu.VMEM((2, SH + 4, W2, Cin), jnp.bfloat16),
            pltpu.VMEM((SH + 4, W2, Cmid), jnp.bfloat16),
            pltpu.VMEM((SH + 4, W2, Cout), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        x,
        dw0.astype(jnp.float32), pw0.astype(jnp.bfloat16), b0.reshape(1, Cmid).astype(jnp.float32),
        dw1.astype(jnp.float32), pw1.astype(jnp.bfloat16), b1.reshape(1, Cout).astype(jnp.float32),
        skw.astype(jnp.bfloat16), skb.reshape(1, Cout).astype(jnp.float32),
    )
    return out.reshape(B, Hp, W2 // 2, Cout)[..., :Cout_orig]


def entry_block_striped(x, dw0, pw0, b0, dw1, pw1, b1, skw, skb, **kw):
    """Striped fused block with the invalid pooled columns sliced off."""
    B, H, W, _ = x.shape
    out = entry_block_striped_pallas(x, dw0, pw0, b0, dw1, pw1, b1, skw, skb, **kw)
    return out[:, :, : (W + 1) // 2, :]
