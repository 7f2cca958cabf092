#!/usr/bin/env python
"""Probe: depthwise-3x3 VPU tap throughput, per-image vs hw-major layouts.

The round-2 entry-fusion postmortem (PERF.md) found the per-image tap path
runs at ~1T VPU-ops/s effective — rolls, masks and sub-tile geometry eat the
VPU — while XLA's entry convs use batch-minor layouts. This probe measures
the SAME 9-tap depthwise work in:

  a) per-image layout: (rows*W2, C) chunks, 3 aligned loads + 2 rolls
     (the sepconv_entry.py scheme);
  b) hw-major layout: (rows*W2*Btile, C) with batch innermost — every tap
     offset is dy*W2*Btile + dx*Btile sublanes, ALWAYS tile-aligned: 9
     aligned loads, 9 FMAs, no rolls, no masks.

Edge correctness is ignored (taps may read across stripe boundaries) — this
is a pure throughput probe, not a kernel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_hwmajor.py
"""
from __future__ import annotations

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    B, H, W2, C = 256, 30, 80, 128  # ~block2 unit-0 geometry
    rng = np.random.default_rng(0)
    dw = jnp.asarray(rng.standard_normal((9, C)) * 0.1, jnp.float32)

    # ---- a) per-image: grid (B,), block (1, H*W2, C), rolls for dx --------
    def k_img(x_ref, dw_ref, o_ref):
        n = x_ref.shape[1]
        accs = [None, None, None]
        for dy in range(3):
            v = x_ref[0, pl.ds(0, n)].astype(jnp.float32)  # aligned proxy load
            for dx in range(3):
                c = v * dw_ref[dy * 3 + dx, :][None, :]
                accs[dx] = c if accs[dx] is None else accs[dx] + c
        acc = pltpu.roll(accs[0], 1, axis=0) + accs[1] + pltpu.roll(accs[2], n - 1, axis=0)
        o_ref[0] = acc.astype(jnp.bfloat16)

    @jax.jit
    def run_img(x):
        return pl.pallas_call(
            k_img,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H * W2, C), lambda i: (i, 0, 0)),
                pl.BlockSpec((9, C), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, H * W2, C), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H * W2, C), jnp.bfloat16),
        )(x, dw)

    # ---- b) hw-major: grid (B/BT * H/SH,), all taps tile-aligned ----------
    BT, SH = 16, 6  # batch tile x row stripe; shifts are d*BT sublanes
    def k_hw(x_ref, dw_ref, o_ref):
        n = (SH - 3) * W2 * BT  # interior rows only (edge-correctness skipped)
        acc = None
        for dy in range(3):
            for dx in range(3):
                off = (dy * W2 + dx) * BT
                v = x_ref[0, pl.ds(off, n)].astype(jnp.float32)
                c = v * dw_ref[dy * 3 + dx, :][None, :]
                acc = c if acc is None else acc + c
        o_ref[0, pl.ds(0, n)] = acc.astype(jnp.bfloat16)
        o_ref[0, pl.ds(n, 3 * W2 * BT)] = jnp.zeros((3 * W2 * BT, C), jnp.bfloat16)

    NB = (B // BT) * (H // SH)

    @jax.jit
    def run_hw(x):
        return pl.pallas_call(
            k_hw,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, SH * W2 * BT, C), lambda i: (i, 0, 0)),
                pl.BlockSpec((9, C), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, SH * W2 * BT, C), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, SH * W2 * BT, C), jnp.bfloat16),
        )(x, dw)

    # ---- c) the transpose cost an hw-major trunk would pay at each edge ---
    @jax.jit
    def run_tr(xi):
        return jnp.transpose(xi, (1, 2, 0, 3))  # (B,H,W,C) -> (H,W,B,C)

    def chain_ms(run, x, ka=10, kb=40, iters=8):
        def make(K):
            @jax.jit
            def f(xin, i):
                h = xin * (1 + i.astype(jnp.float32) * 1e-6).astype(xin.dtype)
                h = jax.lax.fori_loop(
                    0, K, lambda t, h: run(h).astype(h.dtype).reshape(h.shape), h
                )
                return jnp.sum(h.astype(jnp.float32))

            return lambda i: f(x, jnp.int32(i))

        def timed(call):
            float(call(10**6)); float(call(10**6 + 1))
            t0 = time.perf_counter()
            outs = [call(i) for i in range(iters)]
            _ = sum(float(o) for o in outs)
            return (time.perf_counter() - t0) / iters

        ta, tb = timed(make(ka)), timed(make(kb))
        return (tb - ta) / (kb - ka) * 1e3

    xa = jnp.asarray(rng.standard_normal((B, H * W2, C)) * 0.5, jnp.bfloat16)
    xb = jnp.asarray(rng.standard_normal((NB, SH * W2 * BT, C)) * 0.5, jnp.bfloat16)
    xt = jnp.asarray(rng.standard_normal((B, H, W2, C)) * 0.5, jnp.bfloat16)

    ops = B * H * W2 * C * 9 * 2
    ms_a = chain_ms(run_img, xa)
    print(f"per-image taps : {ms_a:7.3f} ms  ({ops/ms_a/1e9:6.1f} G vpu-flop/ms)", flush=True)
    ms_b = chain_ms(run_hw, xb)
    ops_b = ops * (SH - 3) / SH  # only interior rows are computed
    print(f"hw-major taps  : {ms_b:7.3f} ms  ({ops_b/ms_b/1e9:6.1f} G vpu-flop/ms)", flush=True)

    def chain_tr(K):
        @jax.jit
        def f(xin, i):
            h = xin * (1 + i.astype(jnp.float32) * 1e-6).astype(xin.dtype)
            def body(t, h):
                ht = jnp.transpose(h, (1, 2, 0, 3))
                return jnp.transpose(ht, (2, 0, 1, 3))
            h = jax.lax.fori_loop(0, K, body, h)
            return jnp.sum(h.astype(jnp.float32))
        return lambda i: f(xt, jnp.int32(i))

    def timed(call, iters=8):
        float(call(10**6)); float(call(10**6 + 1))
        t0 = time.perf_counter()
        outs = [call(i) for i in range(iters)]
        _ = sum(float(o) for o in outs)
        return (time.perf_counter() - t0) / iters

    ta, tb = timed(chain_tr(10)), timed(chain_tr(40))
    ms_t = (tb - ta) / 30 * 1e3 / 2  # per single transpose
    print(f"transpose (B,H,W,C)<->(H,W,B,C) @ {xt.nbytes/1e6:.0f} MB: {ms_t:7.3f} ms each", flush=True)


if __name__ == "__main__":
    main()
