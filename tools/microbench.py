#!/usr/bin/env python
"""Per-stage TPU microbenchmarks (kernel iteration harness, round 2).

Measures individual Xception stages on the real TPU behind the relay, which
has a ~30 ms per-call floor and memoizes identical (executable, args) calls
(see PERF.md "Measurement methodology"). Validity is obtained by:

* CHAINING: the stage under test is applied K times output->input inside one
  jit, so no iteration can be CSE'd or algebraically factored;
* K-DIFFERENCING: per-application time = (T(K=kb) - T(K=ka)) / (kb - ka),
  cancelling the relay floor, the input upload, and any fixed prologue;
* distinct step-index args per call (relay memoization) and a scalar host
  readback as the completion barrier, with all launches pipelined.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench.py middle
  PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench.py entry
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _timed(call, iters=10, warmup=2):
    """Mean seconds/call; ``call(i)`` must fold i into the computation."""
    for w in range(warmup):
        float(call(1_000_000 + w))
    t0 = time.perf_counter()
    outs = [call(i) for i in range(iters)]
    _ = sum(float(o) for o in outs)
    return (time.perf_counter() - t0) / iters


def _chain_ms(make_runk, ka, kb, iters=10):
    """Per-application ms of a chained stage via K-differencing."""
    run_a, run_b = make_runk(ka), make_runk(kb)
    import jax.numpy as jnp

    ta = _timed(lambda i: run_a(jnp.int32(i)), iters=iters)
    tb = _timed(lambda i: run_b(jnp.int32(i)), iters=iters)
    return (tb - ta) / (kb - ka) * 1e3


def bench_middle(args):
    import jax
    import jax.numpy as jnp

    from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_block import (
        middle_block_pallas,
        middle_block_pallas_v2,
    )
    from multimodal_deepfake_detection_tpu.ops.conv import conv2d

    B, H, W, C, reps = args.batch, 16, 16, 728, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.5, jnp.bfloat16)
    dw = jnp.asarray(rng.standard_normal((reps, 9, C)) * 0.1, jnp.float32)
    pw = jnp.asarray(rng.standard_normal((reps, C, C)) * 0.01, jnp.float32)
    b = jnp.asarray(rng.standard_normal((reps, C)) * 0.01, jnp.float32)

    def xla_block(h):
        inp = h
        for r in range(reps):
            h = jax.nn.relu(h)
            hc = h.astype(jnp.bfloat16)
            hc = conv2d({"w": dw[r].reshape(3, 3, 1, C)}, hc, stride=1, padding=1, groups=C)
            h = conv2d({"w": pw[r].reshape(1, 1, C, C)}, hc.astype(jnp.bfloat16)) + b[r]
        return (h + inp.astype(h.dtype)).astype(jnp.bfloat16)

    variants = {
        "xla": xla_block,
        "v1_ips2": lambda h: middle_block_pallas(h, dw, pw, b, images_per_step=2),
        "v2_precise_ips2": lambda h: middle_block_pallas_v2(h, dw, pw, b, images_per_step=2, precise=True),
        "v2_precise_ips1": lambda h: middle_block_pallas_v2(h, dw, pw, b, images_per_step=1, precise=True),
        "v2_precise_ips4": lambda h: middle_block_pallas_v2(h, dw, pw, b, images_per_step=4, precise=True),
        "v3_pad32_ips2": lambda h: middle_block_pallas_v2(h, dw, pw, b, images_per_step=2, precise=True, pad_fp32=True),
        "v3_pad32_ips4": lambda h: middle_block_pallas_v2(h, dw, pw, b, images_per_step=4, precise=True, pad_fp32=True),
        "v4_perimg_ips2": lambda h: middle_block_pallas_v2(h, dw, pw, b, images_per_step=2, precise=True, per_image_dot=True),
        "v4_perimg_ips4": lambda h: middle_block_pallas_v2(h, dw, pw, b, images_per_step=4, precise=True, per_image_dot=True),
    }
    for ips in (1, 2, 4):
        variants[f"v2_ips{ips}"] = lambda h, ips=ips: middle_block_pallas_v2(h, dw, pw, b, images_per_step=ips)

    # pointwise + depthwise FLOPs of one block application over the batch
    flops = B * reps * (H * W * C * C * 2 + H * W * C * 9 * 2)
    results = {}
    for name, block in variants.items():
        if args.only and args.only not in name:
            continue

        def make_runk(K, block=block):
            @jax.jit
            def runk(xin, i):
                h = xin * (1 + i.astype(jnp.float32) * 1e-6).astype(xin.dtype)
                h = jax.lax.fori_loop(0, K, lambda t, h: block(h), h)
                return jnp.sum(h.astype(jnp.float32))

            return lambda i: runk(x, jnp.int32(i))

        ms = _chain_ms(make_runk, args.ka, args.kb, iters=args.iters)
        tflops = flops / (ms * 1e-3) / 1e12
        results[name] = {"ms_per_block": round(ms, 3), "tflops": round(tflops, 1)}
        print(f"middle {name:18s} {ms:7.3f} ms/block  {tflops:6.1f} TFLOP/s", flush=True)
    print(json.dumps({"mode": "middle", "batch": B, "results": results}))


def bench_entry(args):
    import jax
    import jax.numpy as jnp

    from multimodal_deepfake_detection_tpu.ops.conv import conv2d, max_pool2d

    # entry blocks for 256^2 input: (H, W, Cin, Cmid/Cout, leading_relu0)
    shapes = {
        1: (125, 64, 128, False),
        2: (63, 128, 256, True),
        3: (32, 256, 728, True),
    }
    H, Cin, Cout, lead = shapes[args.block]
    B = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, H, Cin)) * 0.5, jnp.bfloat16)
    dw0 = jnp.asarray(rng.standard_normal((9, Cin)) * 0.1, jnp.float32)
    pw0 = jnp.asarray(rng.standard_normal((Cin, Cout)) * 0.02, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((Cout,)) * 0.01, jnp.float32)
    dw1 = jnp.asarray(rng.standard_normal((9, Cout)) * 0.1, jnp.float32)
    pw1 = jnp.asarray(rng.standard_normal((Cout, Cout)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((Cout,)) * 0.01, jnp.float32)
    skip_w = jnp.asarray(rng.standard_normal((1, 1, Cin, Cout)) * 0.02, jnp.bfloat16)
    # projection back to the input shape so the block can be CHAINED: shared
    # by every variant, so A/B differences are exactly the pair-under-test.
    proj_w = jnp.asarray(rng.standard_normal((1, 1, Cout, Cin)) * 0.02, jnp.bfloat16)

    def pair_xla(h):
        if lead:
            h = jax.nn.relu(h)
        hb = h.astype(jnp.bfloat16)
        hb = conv2d({"w": dw0.reshape(3, 3, 1, Cin).astype(jnp.bfloat16)}, hb, stride=1, padding=1, groups=Cin)
        hb = conv2d({"w": pw0.reshape(1, 1, Cin, Cout).astype(jnp.bfloat16)}, hb) + b0
        hb = jax.nn.relu(hb).astype(jnp.bfloat16)
        hb = conv2d({"w": dw1.reshape(3, 3, 1, Cout).astype(jnp.bfloat16)}, hb, stride=1, padding=1, groups=Cout)
        hb = conv2d({"w": pw1.reshape(1, 1, Cout, Cout).astype(jnp.bfloat16)}, hb) + b1
        return hb.astype(jnp.bfloat16)

    def pair_xla_nodw(h):
        # ablation: both depthwise convs removed — isolates XLA's dw cost
        if lead:
            h = jax.nn.relu(h)
        hb = h.astype(jnp.bfloat16)
        hb = conv2d({"w": pw0.reshape(1, 1, Cin, Cout).astype(jnp.bfloat16)}, hb) + b0
        hb = jax.nn.relu(hb).astype(jnp.bfloat16)
        hb = conv2d({"w": pw1.reshape(1, 1, Cout, Cout).astype(jnp.bfloat16)}, hb) + b1
        return hb.astype(jnp.bfloat16)

    def pair_xla_nopw(h):
        # ablation: only the two depthwise convs (plus a 1x1 to fix Cout)
        if lead:
            h = jax.nn.relu(h)
        hb = h.astype(jnp.bfloat16)
        hb = conv2d({"w": dw0.reshape(3, 3, 1, Cin).astype(jnp.bfloat16)}, hb, stride=1, padding=1, groups=Cin)
        hb = conv2d({"w": pw0.reshape(1, 1, Cin, Cout).astype(jnp.bfloat16)}, hb) + b0
        hb = jax.nn.relu(hb).astype(jnp.bfloat16)
        hb = conv2d({"w": dw1.reshape(3, 3, 1, Cout).astype(jnp.bfloat16)}, hb, stride=1, padding=1, groups=Cout)
        return hb.astype(jnp.bfloat16)

    def pair_stream(h):
        from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_stream import sepconv_pair_stream_pallas

        return sepconv_pair_stream_pallas(
            h, dw0, pw0, b0, dw1, pw1, b1, leading_relu0=lead, stripe_rows=args.stripe_rows
        )

    def pair_stream_v2(h):
        from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_stream2 import sepconv_pair_stream2_pallas

        return sepconv_pair_stream2_pallas(
            h, dw0, pw0, b0, dw1, pw1, b1, leading_relu0=lead, row_chunk=args.row_chunk
        )

    def pair_stream_v2_roll(h):
        from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_stream2 import sepconv_pair_stream2_pallas

        return sepconv_pair_stream2_pallas(
            h, dw0, pw0, b0, dw1, pw1, b1, leading_relu0=lead, row_chunk=args.row_chunk,
            dx_roll=True, ablate=args.ablate,
        )

    def pair_entry3(h):
        from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_entry import entry_pair

        return entry_pair(h, dw0, pw0, b0, dw1, pw1, b1, leading_relu0=lead, row_chunk=args.row_chunk)

    def whole_block(pair):
        def blk(h):
            u = pair(h)
            u = max_pool2d(u, 3, 2, 1)
            skip = conv2d({"w": skip_w}, h.astype(jnp.bfloat16), stride=2)
            out = (u + skip).astype(jnp.bfloat16)
            # chain back to input shape: 1x1 proj + 2x nearest upsample
            p = conv2d({"w": proj_w}, out)
            p = jnp.repeat(jnp.repeat(p, 2, axis=1), 2, axis=2)[:, :H, :H, :]
            return p.astype(jnp.bfloat16)

        return blk

    def block_fused(h):
        # whole block in one kernel (pair + pool + skip); same chain proj
        from multimodal_deepfake_detection_tpu.ops.pallas.sepconv_entry import entry_block

        out = entry_block(
            h, dw0, pw0, b0, dw1, pw1, b1, skip_w[0, 0], jnp.zeros((Cout,), jnp.float32),
            leading_relu0=lead, row_chunk=args.row_chunk,
        ).astype(jnp.bfloat16)
        p = conv2d({"w": proj_w}, out)
        p = jnp.repeat(jnp.repeat(p, 2, axis=1), 2, axis=2)[:, :H, :H, :]
        return p.astype(jnp.bfloat16)

    variants = {
        "xla": pair_xla,
        "xla_nodw": pair_xla_nodw,
        "xla_nopw": pair_xla_nopw,
        "stream": pair_stream,
        "stream2": pair_stream_v2,
        "stream2roll": pair_stream_v2_roll,
        "entry3": pair_entry3,
        "blockfused": block_fused,
    }
    flops = B * (H * H * Cin * Cout * 2 + H * H * Cout * Cout * 2)  # the two pointwise convs
    results = {}
    for name, pair in variants.items():
        if args.only and args.only not in name:
            continue
        block = pair if name == "blockfused" else whole_block(pair)

        def make_runk(K, block=block):
            @jax.jit
            def runk(xin, i):
                h = xin * (1 + i.astype(jnp.float32) * 1e-6).astype(xin.dtype)
                h = jax.lax.fori_loop(0, K, lambda t, h: block(h), h)
                return jnp.sum(h.astype(jnp.float32))

            return lambda i: runk(x, jnp.int32(i))

        try:
            ms = _chain_ms(make_runk, args.ka, args.kb, iters=args.iters)
        except Exception as e:
            print(f"entry{args.block} {name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        tflops = flops / (ms * 1e-3) / 1e12
        results[name] = {"ms_per_block": round(ms, 3), "pw_tflops": round(tflops, 1)}
        print(f"entry{args.block} {name:10s} {ms:7.3f} ms/block(+proj)  pw {tflops:6.1f} TFLOP/s", flush=True)
    print(json.dumps({"mode": f"entry{args.block}", "batch": B, "results": results}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["middle", "entry"])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--block", type=int, default=2, help="entry block index 1..3")
    p.add_argument("--stripe-rows", type=int, default=32)
    p.add_argument("--row-chunk", type=int, default=512)
    p.add_argument("--ablate", default="", choices=["", "notap", "nomm"],
                   help="stream2roll diagnosis: drop taps or the MXU dot")
    # both K's must put device time well above the relay's ~30 ms call floor
    p.add_argument("--ka", type=int, default=26)
    p.add_argument("--kb", type=int, default=80)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--only", default="", help="substring filter on variant names")
    args = p.parse_args()

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.mode == "middle":
        bench_middle(args)
    else:
        bench_entry(args)


if __name__ == "__main__":
    main()
