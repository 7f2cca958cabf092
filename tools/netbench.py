#!/usr/bin/env python
"""In-situ per-stage cost of the folded serving net (real TPU).

Times TRUNCATED prefixes of ``folded_xception_apply`` (stem, +block1,
+block2, ...) as whole jitted calls with distinct step args; the marginal
cost of a stage is the difference of adjacent prefix walls, which cancels
the relay's per-call floor and the shared upload/readback. This measures a
stage in its REAL surroundings — the chained per-block harness in
microbench.py showed fused entry kernels 1.3-2.6 ms FASTER per block while
the net bench showed them SLOWER; this tool attributes that gap.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/netbench.py \
      [--fuse 63,32] [--batch 256] [--iters 12]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--fuse", default="", help="MDFD_ENTRY_FUSE_H value (entry blocks to fuse)")
    p.add_argument("--pallas", default=True, action=argparse.BooleanOptionalAction)
    p.add_argument("--upto", default="", help="comma list of prefix stages; default all")
    p.add_argument(
        "--quant", default="",
        help="'w8a8' times the int8 walker (models/quant.py) instead of the fp net; "
        "'w8a8-hybrid' keeps the Pallas pos middle flow bf16",
    )
    args = p.parse_args()

    if args.fuse:
        os.environ["MDFD_ENTRY_FUSE_H"] = args.fuse
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp

    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from multimodal_deepfake_detection_tpu.models.fold import fold_xception_bn
    from multimodal_deepfake_detection_tpu.models.xception import xception_init

    params, state = xception_init(jax.random.PRNGKey(0), num_classes=2)
    folded = jax.device_put(fold_xception_bn(params, state))
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).random((args.batch, args.size, args.size, 3)), jnp.bfloat16)
    )
    if args.quant:
        from multimodal_deepfake_detection_tpu.models.quant import (
            calibrate_amax,
            quantize_folded_xception,
        )

        amaxes = calibrate_amax(folded, x[:32], compute_dtype=jnp.bfloat16)
        folded = jax.device_put(
            quantize_folded_xception(
                folded, amaxes, quant_depthwise=True,
                skip_middle=(args.quant == "w8a8-hybrid"),
            )
        )

    # prefix stages: stem, then each block, then exit convs
    n_blocks = len(folded["blocks"])
    stages = ["stem"] + [f"block{i+1}" for i in range(n_blocks)] + ["exit"]
    if args.upto:
        keep = set(args.upto.split(","))
        stages = [s for s in stages if s in keep or s == "stem"]

    # The relay has a ~30 ms per-call floor that swallows single-prefix device
    # time — so each prefix is applied K times inside ONE jit and per-prefix
    # device time is the K-difference (T(kb) - T(ka)) / (kb - ka), floor and
    # upload cancelled. The carried input is re-perturbed by a DATA-DEPENDENT
    # numerically-null factor (bench.py:147-163): each iteration's input is a
    # fresh tensor, so nothing — including the stem conv — can be CSE'd or
    # scalar-factored across iterations. (The old constant-scalar multiply
    # commuted through the first conv and under-measured the stem; PERF.md.)
    KA, KB = 4, 12

    def make_prefix(upto, K):
        from multimodal_deepfake_detection_tpu.models.fold import folded_xception_apply
        from multimodal_deepfake_detection_tpu.models.quant import xception_quant_walk

        @jax.jit
        def fwd(p, xin, i):
            h0 = (xin.astype(jnp.float32) * (1.0 + i.astype(jnp.float32) * 1e-6)).astype(xin.dtype)

            def body(t, carry):
                h, acc = carry
                if args.quant:
                    out = xception_quant_walk(
                        p, h, quant=True, compute_dtype=jnp.bfloat16, upto=upto,
                        middle_pallas=args.quant in ("w8a8-hybrid", "w8a8-pallas"),
                        features_only=True,
                    )
                else:
                    out = folded_xception_apply(
                        p, h, upto=upto, compute_dtype=jnp.bfloat16, use_pallas=args.pallas
                    )
                s = jnp.sum(out.astype(jnp.float32))
                h = (h.astype(jnp.float32) * (1.0 + s * 1e-38)).astype(xin.dtype)
                return h, acc + s

            _, acc = jax.lax.fori_loop(0, K, body, (h0, jnp.float32(0)))
            return acc

        return lambda i: fwd(folded, x, jnp.int32(i))

    def timed(call, iters):
        float(call(1_000_000))  # compile + warm
        float(call(1_000_001))
        t0 = time.perf_counter()
        outs = [call(i) for i in range(iters)]
        _ = sum(float(o) for o in outs)
        return (time.perf_counter() - t0) / iters * 1e3

    results, prev = {}, None
    for s in stages:
        ta = timed(make_prefix(s, KA), args.iters)
        tb = timed(make_prefix(s, KB), args.iters)
        ms = (tb - ta) / (KB - KA)
        marginal = None if prev is None else round(ms - prev, 2)
        results[s] = {"device_ms": round(ms, 2), "marginal_ms": marginal}
        print(f"{s:10s} device {ms:8.2f} ms  marginal {marginal if marginal is not None else '-'}", flush=True)
        prev = ms
    print(json.dumps({"fuse": args.fuse, "quant": args.quant, "batch": args.batch, "stages": results}))


if __name__ == "__main__":
    main()
