#!/usr/bin/env python
"""w8a8 quantized backbone vs the shipped bf16 serving path (real TPU).

Measures relay-free device time per batch via the same chained-K
differencing as bench.py (data-dependent numerically-null perturbation
between iterations; host readback as the completion barrier), for:

  * fp   — the shipped serving default (folded bf16, Pallas middle flow)
  * xla  — folded bf16, XLA only (the walker's fp mode; sanity anchor)
  * int8 — the w8a8 quantized forward (models/quant.py)

plus an on-chip accuracy sniff: max|feature drift| of int8 vs fp on the
same input (``--refine N`` applies the affine PTQ refinement first). Probe
context: int8 matmul measured 337.8 TOP/s vs bf16 172.8 (1.95x), int8 1x1
conv 238.7 vs 134.2 (1.78x) — tools/probe_int8.py.
"""
import argparse
import json
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--ka", type=int, default=2)
    p.add_argument("--kb", type=int, default=6)
    p.add_argument("--which", default="fp,xla,int8")
    p.add_argument("--accuracy", action="store_true", help="also print int8-vs-fp feature drift")
    p.add_argument("--refine", type=int, default=0,
                   help="affine-refine the quantized trees (passes) before measuring")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from multimodal_deepfake_detection_tpu.models.fold import fold_xception_bn, folded_xception_apply
    from multimodal_deepfake_detection_tpu.models.quant import (
        calibrate_amax,
        quantize_folded_xception,
        quantized_xception_apply,
        xception_quant_walk,
    )
    from multimodal_deepfake_detection_tpu.models.xception import xception_init

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    params, state = xception_init(jax.random.PRNGKey(0), num_classes=None)
    folded = fold_xception_bn(params, state)
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).random((args.batch, args.size, args.size, 3)), jnp.bfloat16)
    )

    # calibrate on a slice of the bench input itself (machinery benchmark —
    # real deployments calibrate on real data)
    amaxes = calibrate_amax(folded, x[:32], compute_dtype=jnp.bfloat16)
    qtree = quantize_folded_xception(folded, amaxes)
    qtree_dw = quantize_folded_xception(folded, amaxes, quant_depthwise=True)
    qtree_hy = quantize_folded_xception(folded, amaxes, quant_depthwise=True, skip_middle=True)
    weights = jax.device_put(folded)
    if args.refine:
        from multimodal_deepfake_detection_tpu.models.quant import refine_quantized_xception

        calib = x[:32].astype(jnp.float32)
        qtree, qtree_dw, qtree_hy = (
            refine_quantized_xception(t, folded, calib, passes=args.refine,
                                      compute_dtype=jnp.bfloat16)
            for t in (qtree, qtree_dw, qtree_hy)
        )
    qtree = jax.device_put(qtree)
    qtree_dw = jax.device_put(qtree_dw)
    qtree_hy = jax.device_put(qtree_hy)

    nets = {
        "fp": lambda p, h: folded_xception_apply(p, h, compute_dtype=jnp.bfloat16, use_pallas=True),
        "xla": lambda p, h: xception_quant_walk(p, h, quant=False, compute_dtype=jnp.bfloat16, features_only=True),
        "int8": lambda p, h: quantized_xception_apply(p, h, features_only=True),
        # int8 depthwise too: the activation chain through every sepconv unit
        # stays int8 end-to-end -> half the HBM bytes on the bandwidth-bound
        # entry blocks
        "int8dw": lambda p, h: quantized_xception_apply(p, h, features_only=True),
        # hybrid: int8dw entry/exit + bf16 Pallas pos middle flow
        "hybrid": lambda p, h: xception_quant_walk(
            p, h, quant=True, features_only=True, middle_pallas=True
        ),
        # pallas: full int8dw tree, middle flow through the int8-pointwise
        # pos kernel (MXU int8 at 2x the bf16 rate)
        "pallas": lambda p, h: xception_quant_walk(
            p, h, quant=True, features_only=True, middle_pallas=True
        ),
    }
    trees = {
        "fp": weights, "xla": weights, "int8": qtree, "int8dw": qtree_dw,
        "hybrid": qtree_hy, "pallas": qtree_dw,
    }

    import os as _os

    sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from chainedk import chained_device_time

    record = {"batch": args.batch}
    for name in args.which.split(","):
        net, tree = nets[name], trees[name]
        dev = chained_device_time(
            lambda h, _net=net, _tree=tree: jnp.sum(_net(_tree, h).astype(jnp.float32)),
            (x,), ka=args.ka, kb=args.kb, iters=args.iters,
        )
        record[f"{name}_ms"] = round(dev * 1e3, 2)
        record[f"{name}_frames_per_sec"] = round(args.batch / dev, 1)
        print(f"{name}: {dev * 1e3:.2f} ms/batch = {args.batch / dev:.1f} frames/s", flush=True)

    if args.accuracy:
        fp_feats = np.asarray(
            jax.jit(lambda p, h: nets["xla"](p, h))(weights, x[:32]), np.float32
        )
        for name in ("int8", "int8dw", "hybrid", "pallas"):
            if name not in args.which:
                continue
            q_feats = np.asarray(
                jax.jit(lambda p, h: nets[name](p, h))(trees[name], x[:32]), np.float32
            )
            rel = np.abs(q_feats - fp_feats).mean() / (np.abs(fp_feats).mean() + 1e-9)
            cos = (q_feats * fp_feats).sum() / (
                np.linalg.norm(q_feats) * np.linalg.norm(fp_feats) + 1e-9
            )
            record.update({f"{name}_rel_err": round(float(rel), 4), f"{name}_cos": round(float(cos), 6)})
            print(f"{name} accuracy: rel_err={rel:.4f} cos={cos:.6f}", flush=True)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
