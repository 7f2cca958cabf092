#!/usr/bin/env python
"""Probe TPU compiler options against the SERVING forward (the block1 wall).

Matrix 7 (PERF.md) probed per-executable compiler options against the
training grad — all washes. This probes the same option surface against the
folded serving forward, where the remaining wall is block1 (10.9 ms fp /
9.9 ms int8 of the ~37/30 ms net, PERF.md r3 stage budget) — XLA's
entry-conv emitter at 125², 64→128 ch. Options ship inside the compile RPC
via ``jit(...).lower(...).compile(compiler_options=...)`` — the only way to
reach the remote TPU compiler through the relay
(tools/probe_compile_opts.py).

Chained-K methodology (tools/chainedk.py invariants: data-dependent
perturbation, every input perturbed).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_serve_opts.py
  ... --opts xla_tpu_scoped_vmem_limit_kib=65536 --batch 256
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

CANDIDATES = [
    "",  # baseline: no options
    "xla_tpu_scoped_vmem_limit_kib=65536",
    "xla_tpu_enable_all_experimental_scheduler_features=true",
    "xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
    "xla_tpu_enable_dot_strength_reduction=false",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--ka", type=int, default=2)
    p.add_argument("--kb", type=int, default=8)
    p.add_argument("--opts", default=None, help="comma k=v list; omit to sweep CANDIDATES")
    p.add_argument("--pallas", default=True, action=argparse.BooleanOptionalAction)
    args = p.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from multimodal_deepfake_detection_tpu.models.fold import fold_xception_bn, folded_xception_apply
    from multimodal_deepfake_detection_tpu.models.xception import xception_init

    params, state = xception_init(jax.random.PRNGKey(0), num_classes=2)
    folded = jax.device_put(fold_xception_bn(params, state))
    B = args.batch
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).random((B, args.size, args.size, 3)), jnp.bfloat16)
    )

    def apply_fn(xin):
        feats = folded_xception_apply(
            folded, xin, compute_dtype=jnp.bfloat16, use_pallas=args.pallas
        )
        return jnp.sum(feats.astype(jnp.float32))

    def timed_chain(K, opts):
        def chain(xin, i):
            f0 = 1.0 + i.astype(jnp.float32) * 1e-6
            xin = (xin.astype(jnp.float32) * f0).astype(xin.dtype)

            def body(_, carry):
                h, acc = carry
                s = apply_fn(h)
                f = 1.0 + s * 1e-38
                h = (h.astype(jnp.float32) * f).astype(h.dtype)
                return h, acc + s

            _, acc = jax.lax.fori_loop(0, K, body, (xin, jnp.float32(0.0)))
            return acc

        compiled = jax.jit(chain).lower(x, jnp.int32(0)).compile(compiler_options=opts or None)
        float(compiled(x, jnp.int32(999_999)))  # warm
        best = float("inf")
        for i in range(args.iters):
            t0 = time.perf_counter()
            float(compiled(x, jnp.int32(i)))
            best = min(best, time.perf_counter() - t0)
        return best

    sweep = [args.opts] if args.opts is not None else CANDIDATES
    for spec in sweep:
        opts = dict(kv.split("=", 1) for kv in filter(None, (spec or "").split(",")))
        label = spec or "baseline"
        try:
            ta = timed_chain(args.ka, opts)
            tb = timed_chain(args.kb, opts)
            ms = (tb - ta) / (args.kb - args.ka) * 1e3
            print(f"{label:64s} {ms:8.2f} ms/batch  {B / ms * 1e3:9.0f} frames/s", flush=True)
        except Exception as e:
            print(f"{label:64s} REJECTED: {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
