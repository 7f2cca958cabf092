#!/usr/bin/env python
"""Probe: do per-executable TPU compiler options pass through the relay?

XLA_FLAGS is parsed by the LOCAL client build (CPU + axon plugin), which
aborts on TPU-only flags — so env flags never reach the remote TPU compiler
(matrix 7). jit(...).lower(...).compile(compiler_options=...) ships options
inside the compile RPC instead. This times value_and_grad of the full
backbone (the training wall, PERF.md round 3) under candidate options.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_compile_opts.py
  ... probe_compile_opts.py --opts xla_tpu_scoped_vmem_limit_kib=65536
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--ka", type=int, default=2)
    p.add_argument("--kb", type=int, default=5)
    p.add_argument("--opts", default="", help="comma list k=v of compiler options")
    args = p.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from multimodal_deepfake_detection_tpu.models.xception import xception_apply, xception_init

    opts = {}
    for kv in filter(None, args.opts.split(",")):
        k, v = kv.split("=", 1)
        opts[k] = v

    cdtype = jnp.bfloat16
    params, state = xception_init(jax.random.PRNGKey(0), num_classes=2)
    params_d = jax.device_put(params)
    state_d = jax.device_put(state)
    B = args.batch
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).random((B, args.size, args.size, 3)), jnp.bfloat16)
    )
    y = jnp.asarray(np.arange(B) % 2, jnp.float32)

    def loss_fn(p, bn, xin):
        logits, new_bn = xception_apply(p, bn, xin, train=True, compute_dtype=cdtype)
        probs = jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))
        loss = -jnp.mean(y * jnp.log(probs + 1e-7) + (1 - y) * jnp.log(1 - probs + 1e-7))
        return loss, new_bn

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def make(K):
        def run(p, bn, xin, i):
            h0 = xin * (1.0 + i.astype(jnp.float32) * 1e-6).astype(xin.dtype)

            def body(_, carry):
                h, acc = carry
                (loss, _), grads = grad_fn(p, bn, h)
                gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree_util.tree_leaves(grads))
                h = (h.astype(jnp.float32) * (1.0 + (loss + gsum * 0) * 1e-38)).astype(xin.dtype)
                return h, acc + loss + gsum * 1e-30

            _, acc = jax.lax.fori_loop(0, K, body, (h0, jnp.float32(0)))
            return acc

        lowered = jax.jit(run).lower(params_d, state_d, x, jnp.int32(0))
        compiled = lowered.compile(compiler_options=opts or None)
        return lambda i: compiled(params_d, state_d, x, jnp.int32(i))

    def timed(fn, iters):
        float(fn(1_000_000))
        float(fn(1_000_001))
        t0 = time.perf_counter()
        outs = [fn(i) for i in range(iters)]
        _ = sum(float(o) for o in outs)
        return (time.perf_counter() - t0) / iters

    ta = timed(make(args.ka), args.iters)
    tb = timed(make(args.kb), args.iters)
    ms = (tb - ta) / (args.kb - args.ka) * 1e3
    print({"opts": opts, "grad_ms": round(ms, 2)})


if __name__ == "__main__":
    main()
