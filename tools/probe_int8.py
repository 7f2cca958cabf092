#!/usr/bin/env python
"""Probe int8 MXU throughput on the real chip (quantized-serving feasibility).

v5e's datasheet int8 peak is 394 TOPS — 2x the bf16 197 TFLOP/s. This probe
measures what actually lands through this environment's relay, for the three
lowerings a w8a8 serving path would use:

  1. XLA int8 matmul       (lax.dot int8 x int8 -> int32)
  2. XLA int8 1x1 conv     (lax.conv at the middle-flow pointwise shape)
  3. Pallas int8 dot       (jnp.dot inside a Mosaic kernel, the pos-kernel op)

Methodology: chained iterations inside one jit (output feeds input through a
requantize) and K-differencing, same as tools/microbench.py (PERF.md).
"""
import argparse
import sys
import time

import numpy as np


def timed(call, iters=6):
    """Best-of-trials per-call wall time (min cancels relay RPC jitter)."""
    float(call(999))
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        float(call(i))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8192, help="square matmul dim")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--k1", type=int, default=2)
    p.add_argument("--k2", type=int, default=34, help="K span must dwarf the ~30 ms relay floor noise")
    p.add_argument("--which", default="matmul,conv,pallas")
    args = p.parse_args()
    K1, K2 = args.k1, args.k2

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    which = set(args.which.split(","))
    N = args.n
    rng = np.random.default_rng(0)

    def report(name, per_s, ops):
        print(f"{name}: {per_s * 1e3:.3f} ms = {ops / per_s / 1e12:.1f} TOP/s", flush=True)

    if "matmul" in which:
        for name, dtype, acc in [("bf16 matmul", jnp.bfloat16, jnp.float32), ("int8 matmul", jnp.int8, jnp.int32)]:
            a = jax.device_put(jnp.asarray(rng.integers(-4, 4, (N, N)), dtype))
            b = jax.device_put(jnp.asarray(rng.integers(-4, 4, (N, N)), dtype))

            def make(K, a=a, b=b, dtype=dtype, acc=acc):
                @jax.jit
                def f(a, b, i):
                    def body(_, x):
                        y = jax.lax.dot(x, b, preferred_element_type=acc)
                        if jnp.issubdtype(dtype, jnp.integer):
                            return jnp.clip(y >> 8, -127, 127).astype(dtype)
                        return (y * 1e-4).astype(dtype)

                    x = jax.lax.fori_loop(0, K, body, a)
                    return jnp.sum(jnp.abs(x).astype(jnp.float32)) + i.astype(jnp.float32)

                return lambda i: f(a, b, jnp.int32(i))

            t2, t8 = timed(make(K1), args.iters), timed(make(K2), args.iters)
            report(name, (t8 - t2) / (K2 - K1), 2 * N**3)

    if "conv" in which:
        # middle-flow pointwise shape: (B*HW, C) x (C, C) as a 1x1 conv
        B, HW, C = 256, 256, 728
        for name, dtype, acc in [("bf16 1x1 conv", jnp.bfloat16, jnp.float32), ("int8 1x1 conv", jnp.int8, jnp.int32)]:
            x = jax.device_put(jnp.asarray(rng.integers(-4, 4, (B, 16, 16, C)), dtype))
            w = jax.device_put(jnp.asarray(rng.integers(-4, 4, (1, 1, C, C)), dtype))

            def make(K, x=x, w=w, dtype=dtype, acc=acc):
                @jax.jit
                def f(x, w, i):
                    def body(_, h):
                        y = jax.lax.conv_general_dilated(
                            h, w, (1, 1), "VALID",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=acc,
                        )
                        if jnp.issubdtype(dtype, jnp.integer):
                            return jnp.clip(y >> 8, -127, 127).astype(dtype)
                        return (y * 1e-4).astype(dtype)

                    h = jax.lax.fori_loop(0, K, body, x)
                    return jnp.sum(jnp.abs(h).astype(jnp.float32)) + i.astype(jnp.float32)

                return lambda i: f(x, w, jnp.int32(i))

            try:
                t2, t8 = timed(make(K1), args.iters), timed(make(K2), args.iters)
                report(name, (t8 - t2) / (K2 - K1), 2 * B * HW * C * C)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    if "pallas" in which:
        from functools import partial

        from jax.experimental import pallas as pl

        M, C = 2048, 728

        def kernel(x_ref, w_ref, o_ref, *, K, dtype):
            x = x_ref[...]
            for _ in range(K):
                y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.int32 if dtype == jnp.int8 else jnp.float32)
                if dtype == jnp.int8:
                    x = jnp.clip(y >> 8, -127, 127).astype(dtype)
                else:
                    x = (y * 1e-4).astype(dtype)
            o_ref[...] = x

        for name, dtype in [("bf16 pallas dot", jnp.bfloat16), ("int8 pallas dot", jnp.int8)]:
            x = jax.device_put(jnp.asarray(rng.integers(-4, 4, (M, C)), dtype))
            w = jax.device_put(jnp.asarray(rng.integers(-4, 4, (C, C)), dtype))

            def make(K, x=x, w=w, dtype=dtype):
                f = pl.pallas_call(
                    partial(kernel, K=K, dtype=dtype),
                    out_shape=jax.ShapeDtypeStruct((M, C), dtype),
                )

                @jax.jit
                def g(x, w, i):
                    return jnp.sum(jnp.abs(f(x, w)).astype(jnp.float32)) + i.astype(jnp.float32)

                return lambda i: g(x, w, jnp.int32(i))

            try:
                t2, t8 = timed(make(K1), args.iters), timed(make(K2), args.iters)
                report(name, (t8 - t2) / (K2 - K1), 2 * M * C * C)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
