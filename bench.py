#!/usr/bin/env python
"""Headline benchmark: Xception face-frame inference throughput per chip.

The north-star metric (BASELINE.json): >= 5,000 face-frames/sec/chip through
the Xception backbone — the hot loop of every reference entry point (the
(B*T)-flattened per-frame forward, SURVEY.md §3). Frames are 256x256x3, the
reference's face-crop size (/root/reference/UADFV_face_dataset.py:36-39).

Methodology notes (measured, not assumed):
* every call gets a distinct step-index argument — the TPU relay in this
  environment memoizes identical (executable, args) executions, so repeated
  same-arg calls report physically impossible throughput;
* each call reduces to a scalar that is fetched to host at the end — a host
  readback is the only completion signal the relay honors reliably;
* calls are pipelined (launch all, then fetch) so the relay's ~20 ms RPC
  latency overlaps with device compute, as it would in a real input pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def _run_with_retry(fn, attempts=3, delay=5.0):
    """The TPU relay occasionally throws transient FailedPrecondition on
    process startup (see CLAUDE.md gotchas); never lose the benchmark to it."""
    last = None
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: broad — relay errors surface variably
            last = e
            print(f"[bench] attempt {a + 1}/{attempts} failed: {type(e).__name__}: {e}", file=sys.stderr)
            time.sleep(delay)
    raise last


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--iters", type=int, default=16)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--no-fold-bn", action="store_true", help="disable inference BN folding")
    parser.add_argument(
        "--pallas",
        default=True,
        action=argparse.BooleanOptionalAction,
        help="fused Pallas middle-flow blocks (default on; --no-pallas for XLA-only)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(globals().get("__file__", "."))))
    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from multimodal_deepfake_detection_tpu.models.xception import xception_apply, xception_init

    # first backend contact can hit a transient relay FailedPrecondition
    platform = _run_with_retry(lambda: jax.devices()[0].platform)
    if platform == "cpu":
        # CPU smoke mode: tiny shapes so the harness stays runnable anywhere;
        # the Pallas kernel is TPU-only (Mosaic), use the XLA path
        args.batch, args.size, args.iters, args.warmup = 4, 64, 3, 1
        args.pallas = False

    cdtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params, state = xception_init(jax.random.PRNGKey(0), num_classes=2)

    if not args.no_fold_bn:
        from multimodal_deepfake_detection_tpu.models.fold import fold_xception_bn

        folded = fold_xception_bn(params, state)

        use_pallas = bool(args.pallas)

        @jax.jit
        def fwd(p, x, i):
            x = x * (1.0 + i.astype(jnp.float32) * 1e-6)
            from multimodal_deepfake_detection_tpu.models.fold import folded_xception_apply

            return jnp.sum(folded_xception_apply(p, x, compute_dtype=cdtype, use_pallas=use_pallas))

        weights = jax.device_put(folded)
        call = lambda x, i: fwd(weights, x, i)
    else:

        @jax.jit
        def fwd(p, s, x, i):
            x = x * (1.0 + i.astype(jnp.float32) * 1e-6)
            return jnp.sum(xception_apply(p, s, x, train=False, compute_dtype=cdtype)[0])

        p = jax.device_put(params)
        s = jax.device_put(state)
        call = lambda x, i: fwd(p, s, x, i)

    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).random((args.batch, args.size, args.size, 3)), jnp.bfloat16)
    )

    # first device use may hit a transient relay fault — retry the warmup
    _run_with_retry(lambda: float(call(x, jnp.int32(1_000_000))))
    for w in range(1, args.warmup):
        float(call(x, jnp.int32(1_000_000 + w)))

    t0 = time.perf_counter()
    outs = [call(x, jnp.int32(i)) for i in range(args.iters)]
    checksum = sum(float(o) for o in outs)  # host readbacks force completion
    dt = time.perf_counter() - t0

    frames_per_sec = args.batch * args.iters / dt
    print(
        json.dumps(
            {
                "metric": "xception_face_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 1),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_sec / 5000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
