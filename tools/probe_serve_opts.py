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

Timing is tools/chainedk.py's chained-K harness (single source of the
methodology invariants). Each sweep entry gets a distinct ``arg_offset`` so
a no-op option — whose executable is identical to baseline — cannot replay
the relay's memoized (executable, args) results and fake a speedup
(ADVICE r3); differences below the noise floor print UNRELIABLE instead of
a fabricated throughput.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_serve_opts.py
  ... --opts xla_tpu_scoped_vmem_limit_kib=65536 --batch 256
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

CANDIDATES = [
    "",  # baseline: no options
    "xla_tpu_scoped_vmem_limit_kib=65536",
    "xla_tpu_enable_all_experimental_scheduler_features=true",
    "xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
    "xla_tpu_enable_dot_strength_reduction=false",
]

# below this, (T(kb) - T(ka)) is indistinguishable from wall-clock noise on
# the relay and the per-iteration quotient is meaningless
MIN_RELIABLE_DIFF_S = 3e-3


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

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from chainedk import chained_device_time
    from multimodal_deepfake_detection_tpu.models.fold import fold_xception_bn, folded_xception_apply
    from multimodal_deepfake_detection_tpu.models.xception import xception_init

    params, state = xception_init(jax.random.PRNGKey(0), num_classes=2)
    folded = jax.device_put(fold_xception_bn(params, state))
    B = args.batch
    x = jnp.asarray(np.random.default_rng(0).random((B, args.size, args.size, 3)), jnp.bfloat16)

    def apply_fn(xin):
        feats = folded_xception_apply(
            folded, xin, compute_dtype=jnp.bfloat16, use_pallas=args.pallas
        )
        return jnp.sum(feats.astype(jnp.float32))

    sweep = [args.opts] if args.opts is not None else CANDIDATES
    for spec_index, spec in enumerate(sweep):
        opts = dict(kv.split("=", 1) for kv in filter(None, (spec or "").split(",")))
        label = spec or "baseline"
        try:
            per_iter = chained_device_time(
                apply_fn, (x,), ka=args.ka, kb=args.kb, iters=args.iters,
                compiler_options=opts or None,
                arg_offset=spec_index * 10_000,  # no (executable, args) collisions
            )
            diff = per_iter * (args.kb - args.ka)
            if diff < MIN_RELIABLE_DIFF_S:
                print(f"{label:64s} UNRELIABLE (K-diff {diff * 1e3:.2f} ms < "
                      f"{MIN_RELIABLE_DIFF_S * 1e3:.0f} ms noise floor)", flush=True)
                continue
            ms = per_iter * 1e3
            print(f"{label:64s} {ms:8.2f} ms/batch  {B / ms * 1e3:9.0f} frames/s", flush=True)
        except Exception as e:
            print(f"{label:64s} REJECTED: {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
