#!/usr/bin/env python
"""Dump the TPU-optimized HLO of grad(block1) and summarize the big ops.

trainbench stages: block1 fwd+bwd = 23.5 ms at B=64 while every op is fast in
isolation — so the cost lives in backend layout/fusion choices. This compiles
the real composition on the TPU and reports ops by output byte size (copies,
transposes, converts, convs, fusions), the same evidence path that closed the
entry-kernel question in round 2.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dump_grad_hlo.py [--batch 64] [--full]
"""
from __future__ import annotations

import argparse
import os
import re
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--hw", type=int, default=125)
    p.add_argument("--full", action="store_true", help="dump full HLO text to /tmp/grad_block1.hlo")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from multimodal_deepfake_detection_tpu.models.xception import _block_apply, _block_init

    spec = (64, 128, 2, 2, True, True)
    bp, bs = _block_init(jax.random.PRNGKey(0), spec, jnp.float32)
    x = jnp.zeros((args.batch, args.hw, args.hw, 64), jnp.bfloat16)

    def loss(pp, xin):
        out, _ = _block_apply(pp, bs, spec, xin, train=True, compute_dtype=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    compiled = jax.jit(jax.value_and_grad(loss)).lower(bp, x).compile()
    txt = compiled.as_text()
    if args.full:
        with open("/tmp/grad_block1.hlo", "w") as f:
            f.write(txt)
        print("full HLO -> /tmp/grad_block1.hlo", len(txt), "chars")

    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2, "s8": 1, "u8": 1}

    def nbytes(shape_str):
        m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
        if not m:
            return 0
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * dt_bytes.get(dt, 4)

    rows = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\w+\[[^\]]*\][^ ]*) (\w+)", line)
        if not m:
            continue
        name, shape, op = m.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple", "bitcast"):
            continue
        rows.append((nbytes(shape), op, shape.split("{")[0], name, line.strip()[:160]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{len(rows)} ops, est output bytes total {total/1e9:.2f} GB")
    for b, op, shape, name, _line in rows[: args.top]:
        print(f"{b/1e6:9.1f} MB  {op:20s} {shape:32s} {name}")
    # op-type byte totals
    agg = {}
    for b, op, *_ in rows:
        agg[op] = agg.get(op, 0) + b
    print("\nby op type (GB):")
    for op, b in sorted(agg.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {op:24s} {b/1e9:8.3f}")


if __name__ == "__main__":
    main()
