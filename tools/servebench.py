#!/usr/bin/env python
"""Serving latency/throughput of the VisualScorer engine on the real TPU.

Measures end-to-end ``score()`` wall latency — uint8 host frames in, float
probabilities out — per (batch, clip-length) shape: p50/p90 over distinct
inputs (the relay memoizes identical calls) plus amortized throughput from a
pipelined burst. NOTE: in this environment every call carries the relay's
~20-30 ms RPC floor, which a colocated production host would not pay; the
burst-amortized number is the closer estimate of chip-side serving capacity,
and bench.py's chained device time is the relay-free ground truth.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/servebench.py
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default="1x16,8x16,32x16,64x8")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument(
        "--quantize", default="",
        help="w8a8 | w8a8-hybrid | w8a8-pallas: serve the quantized backbone",
    )
    args = p.parse_args()

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
    from multimodal_deepfake_detection_tpu.models.serve import VisualScorer

    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    params, bn_state = xception_lstm_init(r1, 128)
    params["arcface"] = arcface_init(r2, 128, 2)
    scorer = VisualScorer(params, bn_state, quantize=args.quantize or None)

    rng = np.random.default_rng(0)
    results = {}
    for shape in args.shapes.split(","):
        B, T = (int(v) for v in shape.split("x"))
        clips = [
            rng.integers(0, 255, (B, T, args.size, args.size, 3), np.uint8)
            for _ in range(args.iters)
        ]
        scorer.score(clips[0])  # compile
        lats = []
        for c in clips:
            t0 = time.perf_counter()
            scorer.score(c)
            lats.append((time.perf_counter() - t0) * 1e3)
        lats.sort()
        p50 = lats[len(lats) // 2]  # includes the relay upload tunnel
        p90 = lats[int(len(lats) * 0.9)]
        # device-resident variant: inputs pre-placed, as a colocated host
        # would stream them — isolates serving compute from the tunnel
        lengths = np.full((B,), T, np.int32)
        dev = [jax.device_put(c) for c in clips]
        jax.block_until_ready(dev)
        dlats = []
        for c in dev:
            t0 = time.perf_counter()
            np.asarray(scorer._score(scorer.folded_backbone, scorer.head_params, c, lengths))
            dlats.append((time.perf_counter() - t0) * 1e3)
        dlats.sort()
        dp50 = dlats[len(dlats) // 2]
        t0 = time.perf_counter()
        outs = [
            scorer._score(scorer.folded_backbone, scorer.head_params, c, lengths)
            for c in dev
        ]
        jax.block_until_ready(outs)
        burst = (time.perf_counter() - t0) / args.iters
        fps = B * T / burst
        results[shape] = {
            "p50_ms_host": round(p50, 1), "p90_ms_host": round(p90, 1),
            "p50_ms_device_resident": round(dp50, 1),
            "burst_frames_per_sec": round(fps, 1),
        }
        print(
            f"B={B:3d} T={T:3d}: host p50 {p50:7.1f} ms  p90 {p90:7.1f} ms | "
            f"device-resident p50 {dp50:7.1f} ms  burst {fps:8.1f} frames/s",
            flush=True,
        )
    print(json.dumps({"mode": "serve_latency", "results": results}))


if __name__ == "__main__":
    main()
