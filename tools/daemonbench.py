"""Measure the online serving daemon on the real TPU chip.

Four numbers, attributed (this environment's relay uploads host->device at
~35 MB/s — CLAUDE.md — so end-to-end daemon throughput here is tunnel-bound;
the point of the bench is to show the batching machinery adds ~nothing over
the offline engine under the same transfer wall):

1. ``upload_mb_s``       — relay host->device bandwidth (device_put probe).
2. ``offline_clips_s``   — VisualScorer.score on pre-stacked full batches
                           (the engine ceiling incl. the same upload wall).
3. ``daemon_clips_s``    — concurrent single-clip submitters through the
                           MicroBatcher (what online traffic gets), plus
                           occupancy and queued-latency percentiles.
4. ``http_p50_ms``       — full HTTP round trip (npz body) per clip under
                           concurrency, and the light-load single-request
                           latency floor.

Usage (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/daemonbench.py \
        [--clips 96] [--max_batch 16] [--T 8] [--hw 256] [--inflight 24]

The reference has no serving daemon (closest: the offline eval loop at
/root/reference/test_visual.py:572-646); this measures a beyond-parity
deployment component.
"""
from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
import urllib.request

import numpy as np


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=96, help="total clips through the daemon")
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--T", type=int, default=8, help="frames per clip")
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--inflight", type=int, default=24, help="concurrent submitter threads")
    ap.add_argument("--http_clips", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    args = ap.parse_args()

    import jax

    from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
    from multimodal_deepfake_detection_tpu.models.serve import VisualScorer
    from multimodal_deepfake_detection_tpu.serving import MicroBatcher, ServingDaemon, VisualAdapter

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    rng = np.random.default_rng(0)
    T, HW = args.T, args.hw
    clip_mb = T * HW * HW * 3 / 1e6

    # -- 1. relay upload bandwidth probe ------------------------------------
    # block_until_ready resolves EARLY through the relay (CLAUDE.md): a
    # device-side reduction read back to the host is what actually fences the
    # upload. Vary bytes per call to defeat relay memoization.
    import jax.numpy as jnp

    probe = rng.integers(0, 255, (64, 1024, 1024), np.uint8)  # 64 MB
    fence = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    float(fence(jax.device_put(probe[:1])))  # warm transfer path + compile
    float(fence(jax.device_put(probe)))      # compile the full-size reduce
    ts = []
    for i in range(3):
        probe[0, 0, 0] = i  # defeat relay memoization
        t0 = time.perf_counter()
        float(fence(jax.device_put(probe)))
        ts.append(time.perf_counter() - t0)
    upload_mb_s = probe.nbytes / 1e6 / _median(ts)
    print(f"upload: {upload_mb_s:.1f} MB/s  (clip = {clip_mb:.2f} MB -> "
          f"{clip_mb / upload_mb_s * 1e3:.1f} ms/clip transfer floor)")

    # -- engine: shipped fp default (folded bf16 + Pallas pos middle) -------
    params, bn = xception_lstm_init(jax.random.PRNGKey(0), 16)
    params["arcface"] = arcface_init(jax.random.PRNGKey(1), 16, 2)
    scorer = VisualScorer(params, bn, buckets=(T,))
    B = args.max_batch

    clips = [rng.integers(0, 255, (T, HW, HW, 3), np.uint8) for _ in range(args.clips)]

    # -- 2. offline anchor: pre-stacked full batches through scorer.score ---
    batch = np.stack(clips[:B])
    scorer.score(batch)  # compile
    offline = []
    for i in range(4):
        batch[0, 0, 0, 0, 0] = i  # fresh bytes every call (memoization)
        t0 = time.perf_counter()
        scorer.score(batch)
        offline.append(time.perf_counter() - t0)
    offline_s = _median(offline)
    offline_clips_s = B / offline_s
    print(f"offline engine: {offline_s * 1e3:.1f} ms / {B}-clip batch "
          f"= {offline_clips_s:.1f} clips/s ({offline_clips_s * T:.0f} frames/s, incl. upload)")

    # -- 3. in-process micro-batcher under concurrent single-clip load ------
    mb = MicroBatcher(
        VisualAdapter(scorer), max_batch=B,
        max_wait_ms=args.max_wait_ms, batch_buckets=(1, B),
    )
    with mb:
        # warm both batch buckets (the B=1 program serves light traffic)
        for fut in [mb.submit(frames=clips[0])] + [mb.submit(frames=c) for c in clips[:B]]:
            fut.result(timeout=600)

        work: "queue.Queue[np.ndarray]" = queue.Queue()
        for c in clips:
            work.put(c)
        t0 = time.perf_counter()

        def drain():
            while True:
                try:
                    c = work.get_nowait()
                except queue.Empty:
                    return
                mb.score_sync(timeout=600, frames=c)

        threads = [threading.Thread(target=drain) for _ in range(args.inflight)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        daemon_s = time.perf_counter() - t0
        st = mb.stats()
    daemon_clips_s = args.clips / daemon_s
    print(f"micro-batched: {args.clips} clips in {daemon_s:.2f} s = {daemon_clips_s:.1f} clips/s "
          f"({daemon_clips_s * T:.0f} frames/s) | occupancy {st['mean_batch_occupancy']:.1f}/{B} "
          f"| queued-latency p50 {st['latency_ms_p50']} ms p90 {st['latency_ms_p90']} ms")
    print(f"  batching overhead vs offline anchor: "
          f"{(1 - daemon_clips_s / offline_clips_s) * 100:+.1f}%")

    # -- 4. HTTP round trip (npz binary path) -------------------------------
    mb2 = MicroBatcher(
        VisualAdapter(scorer), max_batch=B,
        max_wait_ms=args.max_wait_ms, batch_buckets=(1, B),
    )
    with ServingDaemon({"visual": mb2}, port=0) as d:
        d.warmup("visual", frames=clips[0])

        def post(c) -> float:
            buf = io.BytesIO()
            np.savez(buf, frames=c)
            req = urllib.request.Request(
                d.url + "/v1/score/visual", buf.getvalue(),
                {"Content-Type": "application/x-npz"},
            )
            t0 = time.perf_counter()
            with urllib.request.urlopen(req, timeout=600) as r:
                json.loads(r.read())
            return time.perf_counter() - t0

        # light-load floor: one request alone, repeated
        solo = [post(clips[i % len(clips)]) * 1e3 for i in range(6)]
        # concurrent round trips
        lat, lock = [], threading.Lock()

        def worker(c):
            dt = post(c) * 1e3
            with lock:
                lat.append(dt)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=worker, args=(clips[i],)) for i in range(args.http_clips)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        http_s = time.perf_counter() - t0
    http_p50 = _median(lat)
    print(f"http: solo round trip p50 {_median(solo):.1f} ms | {args.http_clips} concurrent: "
          f"p50 {http_p50:.1f} ms, {args.http_clips / http_s:.1f} clips/s")

    print(json.dumps({
        "metric": "daemon_clips_per_sec",
        "value": round(daemon_clips_s, 1),
        "unit": "clips/s",
        "frames_per_sec": round(daemon_clips_s * T, 0),
        "offline_clips_per_sec": round(offline_clips_s, 1),
        "upload_mb_s": round(upload_mb_s, 1),
        "transfer_floor_clips_s": round(upload_mb_s / clip_mb, 1),
        "batch_occupancy": st["mean_batch_occupancy"],
        "queued_p50_ms": st["latency_ms_p50"],
        "queued_p90_ms": st["latency_ms_p90"],
        "http_solo_p50_ms": round(_median(solo), 1),
        "http_concurrent_p50_ms": round(http_p50, 1),
        "clip": f"{T}x{HW}x{HW}x3 u8",
        "max_batch": B,
    }))


if __name__ == "__main__":
    main()
