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
    ap.add_argument(
        "--traffic", default="closed",
        help="comma list of micro-batcher traffic shapes: closed (the "
        "original concurrent-submitter loop), poisson (open-loop arrivals "
        "at --load x the offline anchor rate), burst (groups of "
        "--burst_size arriving back-to-back with idle gaps)",
    )
    ap.add_argument("--load", type=float, default=0.8,
                    help="poisson arrival rate as a fraction of the offline anchor")
    ap.add_argument("--burst_size", type=int, default=32)
    ap.add_argument(
        "--mixed", action="store_true",
        help="also drive visual+audio batchers CONCURRENTLY (closed-loop on "
        "both) and report each engine's throughput vs its solo anchor",
    )
    args = ap.parse_args()

    import jax

    from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
    from multimodal_deepfake_detection_tpu.models.serve import AudioScorer, VisualScorer
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

    # -- 3. in-process micro-batcher under the traffic matrix ---------------
    def drive(mb, mode):
        """Inject args.clips through mb under one traffic shape; returns
        (inject_s, makespan_s). Open-loop modes sleep between arrivals, so
        throughput there is arrival-bound by design — the question they
        answer is whether latency/occupancy hold up, not peak rate."""
        futs = []
        t0 = time.perf_counter()
        if mode == "closed":
            work: "queue.Queue[np.ndarray]" = queue.Queue()
            for c in clips:
                work.put(c)

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
            inject_s = time.perf_counter() - t0
        elif mode == "poisson":
            rate = args.load * offline_clips_s
            gaps = np.random.default_rng(1).exponential(1.0 / rate, len(clips))
            for c, g in zip(clips, gaps):
                futs.append(mb.submit(frames=c))
                time.sleep(g)
            inject_s = time.perf_counter() - t0
            for f in futs:
                f.result(timeout=600)
        elif mode == "burst":
            gap = args.burst_size / max(offline_clips_s, 1e-9) * 1.2
            for i in range(0, len(clips), args.burst_size):
                for c in clips[i : i + args.burst_size]:
                    futs.append(mb.submit(frames=c))
                if i + args.burst_size < len(clips):
                    time.sleep(gap)
            inject_s = time.perf_counter() - t0
            for f in futs:
                f.result(timeout=600)
        else:
            raise ValueError(f"unknown traffic mode {mode!r}")
        return inject_s, time.perf_counter() - t0

    traffic = {}
    for mode in [m.strip() for m in args.traffic.split(",") if m.strip()]:
        mb = MicroBatcher(
            VisualAdapter(scorer), max_batch=B,
            max_wait_ms=args.max_wait_ms, batch_buckets=(1, B),
        )
        with mb:
            # warm both batch buckets (the B=1 program serves light traffic)
            for fut in [mb.submit(frames=clips[0])] + [mb.submit(frames=c) for c in clips[:B]]:
                fut.result(timeout=600)
            inject_s, makespan_s = drive(mb, mode)
            st = mb.stats()
        clips_s = args.clips / makespan_s
        traffic[mode] = {
            "clips_per_sec": round(clips_s, 1),
            "vs_offline_pct": round((clips_s / offline_clips_s - 1) * 100, 1),
            "occupancy": st["mean_batch_occupancy"],
            "queued_p50_ms": st["latency_ms_p50"],
            "queued_p90_ms": st["latency_ms_p90"],
            "drain_tail_s": round(makespan_s - inject_s, 3),
        }
        print(f"[{mode}] {args.clips} clips in {makespan_s:.2f} s = {clips_s:.1f} clips/s "
              f"({clips_s * T:.0f} frames/s) | occupancy {st['mean_batch_occupancy']:.1f}/{B} "
              f"| queued p50 {st['latency_ms_p50']} ms p90 {st['latency_ms_p90']} ms "
              f"| drain tail {makespan_s - inject_s:.2f} s")
        if mode == "closed":
            print(f"  batching overhead vs offline anchor: "
                  f"{(1 - clips_s / offline_clips_s) * 100:+.1f}%")

    first_mode = next(iter(traffic))
    daemon_clips_s = traffic.get("closed", traffic[first_mode])["clips_per_sec"]
    st = {"mean_batch_occupancy": traffic.get("closed", traffic[first_mode])["occupancy"],
          "latency_ms_p50": traffic.get("closed", traffic[first_mode])["queued_p50_ms"],
          "latency_ms_p90": traffic.get("closed", traffic[first_mode])["queued_p90_ms"]}

    mixed = None
    if args.mixed:
        # -- mixed-engine: visual + audio batchers sharing the chip ---------
        from multimodal_deepfake_detection_tpu.serving import AudioAdapter

        a_params, a_bn = xception_lstm_init(jax.random.PRNGKey(2), 16)
        a_scorer = AudioScorer(a_params, a_bn, sample_buckets=(16000,))
        waves = [rng.normal(0, 0.1, (16000,)).astype(np.float32) for _ in range(args.clips)]

        mb_a = MicroBatcher(AudioAdapter(a_scorer), max_batch=B,
                            max_wait_ms=args.max_wait_ms, batch_buckets=(1, B))
        with mb_a:  # audio solo anchor under the same closed-loop harness
            for fut in [mb_a.submit(waveform=waves[0])] + [mb_a.submit(waveform=w) for w in waves[:B]]:
                fut.result(timeout=600)
            t0 = time.perf_counter()
            qa: "queue.Queue[np.ndarray]" = queue.Queue()
            for w in waves:
                qa.put(w)

            def drain_a(m):
                while True:
                    try:
                        w = qa.get_nowait()
                    except queue.Empty:
                        return
                    m.score_sync(timeout=600, waveform=w)

            ths = [threading.Thread(target=drain_a, args=(mb_a,)) for _ in range(args.inflight)]
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            audio_solo_s = args.clips / (time.perf_counter() - t0)
        print(f"[mixed] audio solo anchor: {audio_solo_s:.1f} clips/s")

        mb_v = MicroBatcher(VisualAdapter(scorer), max_batch=B,
                            max_wait_ms=args.max_wait_ms, batch_buckets=(1, B))
        mb_a = MicroBatcher(AudioAdapter(a_scorer), max_batch=B,
                            max_wait_ms=args.max_wait_ms, batch_buckets=(1, B))
        with mb_v, mb_a:
            for fut in [mb_v.submit(frames=clips[0]), mb_a.submit(waveform=waves[0])] + \
                       [mb_v.submit(frames=c) for c in clips[:B]] + \
                       [mb_a.submit(waveform=w) for w in waves[:B]]:
                fut.result(timeout=600)
            qv: "queue.Queue[np.ndarray]" = queue.Queue()
            qa = queue.Queue()
            for c in clips:
                qv.put(c)
            for w in waves:
                qa.put(w)
            t_done = {}

            def drain_v():
                while True:
                    try:
                        c = qv.get_nowait()
                    except queue.Empty:
                        t_done.setdefault("v", time.perf_counter())
                        return
                    mb_v.score_sync(timeout=600, frames=c)

            def drain_a2():
                while True:
                    try:
                        w = qa.get_nowait()
                    except queue.Empty:
                        t_done.setdefault("a", time.perf_counter())
                        return
                    mb_a.score_sync(timeout=600, waveform=w)

            t0 = time.perf_counter()
            ths = [threading.Thread(target=drain_v) for _ in range(args.inflight // 2)] + \
                  [threading.Thread(target=drain_a2) for _ in range(args.inflight // 2)]
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            v_mix = args.clips / (t_done["v"] - t0)
            a_mix = args.clips / (t_done["a"] - t0)
            st_v, st_a = mb_v.stats(), mb_a.stats()
        mixed = {
            "visual_clips_per_sec": round(v_mix, 1),
            "audio_clips_per_sec": round(a_mix, 1),
            "visual_solo_clips_per_sec": round(daemon_clips_s, 1),
            "audio_solo_clips_per_sec": round(audio_solo_s, 1),
            "visual_occupancy": st_v["mean_batch_occupancy"],
            "audio_occupancy": st_a["mean_batch_occupancy"],
        }
        print(f"[mixed] concurrent: visual {v_mix:.1f} clips/s (solo {daemon_clips_s:.1f}), "
              f"audio {a_mix:.1f} clips/s (solo {audio_solo_s:.1f}) | "
              f"occupancy v {st_v['mean_batch_occupancy']:.1f} a {st_a['mean_batch_occupancy']:.1f}")

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
        "traffic": traffic,
        "mixed": mixed,
    }))


if __name__ == "__main__":
    main()
