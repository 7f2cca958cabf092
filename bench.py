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
    parser.add_argument("--trials", type=int, default=3, help="headline trials; best is reported")
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--no-fold-bn", action="store_true", help="disable inference BN folding")
    parser.add_argument(
        "--train",
        default=True,
        action=argparse.BooleanOptionalAction,
        help="also measure full train-step (fwd+bwd+Adam, live BN) throughput",
    )
    parser.add_argument("--train-batch", type=int, default=64)
    parser.add_argument(
        "--pallas",
        default=True,
        action=argparse.BooleanOptionalAction,
        help="fused Pallas middle-flow blocks (default on; --no-pallas for XLA-only)",
    )
    parser.add_argument(
        "--mfu",
        default=True,
        action=argparse.BooleanOptionalAction,
        help="also measure relay-free device time via chained K-differencing and report MFU",
    )
    parser.add_argument(
        "--quant",
        default=True,
        action=argparse.BooleanOptionalAction,
        help="also measure the opt-in w8a8 quantized serving path (supplementary "
        "fields; the headline stays the exact-semantics fp path)",
    )
    parser.add_argument(
        "--families",
        default=True,
        action=argparse.BooleanOptionalAction,
        help="also certify the non-flagship engines (audio clips/s, AU face & "
        "patch fp + w8a8) via tools/aubench.py as a bounded subprocess",
    )
    parser.add_argument("--families-timeout", type=float, default=1500.0)
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

    # The relay's per-call RPC overhead wobbles run to run (measured 39-44 ms
    # per identical pipelined call across back-to-back trials); best-of-N
    # removes that external noise from the headline without touching the
    # device-time accounting below.
    best_dt = float("inf")
    for trial in range(max(1, args.trials)):
        t0 = time.perf_counter()
        outs = [call(x, jnp.int32(trial * args.iters + i)) for i in range(args.iters)]
        checksum = sum(float(o) for o in outs)  # host readbacks force completion
        dt = time.perf_counter() - t0
        print(f"[bench] trial {trial}: {args.batch * args.iters / dt:.1f} frames/s", file=sys.stderr)
        best_dt = min(best_dt, dt)

    frames_per_sec = args.batch * args.iters / best_dt
    record = {
        "metric": "xception_face_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / 5000.0, 3),
    }

    if args.mfu and not args.no_fold_bn and platform != "cpu":
        # Relay-free device time: chain the net K times inside one jit, each
        # iteration's input data-dependent on the previous output (a runtime
        # scalar no XLA pass can factor out or CSE — unlike a scalar multiply
        # by a constant-per-call step index), and difference two K values so
        # the call floor, input upload, and prologue cancel.
        def make_chain(K):
            @jax.jit
            def chain(p, xin, i):
                h = xin * (1.0 + i.astype(jnp.float32) * 1e-6).astype(xin.dtype)

                def body(_, carry):
                    h, acc = carry
                    from multimodal_deepfake_detection_tpu.models.fold import folded_xception_apply

                    s = jnp.sum(
                        folded_xception_apply(p, h, compute_dtype=cdtype, use_pallas=use_pallas).astype(jnp.float32)
                    )
                    # data-dependent, numerically-null re-perturbation
                    h = (h.astype(jnp.float32) * (1.0 + s * 1e-38)).astype(xin.dtype)
                    return h, acc + s

                _, acc = jax.lax.fori_loop(0, K, body, (h, jnp.float32(0.0)))
                return acc

            return lambda i: chain(weights, x, jnp.int32(i))

        def timed(fn, iters=6):
            # best-of per call: relay RPC noise is strictly additive on top of
            # the deterministic device time, so min is the unbiased estimator
            # here (a single noisy window skewed a 6-call average by +40%)
            float(fn(999_999))
            best = float("inf")
            for i in range(iters):
                t0 = time.perf_counter()
                float(fn(i))
                best = min(best, time.perf_counter() - t0)
            return best

        ka, kb = 2, 6
        device_s = (timed(make_chain(kb)) - timed(make_chain(ka))) / (kb - ka)
        flops = xception_net_flops(args.batch, args.size)
        peak, peak_kind = device_peak_flops()
        record.update(
            device_ms_per_batch=round(device_s * 1e3, 2),
            frames_per_sec_device=round(args.batch / device_s, 1),
            mfu=round(flops / device_s / peak, 4),
            peak_tflops_assumed=round(peak / 1e12, 1),
            device_kind=peak_kind,
            net_gflops_per_batch=round(flops / 1e9, 1),
        )

    if args.quant and not args.no_fold_bn and platform != "cpu":
        # Supplementary: the w8a8-pallas quantized serving path
        # (models/quant.py — int8 weights + static activation scales, int8
        # depthwise so the bandwidth-bound entry blocks move half the bytes,
        # middle flow through the int8-pointwise pos Pallas kernel; best of
        # the four quant configs measured in PERF.md r3: 29.6 ms vs int8dw
        # XLA 35.8 / fp 36.8 at B=256). NOT the headline: quantized scores
        # match fp only to calibration tolerance (feature cos ~0.9999
        # measured), so the exact-semantics fp number above remains `value`.
        try:
            from multimodal_deepfake_detection_tpu.models.quant import (
                calibrate_amax,
                quantize_folded_xception,
                xception_quant_walk,
            )

            amaxes = calibrate_amax(folded, x[:32], compute_dtype=cdtype)
            qtree = jax.device_put(quantize_folded_xception(folded, amaxes, quant_depthwise=True))

            def make_qchain(K):
                @jax.jit
                def chain(p, xin, i):
                    h = xin * (1.0 + i.astype(jnp.float32) * 1e-6).astype(xin.dtype)

                    def body(_, carry):
                        h, acc = carry
                        s = jnp.sum(
                            xception_quant_walk(
                                p, h, quant=True, features_only=True,
                                middle_pallas=use_pallas,
                            ).astype(jnp.float32)
                        )
                        h = (h.astype(jnp.float32) * (1.0 + s * 1e-38)).astype(xin.dtype)
                        return h, acc + s

                    _, acc = jax.lax.fori_loop(0, K, body, (h, jnp.float32(0.0)))
                    return acc

                return lambda i: chain(qtree, x, jnp.int32(i))

            def qtimed(fn, iters=6):
                float(fn(999_999))
                best = float("inf")
                for i in range(iters):
                    t0 = time.perf_counter()
                    float(fn(i))
                    best = min(best, time.perf_counter() - t0)
                return best

            qdev = (qtimed(make_qchain(6)) - qtimed(make_qchain(2))) / 4
            record.update(
                int8_device_ms_per_batch=round(qdev * 1e3, 2),
                int8_frames_per_sec_device=round(args.batch / qdev, 1),
                int8_mode="w8a8-pallas" if use_pallas else "w8a8",
            )
        except Exception as e:  # never lose the headline to the quant extra
            print(f"[bench] quant measurement failed: {type(e).__name__}: {e}", file=sys.stderr)

    if args.train and platform != "cpu":
        # Training throughput: full Xception train step (fwd + bwd + Adam,
        # live BN, bf16 compute / fp32 params) chained state->state inside
        # one jit; the per-iteration rng seed is folded from the loop index
        # so iterations cannot be CSE'd. Same K-differencing as above.
        try:
            import optax

            from multimodal_deepfake_detection_tpu.train.state import TrainState
            from multimodal_deepfake_detection_tpu.train.steps import make_train_step

            tb = args.train_batch

            def loss_forward(p, bn, rng, batch):
                xin, y = batch
                logits, new_bn = xception_apply(p, bn, xin, train=True, compute_dtype=cdtype)
                probs = jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))
                loss = -jnp.mean(
                    y * jnp.log(probs + 1e-7) + (1 - y) * jnp.log(1 - probs + 1e-7)
                )
                return loss, (new_bn, probs)

            tx = optax.adam(1e-4)
            tstep = make_train_step(loss_forward, tx)
            xt = jnp.asarray(
                np.random.default_rng(1).random((tb, args.size, args.size, 3)), jnp.bfloat16
            )
            yt = jnp.asarray(np.arange(tb) % 2, jnp.float32)
            state0 = TrainState(0, params, state, tx.init(params), None)

            def timed(fn, iters=6):  # best-of per call (see the mfu block)
                float(fn(999_999))
                best = float("inf")
                for i in range(iters):
                    t0 = time.perf_counter()
                    float(fn(i))
                    best = min(best, time.perf_counter() - t0)
                return best

            def make_tchain(K):
                @jax.jit
                def chain(st, i):
                    def body(t, carry):
                        st, acc = carry
                        st, loss, _ = tstep(st, (xt, yt), i * K + t)
                        return st, acc + loss

                    _, acc = jax.lax.fori_loop(0, K, body, (st, jnp.float32(0.0)))
                    return acc

                return lambda i: chain(state0, jnp.int32(i))

            tka, tkb = 2, 6
            tdev = (timed(make_tchain(tkb)) - timed(make_tchain(tka))) / (tkb - tka)
            # train-step FLOPs ~ 3x the forward conv FLOPs (backward = input-
            # grad conv + kernel-grad conv per layer); BN/optimizer FLOPs are
            # noise at these shapes
            tflops = 3 * xception_net_flops(tb, args.size)
            tpeak, _ = device_peak_flops()
            record.update(
                train_step_ms=round(tdev * 1e3, 2),
                train_batch=tb,
                train_frames_per_sec=round(tb / tdev, 1),
                train_mfu=round(tflops / tdev / tpeak, 4),
            )
        except Exception as e:  # never lose the serving benchmark to this
            print(f"[bench] train measurement failed: {type(e).__name__}: {e}", file=sys.stderr)

    if args.families and platform != "cpu":
        # Certify every model family in the driver-visible record, not just
        # the flagship: audio (raw-waveform serving clips/s) and the two AU
        # engines, fp + w8a8 — measured by the tools/aubench.py chained-K
        # harness in a bounded subprocess (its last stdout line is JSON).
        try:
            import subprocess

            tool = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools", "aubench.py"
            )
            cp = subprocess.run(
                [sys.executable, tool, "--quant", "--which", "au_face,au_patch,audio"],
                capture_output=True, text=True, timeout=args.families_timeout,
            )
            fam = json.loads(cp.stdout.strip().splitlines()[-1])
            for k in (
                "audio_ms", "audio_clips_per_sec", "audio_seconds",
                "audio_w8a8_ms", "audio_w8a8_clips_per_sec", "audio_w8a8_score_cos",
                "au_face_ms", "au_face_clips_per_sec", "au_face_frames_per_sec",
                "au_face_w8a8_ms", "au_face_w8a8_clips_per_sec", "au_face_w8a8_logit_cos",
                "au_patch_ms", "au_patch_clips_per_sec",
                "au_patch_w8a8_ms", "au_patch_w8a8_clips_per_sec", "au_patch_w8a8_logit_cos",
            ):
                if k in fam:
                    record[k] = fam[k]
        except Exception as e:  # never lose the headline to the family extras
            print(f"[bench] family measurements failed: {type(e).__name__}: {e}", file=sys.stderr)

    print(json.dumps(record))


def device_peak_flops():
    """(bf16 peak FLOP/s, device_kind) for the actual chip behind the backend.

    Known kinds are mapped explicitly; unknown kinds fall back to the v5e
    figure (the one real chip behind this environment's relay) — and the
    assumed peak is always included in the JSON record so a wrong fallback is
    visible rather than silent.
    """
    import jax

    kind = str(getattr(jax.devices()[0], "device_kind", "unknown")).lower()
    peaks = {  # bf16 dense peak per chip
        "tpu v4": 275e12,
        "tpu v5 lite": 197e12,
        "tpu v5e": 197e12,
        "tpu v5": 459e12,
        "tpu v5p": 459e12,
        "tpu v6 lite": 918e12,
        "tpu v6e": 918e12,
    }
    for k, v in sorted(peaks.items(), key=lambda kv: -len(kv[0])):
        if k in kind:
            return v, kind
    return 197e12, f"{kind} (assumed v5e peak)"


def xception_net_flops(batch: int, size: int) -> int:
    """Conv/matmul FLOPs of one folded-Xception forward (multiply+add = 2)."""
    from multimodal_deepfake_detection_tpu.models.xception import XCEPTION_BLOCK_SPECS, _block_unit_channels

    total = 0

    def conv(h, w, cin, cout, k=1, groups=1):
        return h * w * (cin // groups) * cout * k * k * 2

    h = (size - 3) // 2 + 1  # conv1 s2 p0
    total += conv(h, h, 3, 32, 3)
    h = h - 2  # conv2 p0
    total += conv(h, h, 32, 64, 3)
    c = 64
    for spec in XCEPTION_BLOCK_SPECS:
        _, _, _, stride, _, _ = spec
        for cin, cout in _block_unit_channels(spec):
            total += conv(h, h, cin, cin, 3, groups=cin) + conv(h, h, cin, cout)
        if stride != 1:
            ho = (h + 2 * 1 - 3) // stride + 1
            total += conv(ho, ho, c, spec[1])  # projection skip
            h = ho
        c = spec[1]
    total += conv(h, h, 1024, 1024, 3, groups=1024) + conv(h, h, 1024, 1536)
    total += conv(h, h, 1536, 1536, 3, groups=1536) + conv(h, h, 1536, 2048)
    return total * batch


if __name__ == "__main__":
    main()
