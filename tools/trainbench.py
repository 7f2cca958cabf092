#!/usr/bin/env python
"""Training-step attribution + variant bench on the real TPU.

The round-2 verdict: serving runs at 41% MFU but the train step (fwd + bwd +
Adam, live BN) sits at ~22%. This harness finds out where the training
wall-clock goes and A/B-tests candidate fixes, with the same relay-proof
methodology as bench.py / netbench.py (chained K-differencing on
data-dependent, numerically-null perturbed inputs; host readback barrier).

Modes:
  parts   — fwd-only vs value_and_grad vs full optimizer step at one batch
  stages  — per-stage fwd+bwd marginal cost: d/dparams sum(prefix(stage)),
            differenced over adjacent prefixes (the grad analog of netbench)
  step    — full train step across batch sizes / variants
            (--remat, --bn_single_pass via env MDFD_BN_SINGLE_PASS=1)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/trainbench.py parts
  PYTHONPATH=/root/repo:/root/.axon_site python tools/trainbench.py stages --batch 64
  PYTHONPATH=/root/repo:/root/.axon_site python tools/trainbench.py step --batches 64,128,256 --remat
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["parts", "stages", "step"])
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--batches", default="")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--ka", type=int, default=2)
    p.add_argument("--kb", type=int, default=5)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--bn_eval", action="store_true", help="parts: run BN in eval mode inside grad (isolates BN-train backward)")
    p.add_argument("--upto", default="", help="comma list of stages (stages mode)")
    args = p.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from multimodal_deepfake_detection_tpu.models.xception import xception_apply, xception_init
    from multimodal_deepfake_detection_tpu.train.state import TrainState
    from multimodal_deepfake_detection_tpu.train.steps import make_train_step

    cdtype = jnp.bfloat16
    params, state = xception_init(jax.random.PRNGKey(0), num_classes=2)
    params_d = jax.device_put(params)
    state_d = jax.device_put(state)

    def timed(fn, iters):
        float(fn(1_000_000))  # compile + warm
        float(fn(1_000_001))
        t0 = time.perf_counter()
        outs = [fn(i) for i in range(iters)]
        _ = sum(float(o) for o in outs)
        return (time.perf_counter() - t0) / iters

    def kdiff(make, iters):
        ta = timed(make(args.ka), iters)
        tb = timed(make(args.kb), iters)
        return (tb - ta) / (args.kb - args.ka)

    def data(b, seed=0):
        return jax.device_put(
            jnp.asarray(np.random.default_rng(seed).random((b, args.size, args.size, 3)), jnp.bfloat16)
        )

    remat = bool(args.remat)

    if args.mode == "parts":
        B = args.batch
        x = data(B)
        y = jnp.asarray(np.arange(B) % 2, jnp.float32)

        bn_train = not args.bn_eval

        def loss_fn(p, bn, xin):
            logits, new_bn = xception_apply(p, bn, xin, train=bn_train, compute_dtype=cdtype, remat=remat)
            probs = jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))
            loss = -jnp.mean(y * jnp.log(probs + 1e-7) + (1 - y) * jnp.log(1 - probs + 1e-7))
            return loss, new_bn

        def make_fwd(K):
            @jax.jit
            def run(p, bn, xin, i):
                h0 = xin * (1.0 + i.astype(jnp.float32) * 1e-6).astype(xin.dtype)

                def body(_, carry):
                    h, acc = carry
                    loss, _ = loss_fn(p, bn, h)
                    h = (h.astype(jnp.float32) * (1.0 + loss * 1e-38)).astype(xin.dtype)
                    return h, acc + loss

                _, acc = jax.lax.fori_loop(0, K, body, (h0, jnp.float32(0)))
                return acc

            return lambda i: run(params_d, state_d, x, jnp.int32(i))

        grad_fn = jax.value_and_grad(lambda p, bn, xin: loss_fn(p, bn, xin), has_aux=True)

        def make_grad(K):
            @jax.jit
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

            return lambda i: run(params_d, state_d, x, jnp.int32(i))

        tx = optax.adam(1e-4)

        def loss_forward(p, bn, rng, batch):
            xin, yy = batch
            logits, new_bn = xception_apply(p, bn, xin, train=bn_train, compute_dtype=cdtype, remat=remat)
            probs = jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))
            loss = -jnp.mean(yy * jnp.log(probs + 1e-7) + (1 - yy) * jnp.log(1 - probs + 1e-7))
            return loss, (new_bn, probs)

        tstep = make_train_step(loss_forward, tx)
        state0 = TrainState(0, params, state, tx.init(params), None)

        def make_step(K):
            @jax.jit
            def run(st, i):
                def body(t, carry):
                    st, acc = carry
                    st, loss, _ = tstep(st, (x, y), i * K + t)
                    return st, acc + loss

                _, acc = jax.lax.fori_loop(0, K, body, (st, jnp.float32(0)))
                return acc

            return lambda i: run(state0, jnp.int32(i))

        from multimodal_deepfake_detection_tpu.ops import conv as _conv

        out = {"batch": B, "remat": remat, "bn_eval": args.bn_eval, "bn_custom": _conv._BN_CUSTOM}
        out["fwd_ms"] = round(kdiff(make_fwd, args.iters) * 1e3, 2)
        print("fwd", out["fwd_ms"], flush=True)
        out["grad_ms"] = round(kdiff(make_grad, args.iters) * 1e3, 2)
        print("grad", out["grad_ms"], flush=True)
        out["step_ms"] = round(kdiff(make_step, args.iters) * 1e3, 2)
        print("step", out["step_ms"], flush=True)
        print(json.dumps(out))

    elif args.mode == "stages":
        B = args.batch
        x = data(B)
        stages = ["stem"] + [f"block{i+1}" for i in range(12)] + ["exit"]
        if args.upto:
            keep = set(args.upto.split(","))
            stages = [s for s in stages if s in keep or s == "stem"]

        def make_stage(upto, K):
            def loss_fn(p, xin):
                out, _ = xception_apply(
                    p, state_d, xin, train=True, compute_dtype=cdtype, upto=upto, remat=remat
                )
                return jnp.sum(out.astype(jnp.float32))

            grad_fn = jax.value_and_grad(loss_fn)

            @jax.jit
            def run(p, xin, i):
                h0 = xin * (1.0 + i.astype(jnp.float32) * 1e-6).astype(xin.dtype)

                def body(_, carry):
                    h, acc = carry
                    loss, grads = grad_fn(p, h)
                    gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree_util.tree_leaves(grads))
                    h = (h.astype(jnp.float32) * (1.0 + (loss + gsum) * 1e-38)).astype(xin.dtype)
                    return h, acc + loss

                _, acc = jax.lax.fori_loop(0, K, body, (h0, jnp.float32(0)))
                return acc

            return lambda i: run(params_d, x, jnp.int32(i))

        results, prev = {}, None
        for s in stages:
            ms = kdiff(lambda K, _s=s: make_stage(_s, K), args.iters) * 1e3
            marg = None if prev is None else round(ms - prev, 2)
            results[s] = {"fwd_bwd_ms": round(ms, 2), "marginal_ms": marg}
            print(f"{s:10s} {ms:8.2f} ms  marginal {marg}", flush=True)
            prev = ms
        print(json.dumps({"batch": B, "remat": remat, "stages": results}))

    else:  # step across batches
        batches = [int(b) for b in (args.batches or str(args.batch)).split(",")]
        import optax

        tx = optax.adam(1e-4)
        out = {"remat": remat, "bn_single_pass": os.environ.get("MDFD_BN_SINGLE_PASS", "0")}
        for B in batches:
            x = data(B)
            y = jnp.asarray(np.arange(B) % 2, jnp.float32)

            def loss_forward(p, bn, rng, batch):
                xin, yy = batch
                logits, new_bn = xception_apply(p, bn, xin, train=True, compute_dtype=cdtype, remat=remat)
                probs = jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))
                loss = -jnp.mean(yy * jnp.log(probs + 1e-7) + (1 - yy) * jnp.log(1 - probs + 1e-7))
                return loss, (new_bn, probs)

            tstep = make_train_step(loss_forward, tx)
            state0 = TrainState(0, params, state, tx.init(params), None)

            def make_step(K, _x=x, _y=y, _tstep=tstep, _s0=state0):
                @jax.jit
                def run(st, i):
                    def body(t, carry):
                        st, acc = carry
                        st, loss, _ = _tstep(st, (_x, _y), i * K + t)
                        return st, acc + loss

                    _, acc = jax.lax.fori_loop(0, K, body, (st, jnp.float32(0)))
                    return acc

                return lambda i: run(_s0, jnp.int32(i))

            ms = kdiff(make_step, args.iters) * 1e3
            out[f"B{B}"] = {"step_ms": round(ms, 2), "frames_per_sec": round(B / ms * 1e3, 1)}
            print(f"B={B}: {ms:.2f} ms  {B / ms * 1e3:.0f} f/s", flush=True)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
