#!/usr/bin/env python
"""Micro-probe: fwd+bwd cost of single ops at entry-flow shapes (real TPU).

trainbench.py stages showed block1 fwd+bwd = 23.5 ms at B=64 (~9x its
forward). This times each candidate op's value_and_grad in isolation with the
chained K-differencing methodology, to pin the pathological lowering:
maxpool backward (select-and-scatter), depthwise kernel-grad (grouped conv),
pointwise convs, live-BN.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/gradprobe.py [--batch 64] [--ops pool,dw,...]
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
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--hw", type=int, default=125)
    p.add_argument("--ops", default="pool,dw,pw,bn,sep")
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import multimodal_deepfake_detection_tpu.ops.conv as conv

    B, HW = args.batch, args.hw
    rng = np.random.default_rng(0)

    def timed(fn, iters):
        float(fn(1_000_000))
        float(fn(1_000_001))
        t0 = time.perf_counter()
        outs = [fn(i) for i in range(iters)]
        _ = sum(float(o) for o in outs)
        return (time.perf_counter() - t0) / iters

    def kdiff(build, ka=2, kb=6):
        return (timed(build(kb), args.iters) - timed(build(ka), args.iters)) / (kb - ka)

    def chain(loss_fn, x0, params):
        """K-chained value_and_grad with data-dependent reperturbation."""
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

        def build(K):
            @jax.jit
            def run(p, xin, i):
                h0 = xin * (1.0 + i.astype(jnp.float32) * 1e-6).astype(xin.dtype)

                def body(_, carry):
                    h, acc = carry
                    loss, (gx, gp) = grad_fn(p, h)
                    gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree_util.tree_leaves((gx, gp)))
                    h = (h.astype(jnp.float32) * (1.0 + (loss + gsum) * 1e-38)).astype(xin.dtype)
                    return h, acc + loss
                _, acc = jax.lax.fori_loop(0, K, body, (h0, jnp.float32(0)))
                return acc
            return lambda i: run(params, x0, jnp.int32(i))

        return build

    results = {}
    ops = args.ops.split(",")

    if "pool" in ops:
        x = jax.device_put(jnp.asarray(rng.random((B, HW, HW, 128)), jnp.bfloat16))
        for impl in ("reduce_window", "shift"):
            conv._POOL_IMPL = impl
            def loss(p, xin):
                return jnp.sum(conv.max_pool2d(xin, 3, 2, 1).astype(jnp.float32) ** 2) * (1.0 + 0.0 * jnp.sum(p))
            ms = kdiff(chain(loss, x, jnp.float32(0))) * 1e3
            results[f"pool_{impl}"] = round(ms, 2)
            print(f"pool[{impl}] fwd+bwd {ms:.2f} ms", flush=True)

    if "dw" in ops:
        for C in (64, 128):
            x = jax.device_put(jnp.asarray(rng.random((B, HW, HW, C)), jnp.bfloat16))
            w = jax.device_put(jnp.asarray(rng.random((3, 3, 1, C)) * 0.1, jnp.bfloat16))
            for custom in (False, True):
                def loss(p, xin, _custom=custom):
                    out = conv._depthwise3x3_custom(xin, p) if _custom else conv._dw3x3(xin, p)
                    return jnp.sum(out.astype(jnp.float32) ** 2)
                ms = kdiff(chain(loss, x, w)) * 1e3
                results[f"dw{C}_{'custom' if custom else 'xla'}"] = round(ms, 2)
                print(f"dw C={C} {'custom' if custom else 'xla '} fwd+bwd {ms:.2f} ms", flush=True)

    if "pw" in ops:
        for Ci, Co in ((64, 128), (128, 128)):
            x = jax.device_put(jnp.asarray(rng.random((B, HW, HW, Ci)), jnp.bfloat16))
            w = jax.device_put(jnp.asarray(rng.random((1, 1, Ci, Co)) * 0.1, jnp.bfloat16))
            def loss(p, xin):
                out = jax.lax.conv_general_dilated(
                    xin, p, (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.sum(out.astype(jnp.float32) ** 2)
            ms = kdiff(chain(loss, x, w)) * 1e3
            results[f"pw{Ci}to{Co}"] = round(ms, 2)
            print(f"pw {Ci}->{Co} fwd+bwd {ms:.2f} ms", flush=True)

    if "bn" in ops:
        x = jax.device_put(jnp.asarray(rng.random((B, HW, HW, 128)), jnp.bfloat16))
        bn_p = {"scale": jnp.ones((128,)), "bias": jnp.zeros((128,))}
        bn_s = {"mean": jnp.zeros((128,)), "var": jnp.ones((128,))}
        def loss(p, xin):
            out, _ = conv.batch_norm(p, bn_s, xin, train=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        ms = kdiff(chain(loss, x, bn_p)) * 1e3
        results["bn128"] = round(ms, 2)
        print(f"bn train 128ch fwd+bwd {ms:.2f} ms", flush=True)

    if "block" in ops:
        # full block1 composition, ablatable: which interaction blows up the
        # backward? variants drop one structural element at a time.
        from multimodal_deepfake_detection_tpu.models.xception import _block_apply, _block_init

        x = jax.device_put(jnp.asarray(rng.random((B, HW, HW, 64)), jnp.bfloat16))
        variants = {
            "full": ((64, 128, 2, 2, True, True), True),    # block1 as shipped
            "bneval": ((64, 128, 2, 2, True, True), False),  # BN eval mode
            "nopool": ((64, 128, 2, 1, True, True), True),   # stride 1: no maxpool
            "noskip": ((64, 64, 2, 1, True, True), True),    # identity skip
        }
        for variant, (vspec, train_flag) in variants.items():
            vp, vs = _block_init(jax.random.PRNGKey(0), vspec, jnp.float32)
            vp, vs = jax.device_put(vp), jax.device_put(vs)

            def loss(p, xin, _spec=vspec, _train=train_flag, _vs=vs):
                out, _ = _block_apply(p, _vs, _spec, xin, train=_train, compute_dtype=jnp.bfloat16)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            ms = kdiff(chain(loss, x, vp)) * 1e3
            results[f"block1_{variant}"] = round(ms, 2)
            print(f"block1[{variant}] fwd+bwd {ms:.2f} ms", flush=True)

    if "split" in ops:
        # split block1's backward into its dx-chain (grad wrt the input only;
        # kernel-grad convs dead-code away) vs dw-chain (grad wrt params only)
        # — in the REAL composition, where the 23.5 ms lives (PERF.md r3).
        from multimodal_deepfake_detection_tpu.models.xception import _block_apply, _block_init

        spec = (64, 128, 2, 2, True, True)
        bp, bs = _block_init(jax.random.PRNGKey(0), spec, jnp.float32)
        bp, bs = jax.device_put(bp), jax.device_put(bs)
        x = jax.device_put(jnp.asarray(rng.random((B, HW, HW, 64)), jnp.bfloat16))

        def block_loss(p, xin):
            out, _ = _block_apply(p, bs, spec, xin, train=True, compute_dtype=jnp.bfloat16)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        for which, argnums in (("dx_only", 1), ("dw_only", 0), ("both", (0, 1))):
            grad_fn = jax.value_and_grad(block_loss, argnums=argnums)

            def build(K, _g=grad_fn):
                @jax.jit
                def run(p, xin, i):
                    h0 = (xin.astype(jnp.float32) * (1.0 + i.astype(jnp.float32) * 1e-6)).astype(xin.dtype)

                    def body(_, carry):
                        h, acc = carry
                        loss, g = _g(p, h)
                        gsum = sum(jnp.sum(gg.astype(jnp.float32)) for gg in jax.tree_util.tree_leaves(g))
                        h = (h.astype(jnp.float32) * (1.0 + (loss + gsum) * 1e-38)).astype(xin.dtype)
                        return h, acc + loss

                    _, acc = jax.lax.fori_loop(0, K, body, (h0, jnp.float32(0)))
                    return acc

                return lambda i: run(bp, x, jnp.int32(i))

            ms = kdiff(build) * 1e3
            results[f"block1_{which}"] = round(ms, 2)
            print(f"block1[{which}] fwd+bwd {ms:.2f} ms", flush=True)

    if "kgrad" in ops:
        # per-kernel-grad attribution: grad of block1 wrt ONE conv weight at a
        # time (the other kernel-grad contractions dead-code away; the
        # dx-chain up to that weight's use site remains). Differences between
        # rows isolate each kernel-grad conv's cost.
        from multimodal_deepfake_detection_tpu.models.xception import _block_apply, _block_init

        spec = (64, 128, 2, 2, True, True)
        bp, bs = _block_init(jax.random.PRNGKey(0), spec, jnp.float32)
        bp, bs = jax.device_put(bp), jax.device_put(bs)
        x = jax.device_put(jnp.asarray(rng.random((B, HW, HW, 64)), jnp.bfloat16))

        def set_leaf(path, leaf):
            p = {"units": [dict(u) for u in bp["units"]], "skip": dict(bp["skip"])}
            if path[0] == "skip":
                p["skip"] = {**p["skip"], "conv": {"w": leaf}}
            else:
                i = path[1]
                p["units"][i] = {**p["units"][i], "sep": {**p["units"][i]["sep"], path[2]: {"w": leaf}}}
            return p

        leaves = {
            "none": None,
            "u0_dw": ("units", 0, "depthwise"),
            "u0_pw": ("units", 0, "pointwise"),
            "u1_dw": ("units", 1, "depthwise"),
            "u1_pw": ("units", 1, "pointwise"),
            "skip": ("skip",),
        }
        for name, path in leaves.items():
            if path is None:
                def loss(leaf, xin):
                    out, _ = _block_apply(bp, bs, spec, xin, train=True, compute_dtype=jnp.bfloat16)
                    return jnp.sum(out.astype(jnp.float32) ** 2) * (1.0 + 0.0 * jnp.sum(leaf))
                leaf0 = jnp.float32(0)
            else:
                if path[0] == "skip":
                    leaf0 = bp["skip"]["conv"]["w"]
                else:
                    leaf0 = bp["units"][path[1]]["sep"][path[2]]["w"]

                def loss(leaf, xin, _path=path):
                    out, _ = _block_apply(set_leaf(_path, leaf), bs, spec, xin, train=True, compute_dtype=jnp.bfloat16)
                    return jnp.sum(out.astype(jnp.float32) ** 2)

            grad_fn = jax.value_and_grad(loss)

            def build(K, _g=grad_fn, _l=leaf0):
                @jax.jit
                def run(leaf, xin, i):
                    h0 = (xin.astype(jnp.float32) * (1.0 + i.astype(jnp.float32) * 1e-6)).astype(xin.dtype)

                    def body(_, carry):
                        h, acc = carry
                        lv, g = _g(leaf, h)
                        gsum = jnp.sum(g.astype(jnp.float32))
                        h = (h.astype(jnp.float32) * (1.0 + (lv + gsum) * 1e-38)).astype(xin.dtype)
                        return h, acc + lv

                    _, acc = jax.lax.fori_loop(0, K, body, (h0, jnp.float32(0)))
                    return acc

                return lambda i: run(_l, x, jnp.int32(i))

            ms = kdiff(build) * 1e3
            results[f"kgrad_{name}"] = round(ms, 2)
            print(f"block1 kgrad[{name}] fwd+bwd {ms:.2f} ms", flush=True)

    if "sep" in ops:
        # one full unit: dw + pw + BN (the block1 unit shape)
        x = jax.device_put(jnp.asarray(rng.random((B, HW, HW, 64)), jnp.bfloat16))
        params = {
            "sep": {
                "depthwise": {"w": jnp.asarray(rng.random((3, 3, 1, 64)) * 0.1, jnp.float32)},
                "pointwise": {"w": jnp.asarray(rng.random((1, 1, 64, 128)) * 0.1, jnp.float32)},
            },
            "bn": {"scale": jnp.ones((128,)), "bias": jnp.zeros((128,))},
        }
        bn_s = {"mean": jnp.zeros((128,)), "var": jnp.ones((128,))}
        def loss(p, xin):
            h = conv.separable_conv2d(p["sep"], xin, compute_dtype=jnp.bfloat16)
            h, _ = conv.batch_norm(p["bn"], bn_s, h, train=True)
            return jnp.sum(h.astype(jnp.float32) ** 2)
        ms = kdiff(chain(loss, x, params)) * 1e3
        results["sep_unit1"] = round(ms, 2)
        print(f"sep unit (64->128 + BN) fwd+bwd {ms:.2f} ms", flush=True)

    print(json.dumps({"batch": B, "hw": HW, **results}))


if __name__ == "__main__":
    main()
