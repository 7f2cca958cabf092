#!/usr/bin/env python
"""Device time of the AU model families' serving forwards (real TPU).

The headline bench covers the flagship Xception; this closes the perf story
for the other two families — AUFaceCrossDetector (two ResNet-18 streams +
AU attention + biLSTMs + bidirectional cross-attention,
/root/reference/models_au_fusion.py contract) and
AUPatchResNetClassifierWithAUAttention — with the same chained-K
differencing as bench.py (data-dependent numerically-null perturbation
between iterations, host readback barrier, relay floor cancelled by
K-differencing).

Reports device ms per clip-batch and clips/s at reference-like shapes
(B clips x T frames x A AUs at 224^2 faces / 128^2 patches by default; the
train_au_face defaults, /root/reference/train_au_face.py:563-574).
"""
import argparse
import json
import os
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--aus", type=int, default=17)
    p.add_argument("--face_size", type=int, default=224)
    p.add_argument("--patch_size", type=int, default=128)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--ka", type=int, default=2)
    p.add_argument("--kb", type=int, default=8)
    p.add_argument("--which", default="au_face,au_patch,audio")
    p.add_argument("--audio_batch", type=int, default=64)
    p.add_argument("--audio_seconds", type=float, default=1.0)
    p.add_argument(
        "--train", action="store_true",
        help="also measure the au_face full train step (fwd+bwd+Adam, live BN)",
    )
    p.add_argument(
        "--quant", action="store_true",
        help="also measure the w8a8 paths (int8 ResNet-18 for the AU "
             "families, w8a8-pallas Xception for audio) + accuracy vs fp",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from multimodal_deepfake_detection_tpu.models.au_face import (
        au_face_detector_apply,
        au_face_detector_init,
    )
    from multimodal_deepfake_detection_tpu.models.resnet_lstm import (
        au_patch_classifier_apply,
        au_patch_classifier_init,
    )

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    B, T, A = args.batch, args.frames, args.aus
    rng = np.random.default_rng(0)

    record = {"batch": B, "frames": T, "aus": A}

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from chainedk import chained_device_time, timed_best

    def chainer(apply_fn, *arrays):
        return chained_device_time(
            apply_fn, arrays, ka=args.ka, kb=args.kb, iters=args.iters
        )

    if "au_face" in args.which:
        params, state = au_face_detector_init(jax.random.PRNGKey(0), num_aus=A)
        params = jax.device_put(params)
        state = jax.device_put(state)
        vids = jnp.asarray(rng.random((B, T, args.face_size, args.face_size, 3)), jnp.bfloat16)
        aus = jnp.asarray(rng.random((B, T, A, args.patch_size, args.patch_size, 3)), jnp.bfloat16)
        mask = jnp.ones((B, T, A), jnp.float32)

        def af(v, a, m):
            logits, _, _, _ = au_face_detector_apply(
                params, state, v, a, m, m, train=False, compute_dtype=jnp.bfloat16
            )
            return jnp.sum(logits.astype(jnp.float32))

        dev = chainer(af, vids, aus, mask)
        record.update(
            au_face_ms=round(dev * 1e3, 2),
            au_face_clips_per_sec=round(B / dev, 1),
            au_face_frames_per_sec=round(B * T / dev, 1),
        )
        print(f"au_face: {dev * 1e3:.2f} ms/batch = {B / dev:.1f} clips/s "
              f"({B * T / dev:.1f} frames/s)", flush=True)

        if args.quant:
            # the AUFaceScorer w8a8 path: int8 ResNet-18 for both streams
            # (models/serve.py::AUFaceScorer.calibrate), measured with the
            # same chained-K harness + accuracy vs the fp forward
            from functools import partial

            from multimodal_deepfake_detection_tpu.models.fold import fold_resnet18_bn
            from multimodal_deepfake_detection_tpu.models.quant import (
                calibrate_resnet18_amax,
                quantize_folded_resnet18,
                resnet18_quant_walk,
            )

            qb = {}
            for key, stream in (("face", vids), ("au", aus)):
                flat = stream.reshape((-1,) + stream.shape[-3:])
                folded = fold_resnet18_bn(params[f"{key}_backbone"], state[f"{key}_backbone"])
                amaxes = calibrate_resnet18_amax(folded, flat, compute_dtype=jnp.bfloat16)
                qb[key] = jax.device_put(quantize_folded_resnet18(folded, amaxes))
            bfns = {
                f"{key}_backbone_fn": partial(
                    lambda q, flat: resnet18_quant_walk(
                        q, flat, quant=True, compute_dtype=jnp.bfloat16
                    ),
                    qb[key],
                )
                for key in ("face", "au")
            }

            def af_logits(v, a, m, fns):
                logits, _, _, _ = au_face_detector_apply(
                    params, state, v, a, m, m, train=False,
                    compute_dtype=jnp.bfloat16, **fns,
                )
                return logits[:, 0].astype(jnp.float32)

            def afq(v, a, m):
                return jnp.sum(af_logits(v, a, m, bfns))

            lp_fp = np.asarray(jax.jit(lambda v, a, m: af_logits(v, a, m, {}))(vids, aus, mask))
            lp_q = np.asarray(jax.jit(lambda v, a, m: af_logits(v, a, m, bfns))(vids, aus, mask))
            cos = float(
                np.dot(lp_fp, lp_q) / (np.linalg.norm(lp_fp) * np.linalg.norm(lp_q) + 1e-12)
            )
            relerr = float(np.max(np.abs(lp_fp - lp_q)) / (np.max(np.abs(lp_fp)) + 1e-12))
            devq = chainer(afq, vids, aus, mask)
            record.update(
                au_face_w8a8_ms=round(devq * 1e3, 2),
                au_face_w8a8_clips_per_sec=round(B / devq, 1),
                au_face_w8a8_logit_cos=round(cos, 6),
                au_face_w8a8_logit_relerr=round(relerr, 4),
            )
            print(f"au_face w8a8: {devq * 1e3:.2f} ms/batch = {B / devq:.1f} clips/s "
                  f"(logit cos {cos:.5f}, relerr {relerr:.4f})", flush=True)

    if "au_patch" in args.which:
        params, state = au_patch_classifier_init(jax.random.PRNGKey(1))
        params = jax.device_put(params)
        state = jax.device_put(state)
        patches = jnp.asarray(
            rng.random((B, T, A, args.patch_size, args.patch_size, 3)), jnp.bfloat16
        )
        w = jnp.ones((B, T, A), jnp.float32)

        def ap(x, wts):
            logits, _ = au_patch_classifier_apply(
                params, state, x, wts, train=False, compute_dtype=jnp.bfloat16
            )
            return jnp.sum(logits.astype(jnp.float32))

        dev = chainer(ap, patches, w)
        record.update(
            au_patch_ms=round(dev * 1e3, 2),
            au_patch_clips_per_sec=round(B / dev, 1),
        )
        print(f"au_patch: {dev * 1e3:.2f} ms/batch = {B / dev:.1f} clips/s", flush=True)

        if args.quant:
            from multimodal_deepfake_detection_tpu.models.fold import fold_resnet18_bn
            from multimodal_deepfake_detection_tpu.models.quant import (
                calibrate_resnet18_amax,
                quantize_folded_resnet18,
                resnet18_quant_walk,
            )

            flat = patches.reshape((-1,) + patches.shape[-3:])
            folded = fold_resnet18_bn(params["backbone"], state["backbone"])
            amaxes = calibrate_resnet18_amax(folded, flat, compute_dtype=jnp.bfloat16)
            qtree = jax.device_put(quantize_folded_resnet18(folded, amaxes))

            def ap_logits(x, wts, bfn):
                logits, _ = au_patch_classifier_apply(
                    params, state, x, wts, train=False,
                    compute_dtype=jnp.bfloat16, backbone_fn=bfn,
                )
                return logits[:, 0].astype(jnp.float32)

            qfn = lambda f: resnet18_quant_walk(qtree, f, quant=True, compute_dtype=jnp.bfloat16)

            def apq(x, wts):
                return jnp.sum(ap_logits(x, wts, qfn))

            lp_fp = np.asarray(jax.jit(lambda x, wts: ap_logits(x, wts, None))(patches, w))
            lp_q = np.asarray(jax.jit(lambda x, wts: ap_logits(x, wts, qfn))(patches, w))
            cos = float(
                np.dot(lp_fp, lp_q) / (np.linalg.norm(lp_fp) * np.linalg.norm(lp_q) + 1e-12)
            )
            relerr = float(np.max(np.abs(lp_fp - lp_q)) / (np.max(np.abs(lp_fp)) + 1e-12))
            devq = chainer(apq, patches, w)
            record.update(
                au_patch_w8a8_ms=round(devq * 1e3, 2),
                au_patch_w8a8_clips_per_sec=round(B / devq, 1),
                au_patch_w8a8_logit_cos=round(cos, 6),
                au_patch_w8a8_logit_relerr=round(relerr, 4),
            )
            print(f"au_patch w8a8: {devq * 1e3:.2f} ms/batch = {B / devq:.1f} clips/s "
                  f"(logit cos {cos:.5f}, relerr {relerr:.4f})", flush=True)

    if "audio" in args.which:
        # the audio serving forward exactly as AudioScorer jits it: raw
        # waveforms -> on-device MFCC -> channel-triple -> 64^2 bilinear ->
        # folded Xception (Pallas pos middle on TPU) -> LSTM head
        from multimodal_deepfake_detection_tpu.models.heads import xception_lstm_init
        from multimodal_deepfake_detection_tpu.models.serve import AudioScorer

        ap, abn = xception_lstm_init(jax.random.PRNGKey(2), 512)
        sc = AudioScorer(ap, abn)
        Ba = args.audio_batch
        L = int(args.audio_seconds * sc.mfcc_kw["sr"])
        waves = jnp.asarray(
            np.sin(np.linspace(0, 70 * Ba, Ba * L)).reshape(Ba, L), jnp.float32
        )
        backbone, head = sc.folded_backbone, sc.head_params

        def au(w):
            return jnp.sum(
                sc._score_impl(backbone, head, w, None, centered=True).astype(jnp.float32)
            )

        dev = chainer(au, waves)
        record.update(
            audio_ms=round(dev * 1e3, 2),
            audio_clips_per_sec=round(Ba / dev, 1),
            audio_seconds=args.audio_seconds,
        )
        print(f"audio ({args.audio_seconds:.1f}s clips): {dev * 1e3:.2f} ms/batch-{Ba} "
              f"= {Ba / dev:.1f} clips/s", flush=True)

        if args.quant:
            scq = AudioScorer(ap, abn, quantize="w8a8-pallas")
            scq.calibrate(np.asarray(waves))
            qbackbone = scq._qbackbone

            def auq(w):
                return jnp.sum(
                    scq._score_impl(qbackbone, head, w, None, centered=True).astype(jnp.float32)
                )

            p_fp = np.asarray(
                jax.jit(lambda w: sc._score_impl(backbone, head, w, None, centered=True))(waves)
            )
            p_q = np.asarray(
                jax.jit(lambda w: scq._score_impl(qbackbone, head, w, None, centered=True))(waves)
            )
            cos = float(
                np.dot(p_fp, p_q) / (np.linalg.norm(p_fp) * np.linalg.norm(p_q) + 1e-12)
            )
            relerr = float(np.max(np.abs(p_fp - p_q)) / (np.max(np.abs(p_fp)) + 1e-12))
            devq = chainer(auq, waves)
            record.update(
                audio_w8a8_ms=round(devq * 1e3, 2),
                audio_w8a8_clips_per_sec=round(Ba / devq, 1),
                audio_w8a8_score_cos=round(cos, 6),
                audio_w8a8_score_relerr=round(relerr, 4),
            )
            print(f"audio w8a8-pallas: {devq * 1e3:.2f} ms/batch-{Ba} = {Ba / devq:.1f} clips/s "
                  f"(score cos {cos:.5f}, relerr {relerr:.4f})", flush=True)

    if "audio_stages" in args.which:
        # where the audio forward goes: MFCC frontend / channel-triple +
        # 64^2 bilinear / (B*T) Xception backbone / scan-LSTM head — each
        # stage chained-K in isolation (inputs of the real intermediate
        # shapes), so the budget can be compared against the end-to-end
        # audio number above.
        from multimodal_deepfake_detection_tpu.models.fold import folded_xception_apply
        from multimodal_deepfake_detection_tpu.models.heads import (
            xception_lstm_head_apply,
            xception_lstm_init,
        )
        from multimodal_deepfake_detection_tpu.models.serve import AudioScorer
        from multimodal_deepfake_detection_tpu.ops.resize import resize_bilinear
        from multimodal_deepfake_detection_tpu.ops.mfcc import mfcc as mfcc_op

        ap_, abn_ = xception_lstm_init(jax.random.PRNGKey(2), 512)
        sc = AudioScorer(ap_, abn_)
        backbone, head = sc.folded_backbone, sc.head_params
        Ba = args.audio_batch
        L = int(args.audio_seconds * sc.mfcc_kw["sr"])
        waves = jnp.asarray(
            np.sin(np.linspace(0, 70 * Ba, Ba * L)).reshape(Ba, L), jnp.float32
        )

        feats_mfcc = jax.jit(lambda w: mfcc_op(w, center=True, **sc.mfcc_kw))(waves)
        T = feats_mfcc.shape[1]
        imgs = jax.jit(lambda f: resize_bilinear(
            jnp.broadcast_to(f.reshape(Ba * T, 13, 1, 1), (Ba * T, 13, 1, 3)), (64, 64)
        ))(feats_mfcc)
        feats = jax.jit(
            lambda x: folded_xception_apply(
                backbone, x, compute_dtype=jnp.bfloat16, features_only=True,
                use_pallas=sc.use_pallas,
            )
        )(imgs).reshape(Ba, T, -1)

        stages = {
            "mfcc": (lambda w: jnp.sum(mfcc_op(w, center=True, **sc.mfcc_kw)), (waves,)),
            "to_imgs": (
                lambda f: jnp.sum(resize_bilinear(
                    jnp.broadcast_to(f.reshape(Ba * T, 13, 1, 1), (Ba * T, 13, 1, 3)),
                    (64, 64),
                ).astype(jnp.float32)),
                (feats_mfcc,),
            ),
            "backbone": (
                lambda x: jnp.sum(folded_xception_apply(
                    backbone, x, compute_dtype=jnp.bfloat16, features_only=True,
                    use_pallas=sc.use_pallas,
                ).astype(jnp.float32)),
                (imgs,),
            ),
            "head": (
                lambda f: jnp.sum(xception_lstm_head_apply(
                    head, f, lengths=None, mask_padding=True, compute_dtype=jnp.bfloat16,
                ).astype(jnp.float32)),
                (feats,),
            ),
        }
        budget = {}
        for name, (fn, arrs) in stages.items():
            d = chainer(fn, *arrs)
            budget[name] = round(d * 1e3, 2)
            print(f"audio stage {name}: {d * 1e3:.2f} ms", flush=True)
        record.update(audio_stage_ms=budget, audio_stage_frames=int(Ba * T))
        print(f"audio stages sum: {sum(budget.values()):.2f} ms "
              f"({Ba}x{T} frames)", flush=True)

    if args.train and "au_face" in args.which:
        import optax

        params, state = au_face_detector_init(jax.random.PRNGKey(0), num_aus=A)
        vids = jnp.asarray(rng.random((B, T, args.face_size, args.face_size, 3)), jnp.bfloat16)
        aus = jnp.asarray(rng.random((B, T, A, args.patch_size, args.patch_size, 3)), jnp.bfloat16)
        mask = jnp.ones((B, T, A), jnp.float32)
        y = jnp.asarray(np.arange(B) % 2, jnp.float32)
        tx = optax.adam(1e-4)

        def loss_fn(p, st, v, a, m):
            logits, _, _, new_st = au_face_detector_apply(
                p, st, v, a, m, m, train=True, compute_dtype=jnp.bfloat16
            )
            probs = jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))
            loss = -jnp.mean(y * jnp.log(probs + 1e-7) + (1 - y) * jnp.log(1 - probs + 1e-7))
            return loss, new_st

        def step(carry, v, a, m):
            p, st, opt = carry
            (loss, new_st), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, st, v, a, m)
            updates, opt = tx.update(grads, opt, p)
            return (optax.apply_updates(p, updates), new_st, opt), loss

        carry0 = (params, state, tx.init(params))
        carry0 = jax.device_put(carry0)

        def make(K):
            @jax.jit
            def chain(carry, ars, i):
                f0 = 1.0 + i.astype(jnp.float32) * 1e-6
                ars = tuple(x * f0.astype(x.dtype) for x in ars)

                def body(_, c):
                    carry, xs, acc = c
                    carry, loss = step(carry, *xs)
                    f = 1.0 + loss * 1e-38
                    xs = tuple((x.astype(jnp.float32) * f).astype(x.dtype) for x in xs)
                    return carry, xs, acc + loss

                _, _, acc = jax.lax.fori_loop(0, K, body, (carry, ars, jnp.float32(0.0)))
                return acc

            ars = tuple(jax.device_put(x) for x in (vids, aus, mask))
            return lambda i: chain(carry0, ars, jnp.int32(i))

        ta = timed_best(make(args.ka), args.iters)
        tb = timed_best(make(args.kb), args.iters)
        dev = (tb - ta) / (args.kb - args.ka)
        record.update(
            au_face_train_step_ms=round(dev * 1e3, 2),
            au_face_train_clips_per_sec=round(B / dev, 1),
        )
        print(f"au_face train step: {dev * 1e3:.2f} ms = {B / dev:.1f} clips/s", flush=True)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
