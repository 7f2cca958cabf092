"""Trained-weight quantization dAUC measurement — the on-chip companion of
tests/test_quant_trained_dauc.py.

Reuses the SAME train_*_micro fixtures the CPU tests assert on, but runs them
on whatever backend is live (the real TPU by default in this environment) and
measures every engine x quant-mode x refine combination, including the Pallas
int8 middle-flow paths that CPU tests can only run in interpret mode. Output:
the PERF.md trained-weight dAUC table (markdown) plus a JSON blob.

The torch reference has no quantization (its eval loops are pure fp:
/root/reference/test_visual.py:620-624, test_au_face.py:147-184); the
acceptance criterion is BASELINE.json's +-0.5% AUC band.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/quant_dauc.py \
        [--engines visual,audio,au_patch,au_face] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _modes_for(engine: str):
    # Xception engines have the Pallas int8-pointwise middle flow; the
    # ResNet-18 engines are plain-XLA w8a8 only (models/quant.py).
    if engine in ("visual", "audio"):
        return ("w8a8", "w8a8-hybrid", "w8a8-pallas")
    return ("w8a8",)


def _score_rows(engine, trained, workdir):
    """Yield result-row dicts for one engine."""
    from multimodal_deepfake_detection_tpu.models.serve import (
        AudioScorer,
        AUFaceScorer,
        AUPatchScorer,
        VisualScorer,
    )
    from test_quant_trained_dauc import _auc

    rows = []
    if engine == "visual":
        params, bn, calib, test_x, test_y = trained
        mk = lambda **kw: VisualScorer(params, bn, compute_dtype=jnp.float32, **kw)
        score = lambda sc: sc.score(test_x)
        cal = lambda sc, r: sc.calibrate(calib, refine_passes=r)
    elif engine == "audio":
        params, bn, calib, test_x, test_y = trained
        mk = lambda **kw: AudioScorer(params, bn, compute_dtype=jnp.float32, **kw)
        score = lambda sc: sc.score(test_x)
        cal = lambda sc, r: sc.calibrate(calib, refine_passes=r)
    elif engine == "au_patch":
        params, bn, calib, test_x, test_y = trained
        mk = lambda **kw: AUPatchScorer(params, bn, compute_dtype=jnp.float32, **kw)
        score = lambda sc: sc.score(test_x)
        cal = lambda sc, r: sc.calibrate(calib, refine_passes=r)
    elif engine == "au_face":
        params, bn, (calib_v, calib_a), (test_v, test_a), test_y = trained
        mk = lambda **kw: AUFaceScorer(params, bn, compute_dtype=jnp.float32, **kw)
        score = lambda sc: sc.score(test_v, test_a)
        cal = lambda sc, r: sc.calibrate(calib_v, calib_a, refine_passes=r)
    else:
        raise ValueError(engine)

    s_fp = np.asarray(score(mk()), np.float64)
    # reference-style sign auto-flip (only au_face's ungradiented logits head
    # can come out inverted; a no-op for the trained supervised engines)
    flip = _auc(test_y, 1.0 - s_fp) > _auc(test_y, s_fp)
    orient = (lambda s: 1.0 - s) if flip else (lambda s: s)
    auc_fp = _auc(test_y, orient(s_fp))
    rows.append(dict(engine=engine, mode="fp32", refine="-", auc=auc_fp, dauc=0.0,
                     max_ds=0.0, flip=flip))
    for mode in _modes_for(engine):
        for refine in (0, 1):
            t0 = time.time()
            q = mk(quantize=mode)
            cal(q, refine)
            s_q = np.asarray(score(q), np.float64)
            auc_q = _auc(test_y, orient(s_q))
            rows.append(dict(
                engine=engine, mode=mode, refine=refine, auc=auc_q,
                dauc=abs(auc_q - auc_fp),
                max_ds=float(np.max(np.abs(s_q - s_fp))),
                secs=round(time.time() - t0, 1),
            ))
            print(f"  {engine:8s} {mode:12s} refine={refine}  AUC {auc_q:.4f}  "
                  f"dAUC {abs(auc_q - auc_fp):.4f}  ({time.time()-t0:.0f}s)", flush=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--engines", default="visual,audio,au_patch,au_face")
    ap.add_argument("--json", default=None, help="write rows as JSON here")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args(argv)

    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache
    from test_quant_trained_dauc import (
        train_au_face_micro,
        train_au_patch_micro,
        train_audio_micro,
        train_visual_micro,
    )

    enable_compilation_cache()
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})", flush=True)
    trainers = {
        "visual": train_visual_micro,
        "audio": train_audio_micro,
        "au_patch": train_au_patch_micro,
        "au_face": train_au_face_micro,
    }
    workdir = args.workdir or tempfile.mkdtemp(prefix="quant_dauc_")
    all_rows = []
    for engine in args.engines.split(","):
        engine = engine.strip()
        t0 = time.time()
        print(f"[{engine}] training micro fixture...", flush=True)
        trained = trainers[engine](os.path.join(workdir, engine))
        print(f"[{engine}] trained in {time.time()-t0:.0f}s; scoring", flush=True)
        all_rows.extend(_score_rows(engine, trained, workdir))

    print("\n| engine | quant | refine | AUC | dAUC | max |ds| |")
    print("|---|---|---|---|---|---|")
    for r in all_rows:
        print(f"| {r['engine']} | {r['mode']} | {r['refine']} | {r['auc']:.4f} "
              f"| {r['dauc']:.4f} | {r['max_ds']:.4f} |")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(all_rows, f, indent=1)
        print(f"wrote {args.json}")
    return all_rows


if __name__ == "__main__":
    main()
