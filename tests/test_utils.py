"""Utility subsystems: JSONL logger (strict JSON, NaN handling), compile-cache
opt-out, StepTimer, t-SNE export."""
import json
import os

import numpy as np

from multimodal_deepfake_detection_tpu.train.loop import EpochResult
from multimodal_deepfake_detection_tpu.utils.metric_logger import JsonlLogger
from multimodal_deepfake_detection_tpu.utils.profiling import StepTimer
from multimodal_deepfake_detection_tpu.utils.visualize import run_tsne_and_plot


def test_jsonl_logger_strict_json_with_nan(tmp_path):
    path = str(tmp_path / "run.jsonl")
    logger = JsonlLogger(path, run_name="t", config={"lr": 1e-4})
    result = EpochResult(
        epoch=0,
        train_loss=0.5,
        train_metrics={"AUC": float("nan"), "pAUC": float("inf")},
        eval_loss=0.4,
        eval_metrics={"AUC": 0.9},
    )
    logger.log_epoch(result)
    logger.log(step=3, lr=1e-4)
    logger.close()

    lines = open(path).read().splitlines()
    assert len(lines) == 3
    # strict JSON parse (would fail on bare NaN/Infinity)
    objs = [json.loads(l, parse_constant=lambda c: (_ for _ in ()).throw(ValueError(c))) for l in lines]
    assert objs[0]["event"] == "run_start" and objs[0]["config"]["lr"] == 1e-4
    assert objs[1]["train_metrics"]["AUC"] is None
    assert objs[1]["train_metrics"]["pAUC"] is None
    assert objs[1]["eval_metrics"]["AUC"] == 0.9
    assert objs[2] == {k: objs[2][k] for k in objs[2]} and objs[2]["step"] == 3


def test_compile_cache_opt_out(tmp_path, monkeypatch):
    from multimodal_deepfake_detection_tpu.core.cache import enable_compilation_cache

    monkeypatch.setenv("MDD_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache() is None
    monkeypatch.delenv("MDD_NO_COMPILE_CACHE")
    monkeypatch.setenv("MDD_COMPILE_CACHE_DIR", str(tmp_path / "cache"))
    out = enable_compilation_cache()
    # cache dirs are per-platform (CPU AOT artifacts must not be shared)
    assert out.startswith(str(tmp_path / "cache") + os.sep) and os.path.isdir(out)


def test_step_timer():
    t = StepTimer("step")
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert "n=3" in s and "p95" in s


def test_tsne_plot(tmp_path):
    X = np.random.default_rng(0).normal(0, 1, (40, 8))
    y = np.array([0, 1] * 20)
    path = str(tmp_path / "t.png")
    Z = run_tsne_and_plot(X, y, "test", path, seed=0, n_iter=260, log=lambda s: None)
    assert Z.shape == (40, 2)
    assert os.path.exists(path) and os.path.getsize(path) > 1000
    # empty input: no crash, no file
    assert run_tsne_and_plot(np.zeros((0, 4)), np.zeros(0), "e", str(tmp_path / "e.png"), log=lambda s: None) is None
