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


def _epoch_result(epoch=0):
    from multimodal_deepfake_detection_tpu.train.loop import EpochResult

    return EpochResult(
        epoch=epoch, train_loss=0.5, train_metrics={"acc": 0.9},
        eval_loss=0.4, eval_metrics={"AUC": 0.95}, lr=1e-4, seconds=1.2,
    )


def test_tensorboard_logger_writes_events(tmp_path):
    from multimodal_deepfake_detection_tpu.utils.metric_logger import TensorBoardLogger

    lg = TensorBoardLogger(str(tmp_path), run_name="r", config={"lr": 1e-4})
    lg.log_epoch(_epoch_result())
    lg.log(step_time=0.1)
    lg.close()
    files = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert any("tfevents" in f for f in files)


def test_wandb_logger_with_fake_module(monkeypatch, tmp_path):
    """WandbLogger drives the reference's wandb API surface
    (init/config.update/log/finish, /root/reference/train_visual.py:14,82-92)."""
    import sys, types

    calls = {"log": [], "init": [], "config": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls["init"].append(kw) or types.SimpleNamespace(**kw)
    fake.config = types.SimpleNamespace(update=lambda d: calls["config"].append(d))
    fake.log = lambda scalars, step=None: calls["log"].append((scalars, step))
    fake.finish = lambda: calls.__setitem__("finish", calls["finish"] + 1)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from multimodal_deepfake_detection_tpu.utils.metric_logger import WandbLogger

    lg = WandbLogger("proj", run_name="r", config={"lr": 1e-4})
    lg.log_epoch(_epoch_result(epoch=3))
    lg.close()
    assert calls["init"][0]["project"] == "proj" and calls["init"][0]["resume"] is True
    assert calls["config"] == [{"lr": 1e-4}]
    scalars, step = calls["log"][0]
    assert step == 3
    assert scalars["Loss/Train"] == 0.5 and scalars["AUC/Eval"] == 0.95
    assert scalars["Epoch Time"] == 1.2  # reference key style (train_visual.py:133-137)
    assert calls["finish"] == 1


def test_make_metric_logger_multi_and_errors(tmp_path, monkeypatch):
    from multimodal_deepfake_detection_tpu.utils import metric_logger as M

    assert M.make_metric_logger([]) is None
    assert M.make_metric_logger(None) is None

    lg = M.make_metric_logger(
        f"jsonl:{tmp_path / 'm.jsonl'},tensorboard:{tmp_path / 'tb'}", run_name="r")
    assert isinstance(lg, M.MultiLogger) and len(lg.loggers) == 2
    lg.log_epoch(_epoch_result())
    lg.close()
    assert (tmp_path / "m.jsonl").exists()

    import pytest

    with pytest.raises(ValueError):
        M.make_metric_logger(["tensorboard"])  # missing arg
    with pytest.raises(ValueError):
        M.make_metric_logger(["mlflow:x"])  # unknown kind


def test_input_saliency_unit():
    """Saliency of a known quadratic score is the analytic |2x| map."""
    import jax.numpy as jnp
    from multimodal_deepfake_detection_tpu.utils.saliency import input_saliency, normalize_map

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 4, 4, 3)).astype(np.float32))
    score = lambda v: jnp.sum(v.astype(jnp.float32) ** 2, axis=(1, 2, 3, 4))
    sal = np.asarray(input_saliency(score, x))
    ref = np.max(np.abs(2 * np.asarray(x)), axis=-1)
    np.testing.assert_allclose(sal, ref, rtol=1e-6)
    n = normalize_map(sal)
    assert n.min() >= 0 and n.max() <= 1


def test_saliency_grid_png(tmp_path):
    from multimodal_deepfake_detection_tpu.utils.saliency import save_saliency_grid

    frames = np.random.default_rng(1).random((2, 3, 8, 8, 3)).astype(np.float32)
    sal = np.random.default_rng(2).random((2, 3, 8, 8)).astype(np.float32)
    path = save_saliency_grid(
        frames, sal, str(tmp_path / "sal" / "g.png"),
        scores=np.array([0.2, 0.9]), labels=np.array([0, 1]), log=lambda *_: None)
    assert os.path.exists(path) and os.path.getsize(path) > 0
