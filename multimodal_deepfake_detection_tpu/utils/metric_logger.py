"""Structured JSONL metric logging (SURVEY.md §5 observability).

The reference logs with ``print`` + tqdm (wandb only in dead variants). Every
train CLI here can additionally stream one JSON object per epoch to a
``.jsonl`` file — machine-readable history for dashboards/sweeps, with the
same scalars the console shows.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional


class JsonlLogger:
    def __init__(self, path: str, *, run_name: Optional[str] = None, config=None):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "a")
        header = {"event": "run_start", "time": time.time(), "run": run_name}
        if config is not None:
            if dataclasses.is_dataclass(config):
                config = dataclasses.asdict(config)
            header["config"] = config
        self._write(header)

    @staticmethod
    def _sanitize(obj):
        # NaN/Inf are invalid strict JSON — serialize as null
        if isinstance(obj, dict):
            return {k: JsonlLogger._sanitize(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [JsonlLogger._sanitize(v) for v in obj]
        if isinstance(obj, float) and (obj != obj or obj in (float("inf"), float("-inf"))):
            return None
        return obj

    def _write(self, obj):
        self._f.write(json.dumps(self._sanitize(obj), default=str, allow_nan=False) + "\n")
        self._f.flush()

    def log_epoch(self, result) -> None:
        """Accepts a train.loop.EpochResult."""
        obj = {
            "event": "epoch",
            "time": time.time(),
            "epoch": result.epoch,
            "train_loss": result.train_loss,
            "train_metrics": result.train_metrics,
            "eval_loss": result.eval_loss,
            "eval_metrics": result.eval_metrics,
            "lr": result.lr,
            "seconds": result.seconds,
        }
        self._write(obj)

    def log(self, **scalars) -> None:
        self._write({"event": "scalar", "time": time.time(), **scalars})

    def close(self):
        self._f.close()
