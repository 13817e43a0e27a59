"""Run observability: JSONL metric stream + config/env dump into work_dir.

Capability parity with the reference's logging stack (TextLoggerHook +
TensorboardLoggerHook in _base_/default_runtime.py; env/config dump at
tools/train.py:174-204): every run writes

  work_dir/metrics.jsonl   one JSON object per logged event
  work_dir/config.json     the full (dataclass) config
  work_dir/env.json        jax/device/python environment snapshot

TensorBoard event files are written too when a SummaryWriter implementation
is importable (torch.utils.tensorboard); absent that, the JSONL stream is
the canonical record (plotting-friendly and dependency-free).
"""
from __future__ import annotations

import dataclasses
import json
import os
import platform
import sys
import time
from typing import Any, Dict, Optional


def _jsonable(x: Any):
    if dataclasses.is_dataclass(x) and not isinstance(x, type):
        return {k: _jsonable(v) for k, v in dataclasses.asdict(x).items()}
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (str, int, float, bool)) or x is None:
        return x
    return repr(x)


def dump_run_metadata(work_dir: str, cfg) -> None:
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "config.json"), "w") as f:
        json.dump(_jsonable(cfg), f, indent=2)
    env: Dict[str, Any] = {
        "python": sys.version,
        "platform": platform.platform(),
        "argv": sys.argv,
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    try:
        import jax
        env["jax_version"] = jax.__version__
        env["backend"] = jax.default_backend()
        env["device_count"] = jax.device_count()
        env["process_count"] = jax.process_count()
        env["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:  # pragma: no cover - defensive
        env["jax_error"] = repr(e)
    with open(os.path.join(work_dir, "env.json"), "w") as f:
        json.dump(env, f, indent=2)


class MetricsLogger:
    """Append-only JSONL metric stream (+ optional TensorBoard mirror)."""

    def __init__(self, work_dir: str, tensorboard: bool = True):
        os.makedirs(work_dir, exist_ok=True)
        self._path = os.path.join(work_dir, "metrics.jsonl")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(
                    log_dir=os.path.join(work_dir, "tf_logs"))
            except Exception:
                self._tb = None

    def log(self, kind: str, *, epoch: Optional[int] = None,
            iter: Optional[int] = None, **scalars) -> None:
        rec: Dict[str, Any] = {"kind": kind, "wall_time": time.time()}
        if epoch is not None:
            rec["epoch"] = epoch
        if iter is not None:
            rec["iter"] = iter
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = _jsonable(v)
        with open(self._path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            step = (epoch or 0) * 1_000_000 + (iter or 0)
            for k, v in rec.items():
                if k in ("kind", "wall_time", "epoch", "iter"):
                    continue
                if isinstance(v, float):
                    self._tb.add_scalar(f"{kind}/{k}", v, step)
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
