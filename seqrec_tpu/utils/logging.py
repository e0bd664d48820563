"""Structured metrics logging (aux, SURVEY.md §5.5).

Host-0 JSONL to stdout + `metrics.jsonl` in the out dir; covers the
reference's `tf.summary` + print role. TensorBoard scalar export is optional
(enabled when tensorboard's writer is importable).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax


class MetricsLogger:
    def __init__(self, out_dir: Optional[str] = None, tensorboard: bool = False):
        self._is_host0 = jax.process_index() == 0
        self._file = None
        self._tb = None
        if self._is_host0 and out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._file = open(os.path.join(out_dir, "metrics.jsonl"), "a")
            if tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
                except ImportError:
                    self._tb = None

    def log(self, step: int, tag: str, metrics: Dict[str, Any]) -> None:
        if not self._is_host0:
            return
        rec = {"step": int(step), "tag": tag, "time": time.time()}
        rec.update({k: _to_py(v) for k, v in metrics.items()})
        line = json.dumps(rec)
        print(line, flush=True)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._tb:
            for k, v in metrics.items():
                v = _to_py(v)
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"{tag}/{k}", v, step)

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()


def _to_py(v: Any) -> Any:
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


class Heartbeat:
    """Per-host heartbeat file (failure detection, SURVEY.md §5.3)."""

    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self._path = os.path.join(out_dir, f"heartbeat_{jax.process_index()}")

    def beat(self, step: int) -> None:
        with open(self._path, "w") as f:
            f.write(f"{step} {time.time()}\n")
