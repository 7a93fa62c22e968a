"""Structured metrics writing: stdout / JSONL / optional TensorBoard.

The reference's observability is two-tier (SURVEY.md §5): in-pytree
State.metrics + host-side aggregation (EvalGymWrapper.get_stats). This module
is the host half for training loops: write scalar dicts per step to JSONL
(always), stdout (optional), and TensorBoard if the writer is available.
Cross-host: `reduce_metrics` means scalars over processes with
`process_allgather` so only process 0 needs to write.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np


def reduce_metrics(metrics: Dict[str, float]) -> Dict[str, float]:
    """Mean each scalar across processes (no-op single-process)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(local)
    mean = np.asarray(gathered).mean(axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}


class MetricsWriter:
    def __init__(self, log_dir: str, stdout: bool = True,
                 tensorboard: bool = False):
        self.log_dir = log_dir
        self.stdout = stdout
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except ImportError:
                pass
        self._t0 = time.time()

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        if jax.process_count() > 1 and jax.process_index() != 0:
            return
        row = {"step": int(step), "time": round(time.time() - self._t0, 3),
               **{k: float(v) for k, v in metrics.items()}}
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        if self.stdout:
            body = "  ".join(f"{k}={v:.4g}" for k, v in metrics.items())
            print(f"[{row['time']:9.1f}s] step {step:>10,}  {body}")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
