"""Multi-host health: collective ping + host-side training watchdog.

The reference has no failure-detection story (SURVEY.md §5); this is the
framework's. Two honest mechanisms (no elastic resize — matching the
reference's capability level):

  * `ping(...)`: an all-reduce across every device/process, blocked to
    completion — if any host is dead the call hangs, so running it under
    the Watchdog's deadline converts silent hangs into loud failures.
  * `Watchdog`: a monotonic-deadline heartbeat for the training loop; call
    `beat()` every epoch, and `check()` raises if the gap exceeded the
    deadline (e.g. from a checkpoint/metrics thread).

Restartability is checkpoint-based: crashed runs resume from the latest
orbax checkpoint (training/checkpoint.py::latest_step_dir).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp


def ping() -> int:
    """Cross-process all-gather of each host's device count; returns the
    global device count. This is a REAL collective (process_allgather), so
    it blocks until every process participates — a dead host turns into a
    hang, which the Watchdog's deadline converts into a loud failure.
    Single-process: returns the local device count immediately."""
    local = jnp.asarray([jax.local_device_count()], jnp.int32)
    if jax.process_count() == 1:
        return int(local[0])
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(local)
    return int(jax.device_get(gathered).sum())


class Watchdog:
    """Host-side heartbeat with a deadline."""

    def __init__(self, deadline_s: float = 300.0):
        self.deadline_s = deadline_s
        self._last = time.monotonic()

    def beat(self) -> None:
        self._last = time.monotonic()

    def elapsed(self) -> float:
        return time.monotonic() - self._last

    def check(self) -> None:
        if self.elapsed() > self.deadline_s:
            raise TimeoutError(
                f"training heartbeat stalled for {self.elapsed():.0f}s "
                f"(> {self.deadline_s:.0f}s deadline)")
