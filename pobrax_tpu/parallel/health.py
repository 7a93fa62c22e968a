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

import sys
import threading
import time
from typing import Callable, Optional

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
    """Host-side heartbeat with a deadline.

    Two ways to consume it:

      * serial — `beat()` each epoch and `check()` from any point in the
        loop; `check()` raises once the gap exceeds the deadline.
      * monitored — `start_monitor()` spawns a daemon thread that polls the
        heartbeat. If the training loop hangs INSIDE a device call (where
        no serial check can run — e.g. a collective blocked on a dead peer,
        see `ping`), the monitor fires `on_stall` and latches
        `self.stalled`, so the stall is loud on stderr immediately and every
        later `beat()`/`check()` raises instead of resuming silently.

    This is the failure-detection half wired into ppo/ppo_rnn/sac
    `train(...)`; the recovery half is checkpoint-restart
    (training/checkpoint.py + tests/test_resume.py).
    """

    def __init__(self, deadline_s: float = 300.0,
                 on_stall: Optional[Callable[[float], None]] = None):
        self.deadline_s = deadline_s
        self.stalled = False
        self._last = time.monotonic()
        self._on_stall = on_stall or self._default_on_stall
        self._monitor: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def _default_on_stall(self, elapsed: float) -> None:
        print(
            f"[pobrax_tpu.health] CRITICAL: training heartbeat stalled for "
            f"{elapsed:.0f}s (> {self.deadline_s:.0f}s deadline) on process "
            f"{jax.process_index()} — a device call is likely hung (dead "
            f"peer / driver wedge). Latest checkpoint remains restartable.",
            file=sys.stderr, flush=True)

    def beat(self) -> None:
        # a monitor-latched stall is permanent: the loop must fail loudly,
        # not silently resume after an hour-long device hang
        if self.stalled:
            raise TimeoutError(
                f"training heartbeat stalled for {self.elapsed():.0f}s "
                f"(> {self.deadline_s:.0f}s deadline); watchdog latched")
        self._last = time.monotonic()

    def elapsed(self) -> float:
        return time.monotonic() - self._last

    def check(self) -> None:
        if self.stalled or self.elapsed() > self.deadline_s:
            raise TimeoutError(
                f"training heartbeat stalled for {self.elapsed():.0f}s "
                f"(> {self.deadline_s:.0f}s deadline)")

    def start_monitor(self, poll_s: Optional[float] = None) -> "Watchdog":
        """Start the daemon poll thread (idempotent). Returns self."""
        if self._monitor is None or not self._monitor.is_alive():
            self._stop.clear()

            def run():
                interval = poll_s or max(0.01, self.deadline_s / 4.0)
                while not self._stop.wait(interval):
                    if not self.stalled and self.elapsed() > self.deadline_s:
                        self.stalled = True
                        self._on_stall(self.elapsed())

            self._monitor = threading.Thread(
                target=run, name="pobrax-watchdog", daemon=True)
            self._monitor.start()
        return self

    def stop_monitor(self) -> None:
        self._stop.set()
        if self._monitor is not None:
            self._monitor.join(timeout=5.0)
            self._monitor = None
