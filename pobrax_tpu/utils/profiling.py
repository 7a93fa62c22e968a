"""Profiling + throughput metering.

The reference's only perf tooling is a list-of-timestamps harness around
jitted steps (ant_heavenhell.py:199-205, autoreset nb cell 4). This module
is the framework-grade version: a steps/s meter that separates compile time
from steady-state, `jax.profiler` trace capture, and `named_scope` helpers
for phase attribution in traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax


@dataclass
class Timing:
    compile_s: float
    mean_step_s: float
    steps_per_s: float
    samples: List[float] = field(default_factory=list)


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2,
            block_on=None) -> Timing:
    """Time a jitted callable: first call = compile, then `iters` steady-state
    samples (each blocked to completion)."""
    def run(*a):
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0] if block_on is None else block_on(out)
        jax.block_until_ready(leaf)
        return out

    t0 = time.perf_counter()
    run(*args)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        run(*args)
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run(*args)
        samples.append(time.perf_counter() - t0)
    mean = sum(samples) / len(samples)
    return Timing(compile_s=compile_s, mean_step_s=mean,
                  steps_per_s=1.0 / mean, samples=samples)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around the with-block (view in
    TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def scope(name: str):
    """Named scope for phase attribution inside jitted code."""
    return jax.named_scope(name)


class ThroughputMeter:
    """Running env-steps/s across epochs; excludes the first (compile) call."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.steps = 0
        self.calls = 0

    def update(self, env_steps_this_call: int) -> Optional[float]:
        self.calls += 1
        if self.calls == 1:  # compile call — start the clock after it
            self.t0 = time.perf_counter()
            return None
        self.steps += env_steps_this_call
        return self.steps / (time.perf_counter() - self.t0)
