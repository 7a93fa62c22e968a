"""Aux subsystem tests: metrics writer, health watchdog, checkpoint dirs."""

import json
import os
import time

import jax
import pytest

from pobrax_tpu.parallel.health import Watchdog, ping
from pobrax_tpu.utils.metrics_writer import MetricsWriter, reduce_metrics


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path), stdout=False)
    w.write(10, {"a": 1.0, "b": 2.5})
    w.write(20, {"a": 3.0, "b": 4.5})
    w.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [r["step"] for r in rows] == [10, 20]
    assert rows[1]["b"] == 4.5
    assert all("time" in r for r in rows)


def test_reduce_metrics_single_process_identity():
    out = reduce_metrics({"x": 2.0, "y": -1.0})
    assert out == {"x": 2.0, "y": -1.0}


def test_watchdog_deadline():
    wd = Watchdog(deadline_s=0.01)
    time.sleep(0.03)
    with pytest.raises(TimeoutError):
        wd.check()
    wd.beat()
    wd.check()  # fresh beat passes


def test_ping_counts_devices():
    assert ping() == jax.device_count()


def test_watchdog_monitor_latches_stall():
    """The daemon monitor converts a silent hang into a loud latched stall:
    once the deadline passes with no beat, `stalled` flips and every later
    beat()/check() raises (no silent resume)."""
    fired = []
    wd = Watchdog(deadline_s=0.05, on_stall=lambda el: fired.append(el))
    wd.start_monitor(poll_s=0.01)
    try:
        deadline = time.monotonic() + 5.0
        while not wd.stalled and time.monotonic() < deadline:
            time.sleep(0.01)
        assert wd.stalled and fired, "monitor never latched the stall"
        with pytest.raises(TimeoutError):
            wd.beat()
        with pytest.raises(TimeoutError):
            wd.check()
    finally:
        wd.stop_monitor()


def test_train_raises_on_stalled_epoch():
    """ppo.train wires the watchdog: an epoch slower than the deadline
    (here: any epoch at all vs a ~0 deadline) raises instead of silently
    continuing — 'a stalled epoch raises' (failure-detection wiring)."""
    from pobrax_tpu.envs import create
    from pobrax_tpu.training import ppo

    env = create("ant", auto_reset=False, episode_length=None,
                 action_repeat=None)
    with pytest.raises(TimeoutError):
        ppo.train(
            env, num_timesteps=2048, num_envs=16, unroll_length=4,
            num_minibatches=1, num_update_epochs=1, episode_length=64,
            watchdog_deadline_s=1e-4)


def test_checkpoint_step_dirs(tmp_path):
    from pobrax_tpu.training import checkpoint

    assert checkpoint.latest_step_dir(str(tmp_path)) is None
    p1 = checkpoint.save_step(str(tmp_path), 100, {"w": jax.numpy.ones(3)})
    p2 = checkpoint.save_step(str(tmp_path), 2000, {"w": jax.numpy.zeros(3)})
    assert checkpoint.latest_step_dir(str(tmp_path)) == p2
    restored = checkpoint.restore(p1)
    assert float(restored["w"][0]) == 1.0
