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


def test_checkpoint_step_dirs(tmp_path):
    from pobrax_tpu.training import checkpoint

    assert checkpoint.latest_step_dir(str(tmp_path)) is None
    p1 = checkpoint.save_step(str(tmp_path), 100, {"w": jax.numpy.ones(3)})
    p2 = checkpoint.save_step(str(tmp_path), 2000, {"w": jax.numpy.zeros(3)})
    assert checkpoint.latest_step_dir(str(tmp_path)) == p2
    restored = checkpoint.restore(p1)
    assert float(restored["w"][0]) == 1.0
