"""Utility layer: profiling, throughput metering, debug helpers."""

from pobrax_tpu.utils import profiling
from pobrax_tpu.utils.profiling import ThroughputMeter, time_fn, trace

__all__ = ["profiling", "ThroughputMeter", "time_fn", "trace"]
