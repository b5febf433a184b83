"""Utilities: metrics logging, profiling."""

from fft_tpu.utils.metrics import MetricsLogger
from fft_tpu.utils.prof import profile_trace

__all__ = ["MetricsLogger", "profile_trace"]
