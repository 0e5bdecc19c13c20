"""Utilities: plotting, profiling, metric logging."""

from ast_tpu.utils.logging import MetricLogger
from ast_tpu.utils.plotting import plot_cqt, plot_stft
from ast_tpu.utils.profiling import StepTimer, capture_trace, trace

__all__ = ["MetricLogger", "plot_cqt", "plot_stft", "StepTimer",
           "capture_trace", "trace"]
