"""Utilities: plotting, profiling."""

from ast_tpu.utils.plotting import plot_cqt, plot_stft

__all__ = ["plot_cqt", "plot_stft"]
