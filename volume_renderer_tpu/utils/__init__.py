"""Utilities: benchmarking stopwatch, profiling helpers."""

from volume_renderer_tpu.utils.stopwatch import Stopwatch

__all__ = ["Stopwatch"]
