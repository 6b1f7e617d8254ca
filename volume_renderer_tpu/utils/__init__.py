"""Utilities: benchmarking stopwatch, checkpointing, profiling."""

from volume_renderer_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from volume_renderer_tpu.utils.profiling import PhaseTimer, trace
from volume_renderer_tpu.utils.stopwatch import Stopwatch

__all__ = ["Stopwatch", "save_checkpoint", "load_checkpoint", "PhaseTimer", "trace"]
