"""Profiling harness: device traces + phase-level timing breakdowns.

The reference's only instrumentation is the MATLAB Stopwatch plus
``-DDEBUG`` printf tracing (SURVEY.md §5). Here:

- ``trace(logdir)`` wraps a block in ``jax.profiler`` tracing; the dump
  is viewable in TensorBoard/XProf and attributes time to individual XLA
  ops and Pallas kernels.
- ``phase_timer()`` gives wall-clock phase breakdowns with correct
  device-sync semantics: every ``stop`` fetches its result to the host
  (on this platform ``block_until_ready`` may return early — fetching is
  the only reliable barrier; see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a block into ``logdir`` (TensorBoard/XProf trace format)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Named wall-clock phases with host-fetch synchronization."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, result_holder: Optional[list] = None):
        """Time a block; if the block appends device arrays to
        ``result_holder``, they are fetched before the clock stops."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result_holder:
                for r in result_holder:
                    np.asarray(r)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def timed(self, name: str, fn, *args, **kwargs) -> Any:
        """Run ``fn``, fetch its (array) result, account it under ``name``."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        fetched = np.asarray(out)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return fetched

    def report(self) -> str:
        lines = ["phase breakdown:"]
        total = sum(self.totals.values())
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            share = 100.0 * t / total if total else 0.0
            lines.append(
                f"  {name}: {t * 1e3:.1f} ms over {n} call(s) "
                f"({t / n * 1e3:.1f} ms each, {share:.0f}%)")
        lines.append(f"  total: {total * 1e3:.1f} ms")
        return "\n".join(lines)
