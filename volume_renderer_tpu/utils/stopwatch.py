"""Named-slot accumulating stopwatch.

Equivalent of the reference's MATLAB Stopwatch benchmarking utility
(reference src/matlab/Stopwatch/Stopwatch.m:1-198): named timer slots with
tic/toc accumulation and a formatted console report. Used by the bench
harness; times on-device work correctly by block_until_ready-ing any jax
arrays passed to ``stop``.
"""

from __future__ import annotations

import time
from typing import Dict, Optional


class Stopwatch:
    def __init__(self, title: str = "timings"):
        self.title = title
        self._labels: Dict[str, str] = {}
        self._elapsed: Dict[str, float] = {}
        self._started: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    def add(self, key: str, label: str) -> None:
        self._labels[key] = label
        self._elapsed.setdefault(key, 0.0)
        self._counts.setdefault(key, 0)

    def start(self, key: str) -> None:
        if key not in self._labels:
            self.add(key, key)
        self._started[key] = time.perf_counter()

    def stop(self, key: str, sync=None) -> float:
        """Stop a slot; pass a jax array as ``sync`` to wait for the device."""
        if sync is not None:
            try:
                import jax

                jax.block_until_ready(sync)
            except Exception:
                pass
        dt = time.perf_counter() - self._started.pop(key)
        self._elapsed[key] += dt
        self._counts[key] += 1
        return dt

    def elapsed(self, key: str) -> float:
        return self._elapsed.get(key, 0.0)

    def count(self, key: str) -> int:
        return self._counts.get(key, 0)

    def report(self) -> str:
        lines = [f"== {self.title} =="]
        for key, label in self._labels.items():
            n = self._counts.get(key, 0)
            total = self._elapsed.get(key, 0.0)
            mean = total / n if n else 0.0
            lines.append(f"  [{key}] {label}: total {total * 1e3:.2f} ms over {n} runs "
                         f"(mean {mean * 1e3:.2f} ms)")
        return "\n".join(lines)

    def print(self) -> None:
        print(self.report())
