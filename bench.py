#!/usr/bin/env python
"""Benchmark harness: rays/s of the production forward march on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline = the pure-JAX oracle (the faithful reimplementation of the
reference CUDA renderer's semantics — the reference itself publishes no
numbers, see BASELINE.md), measured on the same scene at a reduced image
size (rays/s is per-ray throughput, so the comparison is like-for-like;
the oracle's compile time is minutes, so its image is kept small).

NB: timings fetch results to the host (np.asarray). On this platform
jax.block_until_ready can return before execution finishes, which makes
non-fetching timings meaningless (and silently hides device faults).

Env knobs:
  VRT_BENCH_VOL         voxel cube edge (default 128)
  VRT_BENCH_IMG         image edge (default 256)
  VRT_BENCH_ORACLE_IMG  oracle image edge (default 32; 0 disables baseline)
  VRT_BENCH_LIGHTING    1 to enable HG lighting (default 0)
  VRT_BENCH_REPS        timed repetitions (default 3)
"""

import json
import os
import sys
import time

import numpy as np


def _timed(render, reps):
    """Mean seconds per render, forcing a host fetch each repetition."""
    np.asarray(render())  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(render())
    dt = (time.perf_counter() - t0) / reps
    if not np.isfinite(out).all():
        raise RuntimeError("render produced non-finite values")
    return dt


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _flagship_scene
    from volume_renderer_tpu.ops.forward import render_forward
    from volume_renderer_tpu.ops.oracle import render_oracle

    vol = int(os.environ.get("VRT_BENCH_VOL", "128"))
    img = int(os.environ.get("VRT_BENCH_IMG", "256"))
    oracle_img = int(os.environ.get("VRT_BENCH_ORACLE_IMG", "32"))
    lighting = os.environ.get("VRT_BENCH_LIGHTING", "0") == "1"
    reps = int(os.environ.get("VRT_BENCH_REPS", "3"))

    scene = _flagship_scene(vol=vol, lighting=lighting)
    opts = scene.options(img, img)

    dt = _timed(lambda: render_forward(scene, opts), reps)
    rays_per_s = img * img / dt

    vs_baseline = None
    if oracle_img > 0:
        o_opts = scene.options(oracle_img, oracle_img)
        o_dt = _timed(lambda: render_oracle(scene, o_opts), 1)
        oracle_rays_per_s = oracle_img * oracle_img / o_dt
        vs_baseline = rays_per_s / oracle_rays_per_s

    print(json.dumps({
        "metric": f"forward rays/s ({vol}^3 voxels, {img}^2 image, "
                  f"lighting={'on' if lighting else 'off'})",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
