#!/usr/bin/env python
"""Benchmark harness: rays/s of the production forward march on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline = the pure-JAX oracle (the faithful reimplementation of the
reference CUDA renderer's semantics — the reference itself publishes no
numbers, see BASELINE.md), measured on the same scene. The oracle is timed
at a reduced image size (its per-ray cost is constant) to bound bench time;
rays/s is per-ray throughput so the comparison is like-for-like.

Env knobs:
  VRT_BENCH_VOL      voxel cube edge (default 512)
  VRT_BENCH_IMG      image edge (default 1024)
  VRT_BENCH_ORACLE_IMG  oracle image edge (default 128; 0 disables baseline)
  VRT_BENCH_LIGHTING 1 to enable HG lighting (default 0 — the north-star
                     fwd+bwd config is emission/absorption)
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _flagship_scene
    from volume_renderer_tpu.ops.forward import render_forward
    from volume_renderer_tpu.ops.oracle import render_oracle

    vol = int(os.environ.get("VRT_BENCH_VOL", "512"))
    img = int(os.environ.get("VRT_BENCH_IMG", "1024"))
    oracle_img = int(os.environ.get("VRT_BENCH_ORACLE_IMG", "128"))
    lighting = os.environ.get("VRT_BENCH_LIGHTING", "0") == "1"

    scene = _flagship_scene(vol=vol, lighting=lighting)
    opts = scene.options(img, img)

    # compile + warmup
    out = render_forward(scene, opts)
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = render_forward(scene, opts)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    rays_per_s = img * img / dt

    vs_baseline = None
    if oracle_img > 0:
        o_opts = scene.options(oracle_img, oracle_img)
        o = render_oracle(scene, o_opts)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        o = render_oracle(scene, o_opts)
        jax.block_until_ready(o)
        o_dt = time.perf_counter() - t0
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
