"""CPU-mesh scaling rehearsal: sharding-machinery overhead probe.

Real multi-chip hardware is not available in this environment, so true
scaling efficiency (BASELINE.md: >=80% at 1 chip -> 1 host -> N hosts)
cannot be measured here. What CAN be measured — and what this probe
records — is the *overhead of the sharding machinery itself*: the same
render executed as 1 shard vs 8 shards on an 8-virtual-device CPU mesh
(``--xla_force_host_platform_device_count=8``). Both runs use the same
physical host cores, so the ideal throughput ratio is 1.0; every percent
below 1.0 is cost added by shard_map partitioning, halo/psum collectives
and per-shard dispatch. On real hardware each shard would own its own
chip, so (1 - overhead) bounds the achievable per-chip efficiency of the
rays-DP path from above.

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


def _measure(vol: int = 64, img: int = 128, reps: int = 3):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _flagship_scene
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

    def timed(mesh):
        def render():
            return np.asarray(
                render_forward_sharded(scene, opts, mesh=mesh))

        render()  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            render()
        return (time.perf_counter() - t0) / reps

    t1 = timed(make_mesh(1))
    t8 = timed(make_mesh(8))
    ratio = t1 / t8  # throughput_8 / throughput_1; ideal = 1.0 (shared host)
    return {
        "probe": "cpu-mesh rays-DP 1-vs-8 shards (shared host cores)",
        "config": f"{vol}^3/{img}^2, lighting off",
        "t1_s": round(t1, 4),
        "t8_s": round(t8, 4),
        "ratio": round(ratio, 3),
        "efficiency": round(min(ratio, 1.0), 3),
    }


def main():
    rec = _measure()
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.exit(main())
