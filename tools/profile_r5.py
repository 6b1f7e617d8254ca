#!/usr/bin/env python
"""Round-5 cost breakdown on the chip: forward vs replay vs scatter.

Times the three kernel modes separately at the bench configs so the
scatter-restructure work targets the measured split, not the estimate.
Writes one JSON line per row to stdout.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def timed(fn, reps=2):
    out = np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(fn())
    del out
    return (time.perf_counter() - t0) / reps


def main():
    _cache()
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_scene
    from volume_renderer_tpu.ops import pallas_march as pm

    for vol, img in ((256, 512), (512, 1024)):
        scene = _flagship_scene(vol=vol, lighting=False)
        opts = scene.options(img, img)
        axis, asc = pm.choose_sweep_axis(scene)
        cx = jnp.float32(0.0)
        img_out = pm._render_tiled(scene, opts, cx, axis, asc, 64, False)[0]
        g = jnp.ones_like(img_out)

        t_fwd = timed(lambda: pm._render_tiled(
            scene, opts, cx, axis, asc, 64, False)[0])
        t_rep = timed(lambda: pm._replay_grads_tiled(
            scene, opts, cx, axis, asc, 64, False, g, img_out)[0])
        t_sca = timed(lambda: pm._voxel_grads_tiled(
            scene, opts, cx, axis, asc, 64, False, g, img_out)[0],
            reps=1 if vol == 512 else 2)
        rays = img * img
        print(json.dumps({
            "config": f"{vol}^3/{img}^2",
            "fwd_s": round(t_fwd, 4), "fwd_rays_s": round(rays / t_fwd),
            "replay_s": round(t_rep, 4),
            "scatter_s": round(t_sca, 4),
            "scatter_only_s": round(t_sca - t_rep, 4),
            "replay_over_fwd": round(t_rep / t_fwd, 2),
            "scatter_over_fwd": round(t_sca / t_fwd, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
