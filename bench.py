#!/usr/bin/env python
"""Benchmark harness: rays/s of the production render paths on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric: forward rays/s at 256^3 voxels / 512^2 image (lighting
off) through the production path (the tiled Pallas march). vs_baseline
compares the SAME-config per-ray rate against the round-2 recorded
production number (BENCH_r02: 6,270.4 rays/s at 128^3/256^2, scaled to
256^3 step count by the tstep ratio) — the honest longitudinal baseline,
since the reference repo publishes no numbers (BASELINE.md).

"extra" carries the secondary recordings VERDICT r2 asked for:
  r02_config_rays_s      forward at 128^3/256^2 (direct r02 comparison)
  big_forward_rays_s     forward at 512^3/1024^2 (north-star config)
  transfer_fwdbwd_rays_s fwd + transfer-parameter backward (Pallas) at
                         the primary config
  fwdbwd_rays_s          fused forward+backward incl. voxel gradients
  oracle_allclose        fast path allclose vs the CUDA-semantics oracle

Env knobs:
  VRT_BENCH_VOL / VRT_BENCH_IMG   primary config (default 256 / 512)
  VRT_BENCH_BIG=0                 skip the 512^3/1024^2 recording
  VRT_BENCH_FWDBWD=0              skip the fwd+bwd recording
  VRT_BENCH_REPS                  timed repetitions (default 3)
  VRT_BENCH_ORACLE_IMG            oracle check image edge (default 24;
                                  0 disables)

NB: timings fetch results to the host (np.asarray). On this platform
jax.block_until_ready can return before execution finishes, which makes
non-fetching timings meaningless (and silently hides device faults).
"""

import json
import os
import sys
import time

import numpy as np

# BENCH_r02.json: production forward, 128^3/256^2, lighting off.
R02_RAYS_S = 6270.4
R02_VOL = 128


def _timed(render, reps):
    """Mean seconds per call, forcing a host fetch each repetition."""
    out = np.asarray(render())  # warmup/compile
    if not np.isfinite(out).all():
        raise RuntimeError("render produced non-finite values")
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(render())
    dt = (time.perf_counter() - t0) / reps
    return dt


def _enable_compile_cache():
    """Persistent XLA compile cache: the march kernel compiles in minutes
    per shape config; warm runs then load in seconds."""
    try:
        import jax

        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    _enable_compile_cache()
    from __graft_entry__ import _flagship_scene
    from volume_renderer_tpu.ops.pallas_march import render_forward_fast

    vol = int(os.environ.get("VRT_BENCH_VOL", "256"))
    img = int(os.environ.get("VRT_BENCH_IMG", "512"))
    reps = int(os.environ.get("VRT_BENCH_REPS", "3"))
    oracle_img = int(os.environ.get("VRT_BENCH_ORACLE_IMG", "24"))
    do_big = os.environ.get("VRT_BENCH_BIG", "1") == "1"
    do_fwdbwd = os.environ.get("VRT_BENCH_FWDBWD", "1") == "1"
    extra = {}

    # ---- primary: forward rays/s on the production fast path ----
    scene = _flagship_scene(vol=vol, lighting=False)
    opts = scene.options(img, img)
    dt = _timed(lambda: render_forward_fast(scene, opts), reps)
    rays_per_s = img * img / dt
    # r02 equivalent per-ray rate at this volume: steps/ray scale with the
    # march step count (tstep ~ 1/vol), so the honest same-work baseline
    # rescales r02's ray rate by vol ratio.
    baseline = R02_RAYS_S * (R02_VOL / vol)
    vs_baseline = rays_per_s / baseline

    # ---- r02's exact config, for the direct longitudinal comparison ----
    scene_r02 = _flagship_scene(vol=128, lighting=False)
    opts_r02 = scene_r02.options(256, 256)
    dt_r02 = _timed(lambda: render_forward_fast(scene_r02, opts_r02), reps)
    extra["r02_config_rays_s"] = round(256 * 256 / dt_r02, 1)
    extra["r02_config_speedup"] = round(256 * 256 / dt_r02 / R02_RAYS_S, 2)

    # ---- north-star forward: 512^3 / 1024^2 ----
    if do_big:
        scene_big = _flagship_scene(vol=512, lighting=False)
        opts_big = scene_big.options(1024, 1024)
        dt_big = _timed(lambda: render_forward_fast(scene_big, opts_big),
                        max(1, reps - 1))
        extra["big_forward_rays_s"] = round(1024 * 1024 / dt_big, 1)

    # ---- fwd + transfer-parameter backward (Pallas, no voxel grads) ----
    if do_fwdbwd:
        from volume_renderer_tpu.ops.pallas_march import transfer_grads_fast

        target = np.asarray(render_forward_fast(scene, opts))
        gcot = (2.0 * (target * 1.1 - target) / target.size).astype(np.float32)

        def run_tg():
            _, grads = transfer_grads_fast(scene, opts, gcot)
            return np.asarray(grads["factor_emission"])

        dt_tg = _timed(run_tg, max(1, reps - 1))
        extra["transfer_fwdbwd_rays_s"] = round(img * img / dt_tg, 1)

    # ---- fused forward+backward (pixel -> voxel/parameter gradients) ----
    # The Pallas backward kernel has not landed yet; until it does, the
    # recorded fwd+bwd number is the production custom-VJP replay path
    # (ops/vjp.render_fused) at 128^3/256^2, honestly labeled.
    if do_fwdbwd:
        import jax
        import jax.numpy as jnp

        from volume_renderer_tpu.ops.vjp import merge_scene, render_fused, split_scene

        fb_vol, fb_img = 128, 256
        scene_fb = _flagship_scene(vol=fb_vol, lighting=False)
        opts_fb = scene_fb.options(fb_img, fb_img)
        target = jnp.asarray(render_forward_fast(scene_fb, opts_fb))
        diff, template = split_scene(scene_fb)

        @jax.jit
        def grad_step(d):
            def loss(d_):
                img_ = render_fused(merge_scene(template, d_), opts_fb)
                return jnp.mean((img_ - target) ** 2)

            return jax.grad(loss)(d)

        def run_fb():
            return np.asarray(grad_step(diff)["emission"])

        dt_fb = _timed(run_fb, 1)
        extra["fwdbwd_rays_s"] = round(fb_img * fb_img / dt_fb, 1)
        extra["fwdbwd_config"] = f"{fb_vol}^3/{fb_img}^2, replay VJP path"

    # ---- correctness: fast path vs the CUDA-semantics oracle ----
    if oracle_img > 0:
        from volume_renderer_tpu.ops.oracle import render_oracle

        scene_s = _flagship_scene(vol=32, lighting=False)
        opts_s = scene_s.options(oracle_img, oracle_img)
        ref = np.asarray(render_oracle(scene_s, opts_s))
        got = np.asarray(render_forward_fast(scene_s, opts_s))
        extra["oracle_allclose"] = bool(
            np.allclose(got, ref, atol=3e-5, rtol=3e-4))

    print(json.dumps({
        "metric": f"forward rays/s ({vol}^3 voxels, {img}^2 image, "
                  f"lighting=off, pallas)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
