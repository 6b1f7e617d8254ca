#!/usr/bin/env python
"""Round-5 on-chip check: correctness + speed of the reworked kernel.

Usage: python tools/chip_check_r5.py [vol] [img] [mode]
  mode: fwd | bwd | both (default both)

Compares the Pallas forward against ops/forward.render_forward and the
scatter backward against the replay VJP on small configs, then times
the bench configs. Exits nonzero on mismatch.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_scene
    from volume_renderer_tpu.ops.forward import render_forward
    from volume_renderer_tpu.ops.pallas_march import (
        last_fallback_reason,
        render_forward_fast,
        voxel_grads_fast,
    )
    from volume_renderer_tpu.ops.vjp import merge_scene, render_fused, split_scene

    vol = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    mode = sys.argv[3] if len(sys.argv) > 3 else "both"
    lighting = len(sys.argv) > 4 and sys.argv[4] == "lit"

    scene = _flagship_scene(vol=vol, lighting=lighting)
    if lighting:
        # break the smooth shell's normal==view alignment: the shading
        # chain's angle derivatives are rounding-dominated there (both
        # the kernel and the replay explode differently; see
        # _vangle_bwd), so the comparison is only meaningful on a
        # generic volume
        import jax.numpy as _jnp

        em = np.asarray(scene.emission.data)
        em = em + 0.05 * np.random.default_rng(1).random(
            em.shape).astype(np.float32)
        emj = _jnp.asarray(em)
        scene = scene.replace(
            emission=scene.emission.replace(data=emj),
            absorption=scene.absorption.replace(data=emj),
            reflection=scene.reflection.replace(data=emj))
    opts = scene.options(img, img)

    if mode in ("fwd", "both"):
        t0 = time.monotonic()
        got = np.asarray(render_forward_fast(scene, opts))
        print(f"fwd compile+run {time.monotonic() - t0:.1f}s "
              f"fallback={last_fallback_reason()}", flush=True)
        ref = np.asarray(render_forward(scene, opts))
        ok = np.allclose(got, ref, atol=3e-5, rtol=3e-4)
        print(f"fwd allclose={ok} maxdiff={np.abs(got - ref).max():.2e}",
              flush=True)
        if not ok:
            sys.exit(1)
        t0 = time.monotonic()
        for _ in range(3):
            # on-device-reduction barrier: a full image fetch would
            # measure the ~25 MB/s dev tunnel, not the render
            np.asarray(jnp.sum(render_forward_fast(scene, opts)))
        dt = (time.monotonic() - t0) / 3
        print(f"fwd {vol}^3/{img}^2: {dt:.3f}s = {img*img/dt:,.0f} rays/s",
              flush=True)

    if mode in ("bwd", "both"):
        g = np.random.default_rng(0).standard_normal(
            (img, img, 3)).astype(np.float32)
        t0 = time.monotonic()
        img_k, grads = voxel_grads_fast(scene, opts, jnp.asarray(g))
        em = np.asarray(grads["emission"])
        print(f"bwd compile+run {time.monotonic() - t0:.1f}s "
              f"fallback={last_fallback_reason()}", flush=True)

        diff, template = split_scene(scene)

        def fwd(d):
            return render_fused(merge_scene(template, d), opts, 0.0)

        _, vjp_fn = jax.vjp(fwd, diff)
        ref_grads = vjp_fn(jnp.asarray(g))[0]
        for k in ("emission", "absorption", "reflection",
                  "factor_emission", "factor_absorption",
                  "factor_reflection", "color", "light_colors"):
            if k not in grads or k not in ref_grads:
                continue
            a = np.asarray(grads[k])
            b = np.asarray(ref_grads[k])
            scale = max(np.abs(b).max(), 1e-6)
            l2 = (np.linalg.norm(a - b)
                  / max(np.linalg.norm(b), 1e-9))
            md = np.abs(a - b).max() / scale
            print(f"bwd {k}: relL2={l2:.2e} rel maxdiff={md:.2e}",
                  flush=True)
            # Lit grids carry the shading chain's conditioning-dominated
            # deviation vs the replay (kernel floors the angle-gradient
            # amplification; measured 1.49e-2 on CPU interpret == 1.50e-2
            # on chip at 64^3 — backend-consistent, replay-divergent by
            # design; docs/pallas_backward_design.md).
            bar = 2.5e-2 if (lighting and k in (
                "emission", "absorption", "reflection")) else 2e-3
            if l2 > bar:
                print(f"MISMATCH {k}")
                sys.exit(1)

        gdev = jnp.asarray(g)

        def step():
            im = render_forward_fast(scene, opts)
            _, gr = voxel_grads_fast(scene, opts, gdev, image=im)
            return np.asarray(jnp.sum(gr["emission"]))

        step()
        t0 = time.monotonic()
        reps = 2
        for _ in range(reps):
            step()
        dt = (time.monotonic() - t0) / reps
        print(f"fwd+bwd {vol}^3/{img}^2: {dt:.3f}s = "
              f"{img*img/dt:,.0f} rays/s", flush=True)

    print("OK")


if __name__ == "__main__":
    main()
