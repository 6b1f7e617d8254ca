"""Pure-JAX reference renderer ("the oracle").

Stands in for the reference CUDA renderer as the correctness anchor:
one ray per pixel, a genuine data-dependent ``lax.while_loop`` march with
the exact break structure of ``d_render`` (reference
src/C/vr/volumeRender_kernel.cu:365-507):

    while (true) { composite;
                   if (sum.w > opacity_threshold) break;
                   t += tstep; if (t > tfar) break;
                   pos += step; }

i.e. at least one step always executes on a hit, positions advance by
repeated accumulation (pos += step), and the threshold-crossing step's
contribution IS included. Output is an (H, W, 3) image where pixel (x, y)
lands at image[y, x] (the reference writes column-major k = x*H + y,
volumeRender_kernel.cu:496-506 — same pixel-to-ray mapping).

This renderer is deliberately simple and unfused — use
``volume_renderer_tpu.ops.forward.render_forward`` for speed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from volume_renderer_tpu.models.scene import RenderOptions, Scene
from volume_renderer_tpu.ops import raymarch_core as core
from volume_renderer_tpu.ops.float3 import F3
from volume_renderer_tpu.ops.geometry import generate_rays, intersect_box


@partial(jax.jit, static_argnames=("opts",))
def render_oracle(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset=0.0,
) -> jnp.ndarray:
    """Render with the per-pixel while-loop oracle. Returns (H, W, 3)."""
    consts = core.make_consts(scene, opts)
    x_vec, y_vec, z_vec = scene.camera.basis()
    focal = jnp.float32(scene.camera.focal_length)
    dist = jnp.float32(scene.camera.distance_to_object)
    cam_off = jnp.float32(camera_x_offset)

    def pixel(px, py):
        origin, direction = generate_rays(
            opts.width, opts.height, x_vec, y_vec, z_vec, cam_off, focal, dist, px, py
        )
        hit, tnear, tfar = intersect_box(origin, direction, consts.boxmin, consts.boxmax)
        tnear = jnp.maximum(tnear, 0.0)
        # sanitize for the non-hit lane so position math stays finite
        tnear = jnp.where(hit, tnear, 0.0)
        tfar = jnp.where(hit, tfar, -1.0)

        step = direction * consts.tstep
        pos0 = origin + direction * tnear

        def cond(state):
            _, _, _, _, _, running = state
            return running

        def body(state):
            sum_rgb, sum_w, t, pos, _, _ = state
            shaded_rgb, alpha = core.march_step(scene, consts, pos, origin)
            sum_rgb, sum_w = core.composite_under(sum_rgb, sum_w, shaded_rgb, alpha)
            t_next = t + consts.tstep
            running = (sum_w <= consts.opacity_threshold) & (t_next <= tfar)
            return (sum_rgb, sum_w, t_next, pos + step, t, running)

        zero = jnp.float32(0.0)
        init = (F3(zero, zero, zero), zero, tnear, pos0, tnear, hit)
        sum_rgb, sum_w, _, _, _, _ = jax.lax.while_loop(cond, body, init)
        return jnp.stack([sum_rgb.x, sum_rgb.y, sum_rgb.z])

    xs = jnp.arange(opts.width, dtype=jnp.int32)
    ys = jnp.arange(opts.height, dtype=jnp.int32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")  # (H, W)
    rgb = jax.vmap(jax.vmap(pixel))(px, py)  # (H, W, 3)
    return rgb
