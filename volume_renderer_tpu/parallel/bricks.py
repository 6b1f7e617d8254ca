"""Voxel-brick sharding: the volume sliced along z across devices.

The reference's only answer to volumes larger than device memory is the
manual multi-pass channel split (SURVEY.md C21) guarded by a VRAM
pre-flight error (mm/mmanager.hxx:144-173). Here the voxel grid itself is
sharded: device b holds z-rows [b*D/B, (b+1)*D/B) of every volume (plus a
2-row halo exchanged with neighbors over ICI via ``ppermute``), marches
every ray's step-subsequence that falls inside its brick, and the
per-brick partial segments are composited in each ray's traversal order
after an ``all_gather`` — exact because the front-to-back "under" operator
is associative over (premultiplied color, opacity) segments.

This is the sequence/context-parallel analog for rendering (ray depth is
the sequence dimension, SURVEY.md §5 "long-context" row).

Semantics notes:
- Steps are partitioned by the OWNER rule owner(pos) = clip(floor(
  z_normalized * B), 0, B-1), computed identically on every device, so
  each global march step contributes on exactly one device.
- Early opacity termination (sum.w > threshold) is a sequential break and
  is NOT applied in bricked mode — segment compositing reproduces the
  un-terminated march exactly (allclose); with an active threshold the
  single-device render differs by the post-threshold tail it skips.
  A ring pipeline that forwards entry opacities brick-to-brick (exact
  early termination) is planned.
- Positions use the closed form pos0 + n*step (not the accumulated
  pos += step of the single-chip path): ulp-level drift, allclose.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from volume_renderer_tpu.models.scene import RenderOptions, Scene
from volume_renderer_tpu.ops import raymarch_core as core
from volume_renderer_tpu.ops.float3 import F3
from volume_renderer_tpu.ops.forward import _init_rays
from volume_renderer_tpu.ops.sampling import sample_trilinear, sample_trilinear_zslab

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

HALO = 2  # rows each side: trilinear needs +-1, OTF gradient taps +-2


def _check_divisible(scene: Scene, n: int) -> None:
    def chk(name, vol):
        if vol is not None and vol.data.shape[0] % n != 0:
            raise ValueError(
                f"{name} depth {vol.data.shape[0]} must be divisible by the "
                f"brick mesh size {n} (pad the volume)"
            )

    chk("emission", scene.emission)
    chk("absorption", scene.absorption)
    chk("reflection", scene.reflection)
    chk("gradient_x", scene.gradient_x)
    chk("gradient_y", scene.gradient_y)
    chk("gradient_z", scene.gradient_z)


def _brick_specs(scene: Scene, axis_name: str):
    """Pytree of PartitionSpecs: volume grids sharded on z, rest replicated."""
    specs = jax.tree.map(lambda _: P(), scene)
    vol_spec = P(axis_name, None, None)

    def vspec(volspec_holder):
        return volspec_holder.replace(data=vol_spec)

    kwargs = dict(emission=vspec(specs.emission))
    if scene.absorption is not None:
        kwargs["absorption"] = vspec(specs.absorption)
    if scene.reflection is not None:
        kwargs["reflection"] = vspec(specs.reflection)
    if scene.has_gradient_volumes:
        kwargs["gradient_x"] = vspec(specs.gradient_x)
        kwargs["gradient_y"] = vspec(specs.gradient_y)
        kwargs["gradient_z"] = vspec(specs.gradient_z)
    return specs.replace(**kwargs)


def _with_halo(local: jnp.ndarray, axis_name: str, n: int) -> jnp.ndarray:
    """Concat [prev brick's last HALO rows, local, next brick's first HALO].

    Edge devices receive zeros in the missing halo; global index clamping
    guarantees those rows are never sampled.
    """
    send_up = [(i, i + 1) for i in range(n - 1)]  # to higher brick index
    send_down = [(i + 1, i) for i in range(n - 1)]
    halo_lo = jax.lax.ppermute(local[-HALO:], axis_name, send_up)
    halo_hi = jax.lax.ppermute(local[:HALO], axis_name, send_down)
    return jnp.concatenate([halo_lo, local, halo_hi], axis=0)


def _brick_samplers(scene_local: Scene, axis_name: str, n: int, b) -> core.Samplers:
    """Samplers over halo-padded local bricks (global coords/clamp)."""

    def slab_sampler(local_data, full_d):
        padded = _with_halo(local_data, axis_name, n)
        bd = full_d // n
        z_offset = b * bd - HALO
        return lambda p: sample_trilinear_zslab(padded, p, z_offset, full_d)

    full_d_em = scene_local.emission.data.shape[0] * n
    em = slab_sampler(scene_local.emission.data, full_d_em)
    ab = em if scene_local.absorption_aliased else slab_sampler(
        scene_local.absorption.data, scene_local.absorption.data.shape[0] * n
    )
    re = gx = gy = gz = lut = None
    if scene_local.has_lighting:
        re = em if scene_local.reflection_aliased else slab_sampler(
            scene_local.reflection.data, scene_local.reflection.data.shape[0] * n
        )
        lut = lambda p: sample_trilinear(scene_local.illumination, p)  # noqa: E731
        if scene_local.has_gradient_volumes:
            gx = slab_sampler(scene_local.gradient_x.data,
                              scene_local.gradient_x.data.shape[0] * n)
            gy = slab_sampler(scene_local.gradient_y.data,
                              scene_local.gradient_y.data.shape[0] * n)
            gz = slab_sampler(scene_local.gradient_z.data,
                              scene_local.gradient_z.data.shape[0] * n)
    return core.Samplers(em=em, ab=ab, re=re, gx=gx, gy=gy, gz=gz, lut=lut)


@partial(jax.jit, static_argnames=("opts", "mesh", "axis_name", "ray_axis"))
def render_forward_bricked(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset=0.0,
    *,
    mesh: Mesh,
    axis_name: str = "bricks",
    ray_axis: str = None,
) -> jnp.ndarray:
    """Forward render with the volume z-sharded across ``mesh``.

    With a 1-D mesh, rays are replicated and the full (H, W, 3) image is
    returned replicated. With a 2-D mesh and ``ray_axis`` given, image
    rows are additionally data-parallel over that axis (each device
    marches its own band against its own brick; image sharded over rows).
    See the module docstring for the exactness contract (no opacity
    early-exit).
    """
    _check_divisible(scene, mesh.shape[axis_name])
    n = mesh.shape[axis_name]
    n_rows = opts.height
    if ray_axis is not None:
        if opts.height % mesh.shape[ray_axis] != 0:
            raise ValueError(
                f"image height {opts.height} must be divisible by the ray "
                f"axis size {mesh.shape[ray_axis]}"
            )
        n_rows = opts.height // mesh.shape[ray_axis]

    def shard_fn(scene_local: Scene, cam_off):
        b = jax.lax.axis_index(axis_name)
        y_offset = 0
        if ray_axis is not None:
            y_offset = jax.lax.axis_index(ray_axis) * n_rows
        samplers = _brick_samplers(scene_local, axis_name, n, b)
        consts, origin, pos0, step, tnear, tfar, hit = _init_rays(
            scene_local, opts, cam_off, y_offset=y_offset, n_rows=n_rows
        )
        params = core.params_of(scene_local, consts)

        inv_bz = consts.boxscale.z  # 1 / (boxmax.z - boxmin.z)

        def owner_of(pos_z):
            znorm = (pos_z - consts.boxmin.z) * inv_bz
            return jnp.clip(jnp.floor(znorm * n).astype(jnp.int32), 0, n - 1)

        # skip-ahead: first step index whose position can be in this brick
        z_lo = consts.boxmin.z + (consts.boxmax.z - consts.boxmin.z) * (
            b.astype(jnp.float32) / n
        )
        z_hi = consts.boxmin.z + (consts.boxmax.z - consts.boxmin.z) * (
            (b.astype(jnp.float32) + 1.0) / n
        )
        dz = step.z / consts.tstep  # direction z
        safe_dz = jnp.abs(dz) > 1e-12
        t_a = jnp.where(safe_dz, (z_lo - origin.z) / jnp.where(safe_dz, dz, 1.0), 0.0)
        t_b = jnp.where(safe_dz, (z_hi - origin.z) / jnp.where(safe_dz, dz, 1.0), 0.0)
        t_enter = jnp.minimum(t_a, t_b)
        n0 = jnp.where(
            safe_dz,
            jnp.floor((t_enter - tnear) / consts.tstep) - 1.0,
            0.0,
        )
        n0 = jnp.clip(n0, 0.0, float(opts.n_steps)).astype(jnp.int32)

        zeros = jnp.zeros_like(tnear)

        def past_brick(pos_z, t):
            znorm = (pos_z - consts.boxmin.z) * inv_bz
            fwd = (dz > 0) & (znorm * n > b.astype(jnp.float32) + 1.0 + 1e-3)
            bwd = (dz < 0) & (znorm * n < b.astype(jnp.float32) - 1e-3)
            return fwd | bwd | (t > tfar)

        def body(carry):
            k, rgb, a_acc = carry
            nstep = (n0 + k).astype(jnp.float32)
            t = tnear + consts.tstep * nstep
            pos = pos0 + F3(step.x * nstep, step.y * nstep, step.z * nstep)
            active = hit & (t <= tfar) & (owner_of(pos.z) == b) & (n0 + k < opts.n_steps)
            # replicate the reference's unconditional first step (t == tnear
            # executes even when tnear > tfar after the behind-camera clamp)
            active = active | (hit & (n0 + k == 0) & (owner_of(pos.z) == b))

            s_rgb, alpha = core.march_step(scene_local, consts, pos, origin, samplers)
            new_rgb, new_a = core.composite_under(rgb, a_acc, s_rgb, alpha)
            rgb = F3(
                jnp.where(active, new_rgb.x, rgb.x),
                jnp.where(active, new_rgb.y, rgb.y),
                jnp.where(active, new_rgb.z, rgb.z),
            )
            a_acc = jnp.where(active, new_a, a_acc)
            return (k + 1, rgb, a_acc)

        def cond(carry):
            k, _, _ = carry
            nstep = (n0 + k).astype(jnp.float32)
            t = tnear + consts.tstep * nstep
            pos_z = pos0.z + step.z * nstep
            not_done = hit & ~past_brick(pos_z, t) & (n0 + k < opts.n_steps)
            return jnp.any(not_done)

        init = (jnp.int32(0), F3(zeros, zeros, zeros), zeros)
        _, seg_rgb, seg_a = jax.lax.while_loop(cond, body, init)

        # gather all brick segments and composite in per-ray traversal order
        segs = jax.lax.all_gather(
            (seg_rgb.x, seg_rgb.y, seg_rgb.z, seg_a), axis_name
        )  # each (n, R)
        sx, sy, sz, sa = segs
        forward_order = dz >= 0

        out_rgb = F3(zeros, zeros, zeros)
        out_a = zeros
        for p in range(n):
            q = n - 1 - p
            gx = jnp.where(forward_order, sx[p], sx[q])
            gy = jnp.where(forward_order, sy[p], sy[q])
            gz = jnp.where(forward_order, sz[p], sz[q])
            ga = jnp.where(forward_order, sa[p], sa[q])
            tr = 1.0 - out_a
            out_rgb = F3(out_rgb.x + tr * gx, out_rgb.y + tr * gy, out_rgb.z + tr * gz)
            out_a = out_a + tr * ga

        img = jnp.stack(
            [
                out_rgb.x.reshape(n_rows, opts.width),
                out_rgb.y.reshape(n_rows, opts.width),
                out_rgb.z.reshape(n_rows, opts.width),
            ],
            axis=-1,
        )
        return img

    specs = _brick_specs(scene, axis_name)
    out_spec = P() if ray_axis is None else P(ray_axis, None, None)
    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=out_spec,
        check_vma=False,
    )(scene, jnp.float32(camera_x_offset))
