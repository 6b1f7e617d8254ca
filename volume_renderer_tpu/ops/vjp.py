"""Fused forward + replay backward (custom VJP) — the production training path.

The reference renderer is forward-only; this module adds the pixel ->
voxel/parameter backward pass with O(1) memory in the march length:

Forward: the early-exiting ``while_loop`` march (ops/forward.py), saving
only the output image as a residual.

Backward: replay the march front-to-back. With the under-operator

    out = sum_n T_n * s_n,       T_n = prod_{m<n} (1 - alpha_m)

the cotangents of step n are available during a single forward replay:

    dL/ds_n     = g * T_n
    dL/dalpha_n = -(g . out - g . prefix_n) / (1 - alpha_n)

where prefix_n = sum_{m<=n} T_m * (g . s_m) is accumulated as we replay and
``g . out`` comes from the saved output. Per step, ``jax.vjp`` of the
closed-form step math (raymarch_core.step_from_taps) turns those into
cotangents of the fetched texture taps and the transfer parameters; tap
cotangents are scatter-added into the voxel-grid gradients with the same
trilinear weights the forward gather used.

Gradients produced: emission/absorption/reflection grids, gradient volumes
(in lookup mode), transfer factors, color, light colors. The march
geometry (camera, tnear/tfar, positions) and the early-termination
boundary are treated as non-differentiable, exactly like autodiff of the
masked scan forward.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from volume_renderer_tpu.models.scene import RenderOptions, Scene
from volume_renderer_tpu.ops import raymarch_core as core
from volume_renderer_tpu.ops.float3 import F3
from volume_renderer_tpu.ops.forward import _init_rays, render_rows
from volume_renderer_tpu.ops.sampling import trilinear_setup

Diff = Dict[str, Any]

_PLACEHOLDER = object()


def split_scene(scene: Scene, with_camera: bool = False) -> Tuple[Diff, Scene]:
    """Separate the differentiable leaves from the (small) static template.

    Aliased absorption/reflection (None in the Scene) have no leaves of
    their own — their gradients flow into the emission grid.

    ``with_camera=True`` additionally exposes the full camera contract
    of SURVEY section 7.4 as differentiable leaves: the rotation matrix,
    ``camera_focal`` (focal length) and ``camera_distance`` (distance to
    object). The fused backward replays the pose chain (ray origin /
    direction / entry point are closed-form in all of them) and one
    geometry VJP at the end pulls the accumulated (d_pos0, d_step,
    d_origin) back to every camera leaf. ``render_fused(camera_grads=
    True)`` further adds ``camera_x_offset`` (a render argument, not
    scene state — the stereo disparity knob, VolumeRender.m:275-308).
    """
    diff: Diff = {
        "emission": scene.emission.data,
        "factor_emission": scene.settings.factor_emission,
        "factor_absorption": scene.settings.factor_absorption,
        "factor_reflection": scene.settings.factor_reflection,
        "color": scene.settings.color,
    }
    if with_camera:
        diff["camera_rotation"] = scene.camera.rotation
        diff["camera_focal"] = jnp.float32(scene.camera.focal_length)
        diff["camera_distance"] = jnp.float32(scene.camera.distance_to_object)
    if not scene.absorption_aliased:
        diff["absorption"] = scene.absorption.data
    if not scene.reflection_aliased:
        diff["reflection"] = scene.reflection.data
    if scene.has_lighting:
        diff["light_colors"] = scene.light_colors
    if scene.has_gradient_volumes:
        diff["gradient_x"] = scene.gradient_x.data
        diff["gradient_y"] = scene.gradient_y.data
        diff["gradient_z"] = scene.gradient_z.data

    ph = jnp.zeros((1, 1, 1), jnp.float32)
    template = scene.replace(
        emission=scene.emission.replace(data=ph),
        absorption=None if scene.absorption_aliased else scene.absorption.replace(data=ph),
        reflection=None if scene.reflection_aliased else scene.reflection.replace(data=ph),
        gradient_x=scene.gradient_x.replace(data=ph) if scene.has_gradient_volumes else None,
        gradient_y=scene.gradient_y.replace(data=ph) if scene.has_gradient_volumes else None,
        gradient_z=scene.gradient_z.replace(data=ph) if scene.has_gradient_volumes else None,
        light_colors=jnp.zeros_like(scene.light_colors) if scene.has_lighting else None,
        settings=scene.settings.replace(
            factor_emission=jnp.float32(0),
            factor_absorption=jnp.float32(0),
            factor_reflection=jnp.float32(0),
            color=jnp.zeros(3, jnp.float32),
        ),
    )
    return diff, template


def merge_scene(template: Scene, diff: Diff) -> Scene:
    kwargs = dict(
        emission=template.emission.replace(data=diff["emission"]),
        settings=template.settings.replace(
            factor_emission=diff["factor_emission"],
            factor_absorption=diff["factor_absorption"],
            factor_reflection=diff["factor_reflection"],
            color=diff["color"],
        ),
    )
    if "absorption" in diff:
        kwargs["absorption"] = template.absorption.replace(data=diff["absorption"])
    if "reflection" in diff:
        kwargs["reflection"] = template.reflection.replace(data=diff["reflection"])
    if "light_colors" in diff:
        kwargs["light_colors"] = diff["light_colors"]
    if "camera_rotation" in diff:
        cam = template.camera.replace(rotation=diff["camera_rotation"])
        if "camera_focal" in diff:
            cam = cam.replace(focal_length=diff["camera_focal"],
                              distance_to_object=diff["camera_distance"])
        kwargs["camera"] = cam
    if "gradient_x" in diff:
        kwargs["gradient_x"] = template.gradient_x.replace(data=diff["gradient_x"])
        kwargs["gradient_y"] = template.gradient_y.replace(data=diff["gradient_y"])
        kwargs["gradient_z"] = template.gradient_z.replace(data=diff["gradient_z"])
    return template.replace(**kwargs)


def _scatter_meta(vol_shape, coords: F3):
    """Flat corner indices (..., 8) + trilinear weights (..., 8) for a
    scatter-add that is the exact adjoint of ``sample_trilinear``."""
    d, h, w = vol_shape
    i0, i1, fx, fy, fz = trilinear_setup((d, h, w), coords)
    sy, sz = w, w * h

    def flat(ix, iy, iz):
        return ix + iy * sy + iz * sz

    idx = jnp.stack(
        [
            flat(i0.x, i0.y, i0.z),
            flat(i1.x, i0.y, i0.z),
            flat(i0.x, i1.y, i0.z),
            flat(i1.x, i1.y, i0.z),
            flat(i0.x, i0.y, i1.z),
            flat(i1.x, i0.y, i1.z),
            flat(i0.x, i1.y, i1.z),
            flat(i1.x, i1.y, i1.z),
        ],
        axis=-1,
    )
    gx0, gx1 = 1.0 - fx, fx
    gy0, gy1 = 1.0 - fy, fy
    gz0, gz1 = 1.0 - fz, fz
    wgt = jnp.stack(
        [
            gx0 * gy0 * gz0,
            gx1 * gy0 * gz0,
            gx0 * gy1 * gz0,
            gx1 * gy1 * gz0,
            gx0 * gy0 * gz1,
            gx1 * gy0 * gz1,
            gx0 * gy1 * gz1,
            gx1 * gy1 * gz1,
        ],
        axis=-1,
    )
    return idx, wgt


def _scatter_add(flat_grad: jnp.ndarray, meta, d_val: jnp.ndarray) -> jnp.ndarray:
    idx, wgt = meta
    return flat_grad.at[idx.reshape(-1)].add((wgt * d_val[..., None]).reshape(-1))


def render_fused(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset: float = 0.0,
    y_offset=0.0,
    n_rows: Optional[int] = None,
    early_exit: bool = True,
    camera_grads: bool = False,
) -> jnp.ndarray:
    """Differentiable fused render: forward = early-exit while march,
    backward = O(1)-memory replay. Drop-in for render_forward under grad.

    early_exit=False runs a fixed trip count (opts.n_steps) in both
    directions. Use it when the result feeds a cross-device collective
    (psum of gradients): per-shard data-dependent trip counts unbalance
    the replicas, which at best wastes the fast devices and on the XLA
    CPU simulator can starve the rendezvous into a deadlock.

    camera_grads=True additionally differentiates the full camera
    contract — rotation, focal length, distance to object, and the
    stereo x offset (SURVEY section 7.4) — with O(1)-memory pose
    gradients through the replay (the scan-path equivalent in
    tests/test_camera_grad.py rematerializes every step).
    """
    diff, template = split_scene(scene, with_camera=camera_grads)
    if camera_grads:
        # the x offset rides in diff (traced, differentiable); the static
        # nondiff copy is unused then — 0.0 keeps the jit key stable
        diff["camera_x_offset"] = jnp.float32(camera_x_offset)
    return _render_fused(
        diff,
        template,
        jnp.asarray(y_offset, jnp.float32),
        opts,
        0.0 if camera_grads else float(camera_x_offset),
        int(n_rows) if n_rows is not None else opts.height,
        bool(early_exit),
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _render_fused(diff, template, y_offset, opts, cam_off, n_rows, early_exit):
    scene = merge_scene(template, diff)
    return render_rows(
        scene,
        opts,
        diff.get("camera_x_offset", cam_off),
        y_offset.astype(jnp.int32),
        n_rows,
        differentiable=not early_exit,  # differentiable=True is the
        # fixed-trip scan; as a custom_vjp primal it is never
        # grad-traced, so no per-step residuals are kept
    )


def _fused_fwd(diff, template, y_offset, opts, cam_off, n_rows, early_exit):
    out = _render_fused(diff, template, y_offset, opts, cam_off, n_rows, early_exit)
    return out, (diff, template, y_offset, out)


def _fused_bwd(opts, cam_off, n_rows, early_exit, residuals, g):
    diff, template, y_offset, out = residuals
    scene = merge_scene(template, diff)
    cam_keys = [k for k in ("camera_rotation", "camera_focal",
                            "camera_distance", "camera_x_offset")
                if k in diff]
    cam_grads = bool(cam_keys)

    consts, origin, pos0, step, tnear, tfar, hit = _init_rays(
        scene, opts, diff.get("camera_x_offset", cam_off),
        y_offset=y_offset.astype(jnp.int32), n_rows=n_rows
    )
    if cam_grads:
        # closed-form pose chain: pos_k = pos0 + k*step with (pos0, step,
        # origin) closed-form in every camera leaf through ray generation
        # + the box clip; the replay accumulates their cotangents and one
        # geometry VJP at the end pulls them back to the rotation matrix,
        # the intrinsics (focal, distance) and the stereo x offset
        def geom(cd):
            cam = scene.camera.replace(
                rotation=cd.get("camera_rotation", scene.camera.rotation))
            if "camera_focal" in cd:
                cam = cam.replace(focal_length=cd["camera_focal"])
            if "camera_distance" in cd:
                cam = cam.replace(distance_to_object=cd["camera_distance"])
            sc = scene.replace(camera=cam)
            _, o_, p0_, st_, _, _, _ = _init_rays(
                sc, opts, cd.get("camera_x_offset", cam_off),
                y_offset=y_offset.astype(jnp.int32), n_rows=n_rows)
            return p0_, st_, o_

        (pos0, step, origin), geom_vjp = jax.vjp(
            geom, {k: diff[k] for k in cam_keys})
    params = core.params_of(scene, consts)
    lighting = scene.has_lighting
    lookup = scene.has_gradient_volumes

    r = n_rows * opts.width
    g_flat = g.reshape(r, 3)
    g3 = F3(g_flat[:, 0], g_flat[:, 1], g_flat[:, 2])
    out_flat = out.reshape(r, 3)
    total_dot = (
        g_flat[:, 0] * out_flat[:, 0]
        + g_flat[:, 1] * out_flat[:, 1]
        + g_flat[:, 2] * out_flat[:, 2]
    )

    # gradient accumulators (flat grids + parameter scalars). The varying
    # zero seed keeps the while_loop carry type stable under shard_map:
    # plain jnp.zeros is device-invariant ("unvarying") but the loop body
    # mixes in per-shard ray data, and carry types must match.
    vzero = jnp.sum(g_flat) * 0.0
    acc0 = {
        "emission": jnp.zeros(scene.emission.data.size, jnp.float32) + vzero,
        "factor_emission": jnp.float32(0) + vzero,
        "factor_absorption": jnp.float32(0) + vzero,
        "factor_reflection": jnp.float32(0) + vzero,
        "color": jnp.zeros(3, jnp.float32) + vzero,
    }
    if not scene.absorption_aliased:
        acc0["absorption"] = jnp.zeros(scene.absorption.data.size, jnp.float32) + vzero
    if not scene.reflection_aliased and lighting:
        acc0["reflection"] = jnp.zeros(scene.reflection.data.size, jnp.float32) + vzero
    if lighting:
        acc0["light_colors"] = jnp.zeros_like(scene.light_colors) + vzero
    if lookup:
        acc0["gradient_x"] = jnp.zeros(scene.gradient_x.data.size, jnp.float32) + vzero
        acc0["gradient_y"] = jnp.zeros(scene.gradient_y.data.size, jnp.float32) + vzero
        acc0["gradient_z"] = jnp.zeros(scene.gradient_z.data.size, jnp.float32) + vzero

    zeros = jnp.zeros_like(tnear)
    if cam_grads:
        zf3 = F3(zeros + vzero, zeros + vzero, zeros + vzero)
        acc0["d_pos0"] = zf3
        acc0["d_step"] = zf3
        acc0["d_origin"] = zf3

    def body(carry):
        i, sum_w, t, pos, active, prefix_dot, acc = carry

        taps = core.gather_taps(scene, consts, pos)

        if cam_grads:
            def f(taps_, params_, pos_, origin_):
                return core.step_from_taps(
                    scene, consts, params_, taps_, pos_, origin_)

            (s_rgb, alpha), vjp_fn = jax.vjp(f, taps, params, pos, origin)
        else:
            def f(taps_, params_):
                return core.step_from_taps(
                    scene, consts, params_, taps_, pos, origin)

            (s_rgb, alpha), vjp_fn = jax.vjp(f, taps, params)

        tr = 1.0 - sum_w
        contrib_dot = tr * (g3.x * s_rgb.x + g3.y * s_rgb.y + g3.z * s_rgb.z)
        prefix_dot = prefix_dot + jnp.where(active, contrib_dot, 0.0)

        act = active
        d_s = F3(
            jnp.where(act, g3.x * tr, 0.0),
            jnp.where(act, g3.y * tr, 0.0),
            jnp.where(act, g3.z * tr, 0.0),
        )
        one_m_a = 1.0 - alpha
        safe = act & (one_m_a > 0.0)
        d_alpha = jnp.where(
            safe,
            -(total_dot - prefix_dot) / jnp.where(one_m_a > 0.0, one_m_a, 1.0),
            0.0,
        )

        if cam_grads:
            d_taps, d_params, d_pos_dir, d_origin_dir = vjp_fn((d_s, d_alpha))
            # tap values chain to the position through the trilinear
            # fractional weights (grids are closed over: only the
            # coordinate cotangent is materialized — no scatter here)
            _, tap_vjp = jax.vjp(
                lambda p: core.gather_taps(scene, consts, p), pos)
            (d_pos_tap,) = tap_vjp(d_taps)
            d_pos_k = d_pos_dir + d_pos_tap
        else:
            d_taps, d_params = vjp_fn((d_s, d_alpha))

        # ---- scatter tap cotangents into the grids (aliased roles
        # accumulate into the emission grid with the emission meta) ----
        sample_pos = core.to_sample_coords(pos, consts)
        em_meta = _scatter_meta(scene.emission.data.shape, sample_pos)
        acc = dict(acc)
        if cam_grads:
            kf = i.astype(jnp.float32)
            acc["d_pos0"] = acc["d_pos0"] + d_pos_k
            acc["d_step"] = acc["d_step"] + d_pos_k * kf
            acc["d_origin"] = acc["d_origin"] + d_origin_dir
        acc["emission"] = _scatter_add(acc["emission"], em_meta, d_taps.em)
        if scene.absorption_aliased:
            acc["emission"] = _scatter_add(acc["emission"], em_meta, d_taps.ab)
        else:
            ab_meta = _scatter_meta(scene.absorption.data.shape, sample_pos)
            acc["absorption"] = _scatter_add(acc["absorption"], ab_meta, d_taps.ab)
        if lighting:
            if scene.reflection_aliased:
                acc["emission"] = _scatter_add(acc["emission"], em_meta, d_taps.re)
            else:
                re_meta = _scatter_meta(scene.reflection.data.shape, sample_pos)
                acc["reflection"] = _scatter_add(acc["reflection"], re_meta, d_taps.re)
            if lookup:
                for key, dval in zip(
                    ("gradient_x", "gradient_y", "gradient_z"), d_taps.grad_taps
                ):
                    meta = _scatter_meta(getattr(scene, key).data.shape, sample_pos)
                    acc[key] = _scatter_add(acc[key], meta, dval)
            else:
                for p, dval in zip(
                    core.otf_tap_positions(pos, consts), d_taps.grad_taps
                ):
                    meta = _scatter_meta(scene.emission.data.shape, p)
                    acc["emission"] = _scatter_add(acc["emission"], meta, dval)

        # ---- parameter cotangents (already summed over rays by vjp) ----
        acc["factor_emission"] = acc["factor_emission"] + d_params.factor_emission
        acc["factor_absorption"] = acc["factor_absorption"] + d_params.factor_absorption
        acc["factor_reflection"] = acc["factor_reflection"] + d_params.factor_reflection
        acc["color"] = acc["color"] + jnp.stack(
            [d_params.color.x, d_params.color.y, d_params.color.z]
        )
        if lighting:
            acc["light_colors"] = acc["light_colors"] + d_params.light_colors

        # ---- advance exactly like the forward march ----
        new_w = tr * alpha + sum_w
        sum_w = jnp.where(active, new_w, sum_w)
        t_next = t + consts.tstep
        active = active & (sum_w <= consts.opacity_threshold) & (t_next <= tfar)
        return (i + 1, sum_w, t_next, pos + step, active, prefix_dot, acc)

    carry0 = (jnp.int32(0), zeros, tnear, pos0, hit, zeros, acc0)
    if early_exit:

        def cond(carry):
            i, _, _, _, active, _, _ = carry
            return jnp.any(active) & (i < opts.n_steps)

        _, _, _, _, _, _, acc = jax.lax.while_loop(cond, body, carry0)
    else:
        _, _, _, _, _, _, acc = jax.lax.fori_loop(
            0, opts.n_steps, lambda _, c: body(c), carry0
        )

    d_diff = {
        "emission": acc["emission"].reshape(scene.emission.data.shape),
        "factor_emission": acc["factor_emission"],
        "factor_absorption": acc["factor_absorption"],
        "factor_reflection": acc["factor_reflection"],
        "color": acc["color"],
    }
    if "absorption" in diff:
        d_diff["absorption"] = acc["absorption"].reshape(scene.absorption.data.shape)
    if "reflection" in diff:
        if "reflection" in acc:
            d_diff["reflection"] = acc["reflection"].reshape(scene.reflection.data.shape)
        else:  # reflection volume present but lighting off: untouched
            d_diff["reflection"] = jnp.zeros(scene.reflection.data.shape, jnp.float32)
    if lighting:
        d_diff["light_colors"] = acc["light_colors"]
    if lookup:
        d_diff["gradient_x"] = acc["gradient_x"].reshape(scene.gradient_x.data.shape)
        d_diff["gradient_y"] = acc["gradient_y"].reshape(scene.gradient_y.data.shape)
        d_diff["gradient_z"] = acc["gradient_z"].reshape(scene.gradient_z.data.shape)
    if cam_grads:
        (d_cam,) = geom_vjp(
            (acc["d_pos0"], acc["d_step"], acc["d_origin"]))
        d_diff.update(d_cam)

    d_template = jax.tree.map(jnp.zeros_like, template)
    d_y_offset = jnp.zeros_like(residuals[2])
    return (d_diff, d_template, d_y_offset)


_render_fused.defvjp(_fused_fwd, _fused_bwd)
