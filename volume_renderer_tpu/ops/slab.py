"""Single-device z-slab-swept ray march for volumes larger than fast memory.

The reference's answer to over-size scenes is a hard VRAM pre-flight error
plus a manual multi-pass convention (reference src/C/vr/mm/mmanager.hxx:
144-173, README.md:5). Here the renderer itself sweeps the volume in
z-slabs on ONE device, in two tiers:

- ``render_forward_slabbed``: grids stay in HBM; slab s (+HALO rows each
  side) is ``lax.dynamic_slice``d per sweep step, bounding the march's
  per-step working set to one slab per volume role.
- ``render_forward_streamed``: grids stay on the HOST (numpy); the Python
  sweep ships one slab at a time to the device — volumes larger than
  device memory render on a single chip.

Front-to-back "under" compositing is associative over (premultiplied
color, alpha) segments, so sweeping slabs in each ray's own traversal
order reproduces the flat march exactly — including the opacity-threshold
early exit, which bricked multi-device mode (parallel/bricks.py) only
recovers via its ring schedule.

Rays with direction dz >= 0 traverse slabs in ascending z order; rays with
dz < 0 in descending order. Two sweeps (each skipped when it owns no rays)
share the same accumulators with disjoint ray masks.

Step ownership is the same rule as parallel/bricks.py: a march step belongs
to slab ``clip(floor(z_normalized * B), 0, B-1)`` evaluated at its sample
position, so each global step executes exactly once. Positions use the
closed form pos0 + n*step (ulp-level drift vs the accumulated pos += step
of ops/forward.py; allclose).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from volume_renderer_tpu.models.scene import RenderOptions, Scene
from volume_renderer_tpu.ops import raymarch_core as core
from volume_renderer_tpu.ops.float3 import F3
from volume_renderer_tpu.ops.forward import _init_rays
from volume_renderer_tpu.ops.sampling import sample_trilinear, sample_trilinear_zslab

HALO = 2  # rows each side: trilinear needs +-1, OTF gradient taps +-2

# slab-carried volume roles, in a fixed order (subset active per scene)
_ROLES = ("em", "ab", "re", "gx", "gy", "gz")


def _check_divisible(scene: Scene, n: int) -> None:
    # only roles the march actually samples (e.g. the facade's (1,1,1)
    # reflection placeholder is never sampled when lighting is off)
    for role, data in _role_volumes(scene).items():
        d = data.shape[0]
        if d % n != 0:
            raise ValueError(
                f"{role} depth {d} must be divisible by n_slabs={n} "
                f"(pad the volume)"
            )
        if d // n + 2 * HALO > d:
            raise ValueError(
                f"n_slabs={n} too fine for depth {d}: slab+halo would "
                f"exceed the volume"
            )


def _role_volumes(scene: Scene):
    """role -> full volume array for every role the march samples."""
    out = {"em": scene.emission.data}
    if not scene.absorption_aliased:
        out["ab"] = scene.absorption.data
    if scene.has_lighting:
        if not scene.reflection_aliased:
            out["re"] = scene.reflection.data
        if scene.has_gradient_volumes:
            out["gx"] = scene.gradient_x.data
            out["gy"] = scene.gradient_y.data
            out["gz"] = scene.gradient_z.data
    return out


def _slab_window(d: int, n_slabs: int, s):
    """Clamped (start, rows) of slab s's halo-padded window in a depth-d grid."""
    bd = d // n_slabs
    rows = bd + 2 * HALO
    start = jnp.clip(s * bd - HALO, 0, d - rows)
    return start, rows


def _samplers_from_slabs(scene: Scene, slabs, z_offsets, full_ds) -> core.Samplers:
    """Samplers over halo-padded z-slab arrays (GLOBAL normalized coords).

    slabs/z_offsets/full_ds: dicts keyed by role. Values identical to
    full-volume sampling for every z index the owner rule can touch.
    """

    def mk(role):
        slab, off, d = slabs[role], z_offsets[role], full_ds[role]
        return lambda p: sample_trilinear_zslab(slab, p, off, d)

    em = mk("em")
    ab = em if "ab" not in slabs else mk("ab")
    re = gx = gy = gz = lut = None
    if scene.has_lighting:
        re = em if "re" not in slabs else mk("re")
        lut = lambda p: sample_trilinear(scene.illumination, p)  # noqa: E731
        if scene.has_gradient_volumes:
            gx, gy, gz = mk("gx"), mk("gy"), mk("gz")
    return core.Samplers(em=em, ab=ab, re=re, gx=gx, gy=gy, gz=gz, lut=lut)


class _Rays:
    """Bundle of the per-ray march setup shared by all slab iterations."""

    def __init__(self, scene, opts, camera_x_offset, y_offset, n_rows):
        (self.consts, self.origin, self.pos0, self.step, self.tnear,
         self.tfar, self.hit) = _init_rays(
            scene, opts, camera_x_offset, y_offset=y_offset, n_rows=n_rows
        )
        self.n_steps = opts.n_steps

    def pos_at(self, n_cur):
        nf = n_cur.astype(jnp.float32)
        return self.pos0 + F3(self.step.x * nf, self.step.y * nf, self.step.z * nf)

    def dz(self):
        return self.step.z / self.consts.tstep

    def marchable(self, n_cur, w, mask, early_exit: bool):
        """Rays that still have steps to run (in whatever slab)."""
        t = self.tnear + self.consts.tstep * n_cur.astype(jnp.float32)
        alive = self.hit & mask & (n_cur < self.n_steps) & (t <= self.tfar)
        if early_exit:
            alive = alive & (w <= self.consts.opacity_threshold)
        # the reference's unconditional first step (t == tnear runs even
        # when tnear > tfar after the behind-camera clamp)
        return alive | (self.hit & mask & (n_cur == 0))


def _march_one_slab(scene, rays: _Rays, samplers, owner_of, s, mask, state,
                    early_exit: bool):
    """Run every masked ray through its steps owned by slab ``s``."""
    n_cur0, rgb0, w0 = state

    def in_slab(n_cur, w):
        return (rays.marchable(n_cur, w, mask, early_exit)
                & (owner_of(rays.pos_at(n_cur).z) == s))

    def step_body(c):
        n_cur, rgb, w = c
        pos = rays.pos_at(n_cur)
        active = in_slab(n_cur, w)
        s_rgb, alpha = core.march_step(scene, rays.consts, pos, rays.origin, samplers)
        new_rgb, new_w = core.composite_under(rgb, w, s_rgb, alpha)
        rgb = F3(
            jnp.where(active, new_rgb.x, rgb.x),
            jnp.where(active, new_rgb.y, rgb.y),
            jnp.where(active, new_rgb.z, rgb.z),
        )
        w = jnp.where(active, new_w, w)
        n_cur = jnp.where(active, n_cur + 1, n_cur)
        return (n_cur, rgb, w)

    return jax.lax.while_loop(
        lambda c: jnp.any(in_slab(c[0], c[2])), step_body, (n_cur0, rgb0, w0)
    )


def _make_owner(rays: _Rays, n: int):
    inv_bz = rays.consts.boxscale.z

    def owner_of(pos_z):
        znorm = (pos_z - rays.consts.boxmin.z) * inv_bz
        return jnp.clip(jnp.floor(znorm * n).astype(jnp.int32), 0, n - 1)

    return owner_of


def _image_of(rgb: F3, n_rows: int, width: int) -> jnp.ndarray:
    return jnp.stack(
        [
            rgb.x.reshape(n_rows, width),
            rgb.y.reshape(n_rows, width),
            rgb.z.reshape(n_rows, width),
        ],
        axis=-1,
    )


@partial(jax.jit, static_argnames=("opts", "n_slabs", "n_rows", "early_exit"))
def render_forward_slabbed(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset=0.0,
    *,
    n_slabs: int,
    y_offset=0,
    n_rows: Optional[int] = None,
    early_exit: bool = True,
) -> jnp.ndarray:
    """Forward render sweeping HBM-resident grids in ``n_slabs`` z-slabs.

    Output matches ``render_forward`` allclose, including exact per-ray
    opacity-threshold early termination (``early_exit=True``). The march's
    per-step volume working set is one halo-padded slab per non-aliased
    role instead of the full grids — the single-chip over-size path
    selected by the memory planner (volume_renderer_tpu.api.planner).
    """
    _check_divisible(scene, n_slabs)
    if n_rows is None:
        n_rows = opts.height

    rays = _Rays(scene, opts, camera_x_offset, y_offset, n_rows)
    n = n_slabs
    owner_of = _make_owner(rays, n)
    vols = _role_volumes(scene)
    full_ds = {r: v.shape[0] for r, v in vols.items()}

    def slabs_at(s):
        slabs, offs = {}, {}
        for role, data in vols.items():
            start, rows = _slab_window(data.shape[0], n, s)
            slabs[role] = jax.lax.dynamic_slice(
                data, (start, 0, 0), (rows, data.shape[1], data.shape[2])
            )
            offs[role] = start
        return slabs, offs

    zeros = jnp.zeros_like(rays.tnear)
    fwd_rays = rays.dz() >= 0

    def make_sweep(mask, ascending: bool):
        def slab_body(carry):
            s_iter, state = carry
            s = s_iter if ascending else (n - 1 - s_iter)
            slabs, offs = slabs_at(s)
            samplers = _samplers_from_slabs(scene, slabs, offs, full_ds)
            state = _march_one_slab(
                scene, rays, samplers, owner_of, s, mask, state, early_exit
            )
            return (s_iter + 1, state)

        def slab_cond(carry):
            s_iter, (n_cur, _, w) = carry
            return (s_iter < n) & jnp.any(rays.marchable(n_cur, w, mask, early_exit))

        def sweep(state):
            _, state = jax.lax.while_loop(slab_cond, slab_body, (jnp.int32(0), state))
            return state

        return sweep

    state = (jnp.zeros_like(rays.tnear, dtype=jnp.int32), F3(zeros, zeros, zeros), zeros)
    for mask, ascending in ((fwd_rays, True), (~fwd_rays, False)):
        state = jax.lax.cond(
            jnp.any(rays.hit & mask), make_sweep(mask, ascending), lambda st: st, state
        )

    _, rgb, _ = state
    return _image_of(rgb, n_rows, opts.width)


# ---- host-streamed tier ------------------------------------------------------


@partial(jax.jit, static_argnames=("opts", "n_slabs", "n_rows", "ascending", "roles"))
def _streamed_slab_step(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset,
    slab_arrays,  # tuple of arrays, one per role in ``roles``
    z_offsets,  # tuple of traced ints
    full_ds_arr,  # tuple of traced ints
    s,
    state,
    *,
    n_slabs: int,
    n_rows: int,
    ascending: bool,
    roles: tuple,
):
    """March one streamed slab; returns (state, any_marchable_after)."""
    rays = _Rays(scene, opts, camera_x_offset, 0, n_rows)
    owner_of = _make_owner(rays, n_slabs)
    mask = (rays.dz() >= 0) if ascending else (rays.dz() < 0)
    slabs = dict(zip(roles, slab_arrays))
    offs = dict(zip(roles, z_offsets))
    fds = dict(zip(roles, full_ds_arr))
    samplers = _samplers_from_slabs(scene, slabs, offs, fds)
    state = _march_one_slab(scene, rays, samplers, owner_of, s, mask, state, True)
    n_cur, _, w = state
    return state, jnp.any(rays.marchable(n_cur, w, mask, True))


@partial(jax.jit, static_argnames=("opts", "n_rows"))
def _streamed_setup(scene: Scene, opts: RenderOptions, camera_x_offset, n_rows: int):
    rays = _Rays(scene, opts, camera_x_offset, 0, n_rows)
    zeros = jnp.zeros_like(rays.tnear)
    state = (jnp.zeros_like(rays.tnear, dtype=jnp.int32), F3(zeros, zeros, zeros), zeros)
    dz = rays.dz()
    any_fwd = jnp.any(rays.hit & (dz >= 0))
    any_bwd = jnp.any(rays.hit & (dz < 0))
    return state, any_fwd, any_bwd


def render_forward_streamed(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset: float = 0.0,
    *,
    n_slabs: int,
) -> jnp.ndarray:
    """Forward render with HOST-resident voxel grids streamed slab by slab.

    ``scene``'s volume ``data`` members may be numpy arrays of any size —
    only one halo-padded slab per role is ever device-resident, so a
    single chip renders volumes larger than its memory. The Python-level
    sweep re-uses one compiled slab-march per direction; the per-ray
    (color, opacity, cursor) state stays on device between slabs.
    """
    _check_divisible(scene, n_slabs)
    n_rows = opts.height

    host_vols = {r: np.asarray(v) for r, v in _role_volumes(scene).items()}
    roles = tuple(sorted(host_vols.keys()))
    full_ds = tuple(int(host_vols[r].shape[0]) for r in roles)

    # slim scene: placeholders for the big grids; march samples only slabs
    ph = jnp.zeros((1, 1, 1), jnp.float32)

    def ph_vol(v):
        return None if v is None else v.replace(data=ph)

    slim = scene.replace(
        emission=scene.emission.replace(data=ph),
        absorption=ph_vol(scene.absorption),
        reflection=ph_vol(scene.reflection),
        gradient_x=ph_vol(scene.gradient_x),
        gradient_y=ph_vol(scene.gradient_y),
        gradient_z=ph_vol(scene.gradient_z),
    )
    # ray setup needs the true emission extent for the render box; opts is
    # precomputed from it, so the slim scene only feeds settings/camera.

    state, any_fwd, any_bwd = _streamed_setup(slim, opts, camera_x_offset, n_rows)

    def host_slab(role, s):
        data = host_vols[role]
        d = data.shape[0]
        bd = d // n_slabs
        rows = bd + 2 * HALO
        start = int(np.clip(s * bd - HALO, 0, d - rows))
        return data[start:start + rows], start

    for ascending, anyrays in ((True, bool(any_fwd)), (False, bool(any_bwd))):
        if not anyrays:
            continue
        order = range(n_slabs) if ascending else range(n_slabs - 1, -1, -1)
        for s in order:
            slabs, offs = zip(*(host_slab(r, s) for r in roles))
            state, more = _streamed_slab_step(
                slim, opts, jnp.float32(camera_x_offset),
                tuple(jnp.asarray(x) for x in slabs),
                tuple(jnp.int32(o) for o in offs),
                tuple(jnp.int32(d) for d in full_ds),
                jnp.int32(s), state,
                n_slabs=n_slabs, n_rows=n_rows, ascending=ascending, roles=roles,
            )
            if not bool(more):  # all rays of this sweep finished early
                break

    _, rgb, _ = state
    return _image_of(rgb, n_rows, opts.width)


# ---- differentiable HBM-slabbed tier ----------------------------------------


def render_fused_slabbed(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset: float = 0.0,
    *,
    n_slabs: int,
) -> jnp.ndarray:
    """Differentiable z-slab-swept render (drop-in for ops.vjp.render_fused).

    Forward: ``render_forward_slabbed`` (per-step volume working set = one
    halo-padded slab per role). Backward: the same slab sweep replayed
    with the O(1)-memory prefix-dot trick of ops/vjp.py — taps are
    re-fetched from dynamic-sliced slabs, cotangents scatter-add into
    full-size gradient grids (which training must hold anyway).
    """
    from volume_renderer_tpu.ops.vjp import split_scene

    _check_divisible(scene, n_slabs)
    diff, template = split_scene(scene)
    return _slab_fused(diff, template, jnp.float32(camera_x_offset),
                       opts, int(n_slabs))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _slab_fused(diff, template, cam_off, opts, n_slabs):
    from volume_renderer_tpu.ops.vjp import merge_scene

    scene = merge_scene(template, diff)
    return render_forward_slabbed(scene, opts, cam_off, n_slabs=n_slabs)


def _slab_fused_fwd(diff, template, cam_off, opts, n_slabs):
    out = _slab_fused(diff, template, cam_off, opts, n_slabs)
    return out, (diff, template, cam_off, out)


def _slab_fused_bwd(opts, n_slabs, residuals, g):
    from volume_renderer_tpu.ops.vjp import (
        _scatter_add,
        _scatter_meta,
        merge_scene,
    )

    diff, template, cam_off, out = residuals
    scene = merge_scene(template, diff)
    n_rows = opts.height
    rays = _Rays(scene, opts, cam_off, 0, n_rows)
    consts = rays.consts
    thr = consts.opacity_threshold
    params = core.params_of(scene, consts)
    lighting = scene.has_lighting
    lookup = scene.has_gradient_volumes
    n = n_slabs
    owner_of = _make_owner(rays, n)
    vols = _role_volumes(scene)
    full_ds = {r_: v.shape[0] for r_, v in vols.items()}

    def slabs_at(s):
        slabs, offs = {}, {}
        for role, data in vols.items():
            start, rows = _slab_window(data.shape[0], n, s)
            slabs[role] = jax.lax.dynamic_slice(
                data, (start, 0, 0), (rows, data.shape[1], data.shape[2]))
            offs[role] = start
        return slabs, offs

    r = n_rows * opts.width
    g_flat = g.reshape(r, 3)
    g3 = F3(g_flat[:, 0], g_flat[:, 1], g_flat[:, 2])
    out_flat = out.reshape(r, 3)
    total_dot = (g_flat[:, 0] * out_flat[:, 0]
                 + g_flat[:, 1] * out_flat[:, 1]
                 + g_flat[:, 2] * out_flat[:, 2])

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
        for key in ("gradient_x", "gradient_y", "gradient_z"):
            acc0[key] = jnp.zeros(getattr(scene, key).data.size, jnp.float32) + vzero

    def replay_one_slab(samplers, s, mask, state):
        def in_slab(n_cur, w):
            return (rays.marchable(n_cur, w, mask, True)
                    & (owner_of(rays.pos_at(n_cur).z) == s))

        def step_body(c):
            n_cur, w, prefix, acc = c
            pos = rays.pos_at(n_cur)
            active = in_slab(n_cur, w)
            taps = core.gather_taps(scene, consts, pos, samplers)

            def f(taps_, params_):
                return core.step_from_taps(
                    scene, consts, params_, taps_, pos, rays.origin, samplers)

            (s_rgb, alpha), vjp_fn = jax.vjp(f, taps, params)

            tr = 1.0 - w
            contrib_dot = tr * (g3.x * s_rgb.x + g3.y * s_rgb.y + g3.z * s_rgb.z)
            prefix = prefix + jnp.where(active, contrib_dot, 0.0)

            d_s = F3(
                jnp.where(active, g3.x * tr, 0.0),
                jnp.where(active, g3.y * tr, 0.0),
                jnp.where(active, g3.z * tr, 0.0),
            )
            one_m_a = 1.0 - alpha
            safe = active & (one_m_a > 0.0)
            d_alpha = jnp.where(
                safe,
                -(total_dot - prefix) / jnp.where(one_m_a > 0.0, one_m_a, 1.0),
                0.0,
            )
            d_taps, d_params = vjp_fn((d_s, d_alpha))

            sample_pos = core.to_sample_coords(pos, consts)
            em_meta = _scatter_meta(scene.emission.data.shape, sample_pos)
            acc = dict(acc)
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
                            ("gradient_x", "gradient_y", "gradient_z"),
                            d_taps.grad_taps):
                        meta = _scatter_meta(getattr(scene, key).data.shape, sample_pos)
                        acc[key] = _scatter_add(acc[key], meta, dval)
                else:
                    for p_, dval in zip(core.otf_tap_positions(pos, consts),
                                        d_taps.grad_taps):
                        meta = _scatter_meta(scene.emission.data.shape, p_)
                        acc["emission"] = _scatter_add(acc["emission"], meta, dval)

            acc["factor_emission"] = acc["factor_emission"] + d_params.factor_emission
            acc["factor_absorption"] = acc["factor_absorption"] + d_params.factor_absorption
            acc["factor_reflection"] = acc["factor_reflection"] + d_params.factor_reflection
            acc["color"] = acc["color"] + jnp.stack(
                [d_params.color.x, d_params.color.y, d_params.color.z])
            if lighting:
                acc["light_colors"] = acc["light_colors"] + d_params.light_colors

            w = jnp.where(active, w + tr * alpha, w)
            n_cur = jnp.where(active, n_cur + 1, n_cur)
            return (n_cur, w, prefix, acc)

        return jax.lax.while_loop(
            lambda c: jnp.any(in_slab(c[0], c[1])), step_body, state)

    fwd_rays = rays.dz() >= 0

    def make_sweep(mask, ascending):
        def slab_body(carry):
            s_iter, state = carry
            s = s_iter if ascending else (n - 1 - s_iter)
            slabs, offs = slabs_at(s)
            samplers = _samplers_from_slabs(scene, slabs, offs, full_ds)
            state = replay_one_slab(samplers, s, mask, state)
            return (s_iter + 1, state)

        def slab_cond(carry):
            s_iter, (n_cur, w, _, _) = carry
            return (s_iter < n) & jnp.any(rays.marchable(n_cur, w, mask, True))

        def sweep(state):
            _, state = jax.lax.while_loop(slab_cond, slab_body,
                                          (jnp.int32(0), state))
            return state

        return sweep

    zeros = jnp.zeros_like(rays.tnear)
    state = (jnp.zeros_like(rays.tnear, dtype=jnp.int32), zeros, zeros, acc0)
    for mask, ascending in ((fwd_rays, True), (~fwd_rays, False)):
        state = jax.lax.cond(
            jnp.any(rays.hit & mask), make_sweep(mask, ascending),
            lambda st: st, state)

    _, _, _, acc = state

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
        else:
            d_diff["reflection"] = jnp.zeros(scene.reflection.data.shape, jnp.float32)
    if lighting:
        d_diff["light_colors"] = acc["light_colors"]
    if lookup:
        for key in ("gradient_x", "gradient_y", "gradient_z"):
            d_diff[key] = acc[key].reshape(getattr(scene, key).data.shape)

    d_template = jax.tree.map(jnp.zeros_like, template)
    return (d_diff, d_template, jnp.zeros_like(residuals[2]))


_slab_fused.defvjp(_slab_fused_fwd, _slab_fused_bwd)


# ---- streamed-tier training: host grids, slab-streamed backward -------------


@partial(jax.jit, static_argnames=("opts", "n_slabs", "n_rows", "ascending",
                                   "roles"))
def _streamed_bwd_slab_step(
    scene: Scene,  # slim scene (placeholder grids)
    opts: RenderOptions,
    camera_x_offset,
    slab_arrays,
    z_offsets,
    full_ds_arr,
    s,
    state,  # (n_cur, w, prefix)
    g3_parts,  # (gx, gy, gz) flat per-ray cotangents
    total_dot,
    *,
    n_slabs: int,
    n_rows: int,
    ascending: bool,
    roles: tuple,
):
    """Backward-replay one streamed slab: returns (state', slab grads dict,
    param grads dict, any_marchable_after)."""
    from volume_renderer_tpu.parallel.bricks import _scatter_meta_zslab

    rays = _Rays(scene, opts, camera_x_offset, 0, n_rows)
    consts = rays.consts
    owner_of = _make_owner(rays, n_slabs)
    mask = (rays.dz() >= 0) if ascending else (rays.dz() < 0)
    slabs = dict(zip(roles, slab_arrays))
    offs = dict(zip(roles, z_offsets))
    fds = dict(zip(roles, full_ds_arr))
    samplers = _samplers_from_slabs(scene, slabs, offs, fds)
    params = core.params_of(scene, consts)
    g3 = F3(*g3_parts)

    # slab-shaped gradient accumulators for the sampled roles
    acc_slabs = {r_: jnp.zeros(slabs[r_].size, jnp.float32) for r_ in roles}
    acc_par = {
        "factor_emission": jnp.float32(0),
        "factor_absorption": jnp.float32(0),
        "factor_reflection": jnp.float32(0),
        "color": jnp.zeros(3, jnp.float32),
    }
    if scene.has_lighting:
        acc_par["light_colors"] = jnp.zeros_like(scene.light_colors)

    geom = {
        r_: ((slabs[r_].shape), offs[r_], fds[r_]) for r_ in roles
    }

    def in_slab(n_cur, w):
        return (rays.marchable(n_cur, w, mask, True)
                & (owner_of(rays.pos_at(n_cur).z) == s))

    def step_body(c):
        n_cur, w, prefix, acc_s, acc_p = c
        pos = rays.pos_at(n_cur)
        active = in_slab(n_cur, w)
        taps = core.gather_taps(scene, consts, pos, samplers)

        def f(taps_, params_):
            return core.step_from_taps(
                scene, consts, params_, taps_, pos, rays.origin, samplers)

        (s_rgb, alpha), vjp_fn = jax.vjp(f, taps, params)

        tr = 1.0 - w
        contrib_dot = tr * (g3.x * s_rgb.x + g3.y * s_rgb.y + g3.z * s_rgb.z)
        prefix = prefix + jnp.where(active, contrib_dot, 0.0)

        d_s = F3(
            jnp.where(active, g3.x * tr, 0.0),
            jnp.where(active, g3.y * tr, 0.0),
            jnp.where(active, g3.z * tr, 0.0),
        )
        one_m_a = 1.0 - alpha
        safe = active & (one_m_a > 0.0)
        d_alpha = jnp.where(
            safe,
            -(total_dot - prefix) / jnp.where(one_m_a > 0.0, one_m_a, 1.0),
            0.0,
        )
        d_taps, d_params = vjp_fn((d_s, d_alpha))

        sample_pos = core.to_sample_coords(pos, consts)

        def scat(role, dval, at=None):
            shape, off, fd = geom[role]
            meta = _scatter_meta_zslab(shape, off, fd, at if at is not None
                                       else sample_pos)
            idx, wgt = meta
            return acc_s[role].at[idx.reshape(-1)].add(
                (wgt * dval[..., None]).reshape(-1))

        acc_s = dict(acc_s)
        acc_s["em"] = scat("em", d_taps.em)
        if "ab" in roles:
            acc_s["ab"] = scat("ab", d_taps.ab)
        else:
            acc_s["em"] = scat("em", d_taps.ab)
        if scene.has_lighting:
            if "re" in roles:
                acc_s["re"] = scat("re", d_taps.re)
            else:
                acc_s["em"] = scat("em", d_taps.re)
            if scene.has_gradient_volumes:
                for role, dval in zip(("gx", "gy", "gz"), d_taps.grad_taps):
                    acc_s[role] = scat(role, dval)
            else:
                for p_, dval in zip(core.otf_tap_positions(pos, consts),
                                    d_taps.grad_taps):
                    acc_s["em"] = scat("em", dval, at=p_)

        acc_p = dict(acc_p)
        acc_p["factor_emission"] = acc_p["factor_emission"] + d_params.factor_emission
        acc_p["factor_absorption"] = (acc_p["factor_absorption"]
                                      + d_params.factor_absorption)
        acc_p["factor_reflection"] = (acc_p["factor_reflection"]
                                      + d_params.factor_reflection)
        acc_p["color"] = acc_p["color"] + jnp.stack(
            [d_params.color.x, d_params.color.y, d_params.color.z])
        if scene.has_lighting:
            acc_p["light_colors"] = acc_p["light_colors"] + d_params.light_colors

        w = jnp.where(active, w + tr * alpha, w)
        n_cur = jnp.where(active, n_cur + 1, n_cur)
        return (n_cur, w, prefix, acc_s, acc_p)

    n_cur0, w0, prefix0 = state
    n_cur, w, prefix, acc_slabs, acc_par = jax.lax.while_loop(
        lambda c: jnp.any(in_slab(c[0], c[1])), step_body,
        (n_cur0, w0, prefix0, acc_slabs, acc_par))

    more = jnp.any(rays.marchable(n_cur, w, mask, True))
    slab_grads = {r_: acc_slabs[r_].reshape(slabs[r_].shape) for r_ in roles}
    return (n_cur, w, prefix), slab_grads, acc_par, more


def streamed_grads(
    scene: Scene,
    opts: RenderOptions,
    g: "np.ndarray",
    *,
    n_slabs: int,
    camera_x_offset: float = 0.0,
    g_fn=None,
):
    """Pixel-cotangent backward with HOST-resident voxel grids.

    ``scene``'s volume data may be numpy arrays larger than device
    memory; only one halo-padded slab (plus its slab-sized gradient) is
    device-resident at a time. Returns a dict of HOST (numpy) gradients
    for the sampled grids (keys: emission/absorption/... as in
    ops.vjp.split_scene) and the transfer parameters.

    Pass ``g_fn`` (image -> cotangent, e.g. the closed-form SSE loss
    gradient) instead of ``g`` when the cotangent depends on the forward
    image — the streamed forward pass runs here anyway, so this avoids a
    second full stream (train.train_step_streamed uses it).
    """
    _check_divisible(scene, n_slabs)
    n_rows = opts.height

    host_vols = {r_: np.asarray(v) for r_, v in _role_volumes(scene).items()}
    roles = tuple(sorted(host_vols.keys()))
    full_ds = tuple(int(host_vols[r_].shape[0]) for r_ in roles)

    # the forward image is needed for total_dot: streamed forward pass
    out = np.asarray(render_forward_streamed(
        scene, opts, camera_x_offset, n_slabs=n_slabs))

    ph = jnp.zeros((1, 1, 1), jnp.float32)

    def ph_vol(v):
        return None if v is None else v.replace(data=ph)

    slim = scene.replace(
        emission=scene.emission.replace(data=ph),
        absorption=ph_vol(scene.absorption),
        reflection=ph_vol(scene.reflection),
        gradient_x=ph_vol(scene.gradient_x),
        gradient_y=ph_vol(scene.gradient_y),
        gradient_z=ph_vol(scene.gradient_z),
    )

    if g is None:
        g = g_fn(out)
    r = n_rows * opts.width
    g_flat = np.asarray(g, np.float32).reshape(r, 3)
    out_flat = out.reshape(r, 3)
    total_dot = jnp.asarray((g_flat * out_flat).sum(axis=1))
    g3_parts = tuple(jnp.asarray(g_flat[:, i]) for i in range(3))

    host_grads = {r_: np.zeros_like(host_vols[r_]) for r_ in roles}
    par_grads = None

    state, any_fwd, any_bwd = _streamed_setup(slim, opts, camera_x_offset, n_rows)
    n_cur, _, w = state
    state = (n_cur, w, jnp.zeros_like(w))  # (n_cur, w, prefix)

    def host_slab(role, s):
        data = host_vols[role]
        d = data.shape[0]
        bd = d // n_slabs
        rows = bd + 2 * HALO
        start = int(np.clip(s * bd - HALO, 0, d - rows))
        return data[start:start + rows], start

    for ascending, anyrays in ((True, bool(any_fwd)), (False, bool(any_bwd))):
        if not anyrays:
            continue
        order = range(n_slabs) if ascending else range(n_slabs - 1, -1, -1)
        for s in order:
            slabs, offs = zip(*(host_slab(r_, s) for r_ in roles))
            state, slab_grads, acc_par, more = _streamed_bwd_slab_step(
                slim, opts, jnp.float32(camera_x_offset),
                tuple(jnp.asarray(x) for x in slabs),
                tuple(jnp.int32(o) for o in offs),
                tuple(jnp.int32(d) for d in full_ds),
                jnp.int32(s), state, g3_parts, total_dot,
                n_slabs=n_slabs, n_rows=n_rows, ascending=ascending,
                roles=roles,
            )
            for role in roles:
                start = offs[roles.index(role)]
                gslab = np.asarray(slab_grads[role])
                host_grads[role][start:start + gslab.shape[0]] += gslab
            if par_grads is None:
                par_grads = {k: np.asarray(v) for k, v in acc_par.items()}
            else:
                for k in par_grads:
                    par_grads[k] = par_grads[k] + np.asarray(acc_par[k])
            if not bool(more):
                break

    if par_grads is None:
        par_grads = {k: np.zeros_like(np.asarray(v)) for k, v in {
            "factor_emission": 0.0, "factor_absorption": 0.0,
            "factor_reflection": 0.0, "color": np.zeros(3, np.float32),
        }.items()}

    name_of = {"em": "emission", "ab": "absorption", "re": "reflection",
               "gx": "gradient_x", "gy": "gradient_y", "gz": "gradient_z"}
    grads = {name_of[r_]: host_grads[r_] for r_ in roles}
    grads.update(par_grads)
    return grads, out
