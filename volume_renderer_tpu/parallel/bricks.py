"""Voxel-brick sharding: the volume sliced along z across devices.

The reference's only answer to volumes larger than device memory is the
manual multi-pass channel split (SURVEY.md C21) guarded by a VRAM
pre-flight error (mm/mmanager.hxx:144-173). Here the voxel grid itself is
sharded: device b holds z-rows [b*D/B, (b+1)*D/B) of every volume (plus a
2-row halo exchanged with neighbors over ICI via ``ppermute``) and marches
every ray's step-subsequence that falls inside its brick.

This is the sequence/context-parallel analog for rendering (ray depth is
the sequence dimension, SURVEY.md §5 "long-context" row).

Exact early termination without a ring pipeline
-----------------------------------------------
The reference breaks each ray at the first step where accumulated opacity
crosses the threshold (volumeRender_kernel.cu:485-487) — a sequential
dependency across bricks. A ring schedule would respect it at ~50%
pipeline utilization (fill/drain bubbles). Instead the transmittance
algebra gives a fully parallel two-phase scheme:

1. every device marches a TRANSMITTANCE-ONLY pass over its own brick:
   T_b = prod over owned steps of (1 - alpha). T_b does not depend on the
   ray's entry state, so all bricks run concurrently; the pass samples
   only absorption (no shading) and stops early once its local prefix
   falls below (1 - threshold) (the ray then provably dies here).
2. one ``all_gather`` of the (B,) per-ray products lets every device form
   its rays' exact entry opacity w_in = 1 - prod of upstream T's (in each
   ray's own traversal order). Each device then marches its full
   shaded segment from that entry state with the reference's exact
   per-step break (w starts above the threshold for rays that died
   upstream, so they march zero steps), accumulating contributions
   already weighted by the GLOBAL transmittance. The image is the
   ``psum`` of contributions — no ordered recomposition needed.

Exactness caveat: phase 1's "dies here" test and the w_in > threshold
skip assume alpha >= 0 (opacity monotone along the ray), true for any
non-negative absorption volume — the reference's data model. Negative
absorption renders exactly on the single-device paths only.

Backward (``render_fused_bricked``) replays each device's own steps with
the O(1)-memory prefix-dot trick of ops/vjp.py, using one all_gather of
per-brick contribution dots to globalize the prefix, scatter-adds tap
cotangents into the halo-padded local grids, returns halo-row gradients
to their owners with the adjoint ``ppermute``, and ``psum``s parameter
gradients — the voxel-gradient all-reduce overlapped with the backward
march of the north-star contract (BASELINE.json).

Positions use the closed form pos0 + n*step (not the accumulated
pos += step of the single-chip path): ulp-level drift, allclose. The
entry opacity w_in = 1 - prod(T) matches the sequential recurrence
w += (1-w)*alpha algebraically, with the same ulp-level caveat.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from volume_renderer_tpu.models.scene import RenderOptions, Scene
from volume_renderer_tpu.ops import raymarch_core as core
from volume_renderer_tpu.ops.float3 import F3
from volume_renderer_tpu.ops.forward import _init_rays
from volume_renderer_tpu.ops.sampling import (
    sample_trilinear,
    sample_trilinear_zslab,
    trilinear_setup,
)
from volume_renderer_tpu.ops.vjp import merge_scene, split_scene

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

HALO = 2  # rows each side: trilinear needs +-1, OTF gradient taps +-2


def _check_divisible(scene: Scene, n: int) -> None:
    def chk(name, vol):
        # depth-1 volumes (e.g. the facade's Volume(1) reflection
        # default, VolumeRender.m:131) replicate instead of sharding
        if vol is not None and vol.data.shape[0] > 1 \
                and vol.data.shape[0] % n != 0:
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
    if scene.reflection is not None and scene.reflection.data.shape[0] > 1:
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


def _return_halo(padded_grad: jnp.ndarray, axis_name: str, n: int) -> jnp.ndarray:
    """Adjoint of ``_with_halo``: fold halo-row gradients back to owners."""
    send_up = [(i, i + 1) for i in range(n - 1)]
    send_down = [(i + 1, i) for i in range(n - 1)]
    center = padded_grad[HALO:-HALO]
    # my first HALO padded rows hold grads of the PREV device's last rows
    # (and symmetrically for the last rows): each flows back the way the
    # data came in _with_halo. ppermute pairs are (source, dest): the next
    # device's padded[:HALO] are MY last rows -> they arrive via send_down.
    from_next = jax.lax.ppermute(padded_grad[:HALO], axis_name, send_down)
    from_prev = jax.lax.ppermute(padded_grad[-HALO:], axis_name, send_up)
    center = center.at[-HALO:].add(from_next)
    center = center.at[:HALO].add(from_prev)
    return center


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


class _BrickRays:
    """Per-device ray/march geometry shared by all passes."""

    def __init__(self, scene_local, opts, cam_off, axis_name, n, ray_axis, n_rows):
        self.n = n
        self.b = jax.lax.axis_index(axis_name)
        y_offset = 0
        if ray_axis is not None:
            y_offset = jax.lax.axis_index(ray_axis) * n_rows
        (self.consts, self.origin, self.pos0, self.step, self.tnear,
         self.tfar, self.hit) = _init_rays(
            scene_local, opts, cam_off, y_offset=y_offset, n_rows=n_rows)
        self.opts = opts
        c = self.consts
        self.dz = self.step.z / c.tstep
        inv_bz = c.boxscale.z

        def owner_of(pos_z):
            znorm = (pos_z - c.boxmin.z) * inv_bz
            return jnp.clip(jnp.floor(znorm * n).astype(jnp.int32), 0, n - 1)

        self.owner_of = owner_of

        # skip-ahead: first step index whose position can be in this brick
        bf = self.b.astype(jnp.float32)
        z_lo = c.boxmin.z + (c.boxmax.z - c.boxmin.z) * (bf / n)
        z_hi = c.boxmin.z + (c.boxmax.z - c.boxmin.z) * ((bf + 1.0) / n)
        safe_dz = jnp.abs(self.dz) > 1e-12
        t_a = jnp.where(safe_dz, (z_lo - self.origin.z)
                        / jnp.where(safe_dz, self.dz, 1.0), 0.0)
        t_b = jnp.where(safe_dz, (z_hi - self.origin.z)
                        / jnp.where(safe_dz, self.dz, 1.0), 0.0)
        t_enter = jnp.minimum(t_a, t_b)
        n0 = jnp.where(safe_dz,
                       jnp.floor((t_enter - self.tnear) / c.tstep) - 1.0, 0.0)
        self.n0 = jnp.clip(n0, 0.0, float(opts.n_steps)).astype(jnp.int32)

    def pos_at(self, nstep_f):
        return self.pos0 + F3(self.step.x * nstep_f, self.step.y * nstep_f,
                              self.step.z * nstep_f)

    def step_active(self, k):
        """Mask: global step n0+k composites on THIS brick (ignoring the
        opacity break), including the reference's unconditional first step."""
        nstep = self.n0 + k
        nf = nstep.astype(jnp.float32)
        t = self.tnear + self.consts.tstep * nf
        pos_z = self.pos0.z + self.step.z * nf
        owned = self.owner_of(pos_z) == self.b
        act = self.hit & (t <= self.tfar) & owned & (nstep < self.opts.n_steps)
        return act | (self.hit & (nstep == 0) & owned), nf

    def past_brick(self, k):
        nf = (self.n0 + k).astype(jnp.float32)
        t = self.tnear + self.consts.tstep * nf
        pos_z = self.pos0.z + self.step.z * nf
        c = self.consts
        znorm = (pos_z - c.boxmin.z) * c.boxscale.z
        bf = self.b.astype(jnp.float32)
        fwd = (self.dz > 0) & (znorm * self.n > bf + 1.0 + 1e-3)
        bwd = (self.dz < 0) & (znorm * self.n < bf - 1e-3)
        return fwd | bwd | (t > self.tfar) | (self.n0 + k >= self.opts.n_steps)


def _transmittance_pass(rays: _BrickRays, scene_local, samplers, thr):
    """Phase 1: per-ray product of (1 - alpha) over this brick's steps.

    Early-exits once the local prefix falls below (1 - thr): the ray then
    provably terminates inside this brick and downstream values are
    unused (alpha >= 0; see module docstring).
    """
    consts = rays.consts
    floor_t = 1.0 - thr

    def body(carry):
        k, T = carry
        act, nf = rays.step_active(k)
        act = act & (T >= floor_t)
        pos = rays.pos_at(nf)
        sample_pos = core.to_sample_coords(pos, consts)
        ab = samplers.ab(sample_pos)
        alpha = 1.0 - jnp.exp(-(consts.factor_absorption * ab) * consts.tstep)
        T = jnp.where(act, T * (1.0 - alpha), T)
        return (k + 1, T)

    def cond(carry):
        k, T = carry
        return jnp.any(~rays.past_brick(k) & rays.hit & (T >= floor_t))

    ones = jnp.ones_like(rays.tnear)
    _, T = jax.lax.while_loop(cond, body, (jnp.int32(0), ones))
    return T


def _entry_opacity(rays: _BrickRays, T_local, axis_name):
    """Phase 1 -> 2 relay: exact per-ray entry opacity for this brick."""
    T_all = jax.lax.all_gather(T_local, axis_name)  # (n, R)
    n = rays.n
    # prefix product over upstream bricks in each ray's traversal order
    asc = jnp.cumprod(T_all, axis=0)
    desc = jnp.cumprod(T_all[::-1], axis=0)[::-1]
    b = rays.b
    fwdo = rays.dz >= 0
    up_asc = jnp.where(b > 0, asc[jnp.maximum(b - 1, 0)], 1.0)
    up_desc = jnp.where(b < n - 1, desc[jnp.minimum(b + 1, n - 1)], 1.0)
    upstream_T = jnp.where(fwdo, up_asc, up_desc)
    return 1.0 - upstream_T


def _shaded_pass(rays: _BrickRays, scene_local, samplers, w_in, params=None):
    """Phase 2: shaded march from exact entry opacity, exact opacity break.

    Returns (rgb contribution weighted by GLOBAL transmittance, exit w).
    """
    consts = rays.consts
    thr = consts.opacity_threshold
    if params is None:
        params = core.params_of(scene_local, consts)

    zeros = jnp.zeros_like(rays.tnear)

    def body(carry):
        k, rgb, w = carry
        act, nf = rays.step_active(k)
        act = act & (w <= thr)
        pos = rays.pos_at(nf)
        taps = core.gather_taps(scene_local, consts, pos, samplers)
        s_rgb, alpha = core.step_from_taps(
            scene_local, consts, params, taps, pos, rays.origin, samplers)
        tr = 1.0 - w
        rgb = F3(
            jnp.where(act, rgb.x + tr * s_rgb.x, rgb.x),
            jnp.where(act, rgb.y + tr * s_rgb.y, rgb.y),
            jnp.where(act, rgb.z + tr * s_rgb.z, rgb.z),
        )
        w = jnp.where(act, w + tr * alpha, w)
        return (k + 1, rgb, w)

    def cond(carry):
        k, _, w = carry
        return jnp.any(~rays.past_brick(k) & rays.hit & (w <= thr))

    _, rgb, w = jax.lax.while_loop(
        cond, body, (jnp.int32(0), F3(zeros, zeros, zeros), w_in))
    return rgb, w


def _image_of(rgb: F3, n_rows, width):
    return jnp.stack(
        [rgb.x.reshape(n_rows, width),
         rgb.y.reshape(n_rows, width),
         rgb.z.reshape(n_rows, width)],
        axis=-1,
    )


def _mesh_geometry(scene, opts, mesh, axis_name, ray_axis):
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
    return n, n_rows


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

    Matches the single-device render allclose INCLUDING the exact
    opacity-threshold early termination (two-phase transmittance relay;
    module docstring). With a 1-D mesh, rays are replicated and the full
    (H, W, 3) image is returned replicated. With a 2-D mesh and
    ``ray_axis``, image rows are additionally data-parallel.
    """
    n, n_rows = _mesh_geometry(scene, opts, mesh, axis_name, ray_axis)

    def shard_fn(scene_local: Scene, cam_off):
        rays = _BrickRays(scene_local, opts, cam_off, axis_name, n,
                          ray_axis, n_rows)
        samplers = _brick_samplers(scene_local, axis_name, n, rays.b)
        thr = rays.consts.opacity_threshold
        T = _transmittance_pass(rays, scene_local, samplers, thr)
        w_in = _entry_opacity(rays, T, axis_name)
        rgb, _ = _shaded_pass(rays, scene_local, samplers, w_in)
        rgb = jax.lax.psum((rgb.x, rgb.y, rgb.z), axis_name)
        return _image_of(F3(*rgb), n_rows, opts.width)

    specs = _brick_specs(scene, axis_name)
    out_spec = P() if ray_axis is None else P(ray_axis, None, None)
    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=out_spec,
        check_vma=False,
    )(scene, jnp.float32(camera_x_offset))


# ---------------------------------------------------------------------------
# forward with the Pallas kernel per brick
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("opts", "ascending", "wr", "interpret",
                                   "mesh", "axis_name"))
def _bricked_fast(scene: Scene, opts: RenderOptions, cam_off,
                  ascending: bool, wr: int, interpret: bool, *,
                  mesh: Mesh, axis_name: str):
    from volume_renderer_tpu.ops.pallas_march import _launch

    n = mesh.shape[axis_name]
    d_global = int(scene.emission.data.shape[0])
    bd = d_global // n

    def shard_fn(scene_local: Scene, cam):
        b = jax.lax.axis_index(axis_name)
        bf = b.astype(jnp.float32)

        def pad_vol(vol):
            if vol is None:
                return None
            return vol.replace(data=_with_halo(vol.data, axis_name, n))

        scene_pad = scene_local.replace(
            emission=pad_vol(scene_local.emission),
            absorption=pad_vol(scene_local.absorption),
            reflection=pad_vol(scene_local.reflection),
        )
        z_off = bf * bd - HALO
        own_lo = jnp.where(b == 0, jnp.float32(-1e30), jnp.float32(HALO))
        own_hi = jnp.where(b == n - 1, jnp.float32(1e30),
                           jnp.float32(HALO + bd))

        # phase 1: segment transmittance (ww with zero entry opacity;
        # the kernel's threshold mask IS the provably-dies early exit)
        _, ww1, ovf1, ok1 = _launch(
            scene_pad, opts, cam, "z", ascending, wr, interpret,
            brick=(d_global, z_off, own_lo, own_hi, None))
        t_local = 1.0 - ww1

        # relay: exact entry opacity from the upstream product in the
        # (uniform, dir_ok-guaranteed) traversal order
        t_all = jax.lax.all_gather(t_local, axis_name)  # (n, H, W)
        if ascending:
            up = jnp.where(b > 0, jnp.cumprod(t_all, axis=0)[
                jnp.maximum(b - 1, 0)], 1.0)
        else:
            up = jnp.where(b < n - 1, jnp.cumprod(t_all[::-1], axis=0)[
                ::-1][jnp.minimum(b + 1, n - 1)], 1.0)
        w_in = 1.0 - up

        # phase 2: shaded segment from the exact entry state; the global
        # transmittance weighting makes the psum the final image
        img, _, ovf2, ok2 = _launch(
            scene_pad, opts, cam, "z", ascending, wr, interpret,
            brick=(d_global, z_off, own_lo, own_hi, w_in))
        img = jax.lax.psum(img, axis_name)
        ovf = (ovf1 | ovf2).reshape(1)
        ok = (ok1 & ok2).reshape(1)
        return img, ovf, ok

    specs = _brick_specs(scene, axis_name)
    img, ovf, ok = shard_map(
        shard_fn, mesh=mesh, in_specs=(specs, P()),
        out_specs=(P(), P(axis_name), P(axis_name)),
        check_vma=False,
    )(scene, jnp.float32(cam_off))
    return img, jnp.any(ovf), jnp.all(ok)


def render_forward_bricked_fast(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset=0.0,
    *,
    mesh: Mesh,
    axis_name: str = "bricks",
    interpret=None,
):
    """Brick-sharded forward with the Pallas march per brick.

    Each device sweeps its halo-padded z-brick with the production
    kernel; the two-phase transmittance relay (module docstring) keeps
    the reference's exact opacity break. Host-driven: falls back to the
    XLA ``render_forward_bricked`` off the kernel envelope (lighting,
    non-z principal axis, wide fov, window overflow).
    """
    import jax as _jax

    from volume_renderer_tpu.ops.pallas_march import (
        _note_fallback,
        choose_sweep_axis,
        unsupported_reason,
    )

    if interpret is None:
        interpret = _jax.default_backend() == "cpu"

    n, _ = _mesh_geometry(scene, opts, mesh, axis_name, None)

    def fallback():
        return render_forward_bricked(
            scene, opts, camera_x_offset, mesh=mesh, axis_name=axis_name)

    reason = unsupported_reason(scene, opts)
    if reason is None and scene.has_lighting:
        reason = "lighting (the brick kernel mode is lighting-off only)"
    if reason is None and scene.emission.data.shape[0] // n < 2:
        reason = "brick depth < 2 slices"
    axis, ascending = choose_sweep_axis(scene)
    if reason is None and axis != "z":
        reason = f"principal axis {axis} != brick axis z"
    if reason is not None:
        _note_fallback(reason)
        return fallback()

    for wr in (64, 128):
        img, ovf, ok = _bricked_fast(
            scene, opts, jnp.float32(camera_x_offset), ascending, wr,
            bool(interpret), mesh=mesh, axis_name=axis_name)
        if not bool(ok):
            _note_fallback("degenerate sweep direction")
            return fallback()
        if not bool(ovf):
            _note_fallback(None)
            return img
    _note_fallback("tile sample footprint overflowed the 128-row window")
    return fallback()


@partial(jax.jit, static_argnames=("opts", "ascending", "wr", "interpret",
                                   "mesh", "axis_name"))
def _bricked_grads_fast(scene: Scene, opts: RenderOptions, cam_off,
                        ascending: bool, wr: int, interpret: bool,
                        g_img, *, mesh: Mesh, axis_name: str):
    """Brick-sharded fwd+bwd with the kernel per brick.

    Three kernel sweeps per brick: transmittance (relay in), shaded
    segment (own image -> global image + the upstream contribution-dot
    relay), and the grad replay + in-kernel scatter seeded with the
    relay's entry opacity and upstream prefix-dot — the same globalized
    prefix trick as the XLA _bricked_fused_bwd, at kernel speed. Halo
    gradient rows fold back to their owners with the adjoint ppermute;
    parameter gradients psum.
    """
    from volume_renderer_tpu.ops.pallas_march import _launch

    n = mesh.shape[axis_name]
    d_global = int(scene.emission.data.shape[0])
    bd = d_global // n

    def shard_fn(scene_local: Scene, cam, g_l):
        b = jax.lax.axis_index(axis_name)
        bf = b.astype(jnp.float32)

        def pad_vol(vol):
            if vol is None:
                return None
            return vol.replace(data=_with_halo(vol.data, axis_name, n))

        scene_pad = scene_local.replace(
            emission=pad_vol(scene_local.emission),
            absorption=pad_vol(scene_local.absorption),
            reflection=pad_vol(scene_local.reflection),
        )
        z_off = bf * bd - HALO
        own_lo = jnp.where(b == 0, jnp.float32(-1e30), jnp.float32(HALO))
        own_hi = jnp.where(b == n - 1, jnp.float32(1e30),
                           jnp.float32(HALO + bd))
        geo = (d_global, z_off, own_lo, own_hi)

        _, ww1, ovf1, ok1 = _launch(
            scene_pad, opts, cam, "z", ascending, wr, interpret,
            brick=geo + (None,))
        t_all = jax.lax.all_gather(1.0 - ww1, axis_name)
        if ascending:
            up_t = jnp.where(b > 0, jnp.cumprod(t_all, axis=0)[
                jnp.maximum(b - 1, 0)], 1.0)
        else:
            up_t = jnp.where(b < n - 1, jnp.cumprod(t_all[::-1], axis=0)[
                ::-1][jnp.minimum(b + 1, n - 1)], 1.0)
        w_in = 1.0 - up_t

        img_own, _, ovf2, ok2 = _launch(
            scene_pad, opts, cam, "z", ascending, wr, interpret,
            brick=geo + (w_in,))
        out_global = jax.lax.psum(img_own, axis_name)

        dot_own = jnp.sum(g_l * img_own, axis=-1)
        dots = jax.lax.all_gather(dot_own, axis_name)
        if ascending:
            up_dot = jnp.where(b > 0, jnp.cumsum(dots, axis=0)[
                jnp.maximum(b - 1, 0)], 0.0)
        else:
            up_dot = jnp.where(b < n - 1, jnp.cumsum(dots[::-1], axis=0)[
                ::-1][jnp.minimum(b + 1, n - 1)], 0.0)

        (d_em_p, d_ab_p, d_fem, d_fab, d_col, _extras, ovf3,
         ok3) = _launch(
            scene_pad, opts, cam, "z", ascending, wr, interpret,
            grad_inputs=(g_l, out_global), scatter=True,
            brick=geo + (w_in, up_dot))

        h_, w_ = scene_local.emission.data.shape[1:]
        d_em = _return_halo(d_em_p[:, :h_, :w_], axis_name, n)
        if d_ab_p is not None:
            d_ab = _return_halo(d_ab_p[:, :h_, :w_], axis_name, n)
        else:  # aliased: placeholder keeps the shard_map output static
            d_ab = jnp.zeros_like(d_em)
        d_fem = jax.lax.psum(d_fem, axis_name)
        d_fab = jax.lax.psum(d_fab, axis_name)
        d_col = jax.lax.psum(d_col, axis_name)
        ovf = (ovf1 | ovf2 | ovf3).reshape(1)
        ok = (ok1 & ok2 & ok3).reshape(1)
        return out_global, d_em, d_ab, d_fem, d_fab, d_col, ovf, ok

    specs = _brick_specs(scene, axis_name)
    vol_spec = P(axis_name, None, None)
    outs = shard_map(
        shard_fn, mesh=mesh, in_specs=(specs, P(), P()),
        out_specs=(P(), vol_spec, vol_spec, P(), P(), P(),
                   P(axis_name), P(axis_name)),
        check_vma=False,
    )(scene, jnp.float32(cam_off), jnp.asarray(g_img, jnp.float32))
    out, d_em, d_ab, d_fem, d_fab, d_col, ovf, ok = outs
    return (out, d_em, d_ab, d_fem, d_fab, d_col,
            jnp.any(ovf), jnp.all(ok))


def voxel_grads_bricked_fast(
    scene: Scene,
    opts: RenderOptions,
    g,
    camera_x_offset=0.0,
    *,
    mesh: Mesh,
    axis_name: str = "bricks",
    interpret=None,
):
    """Kernel-speed brick-sharded backward: (image, grads dict) like
    ops.pallas_march.voxel_grads_fast, with the voxel grids z-sharded
    across the mesh (gradients returned sharded the same way) and
    parameter gradients psum-ed. Falls back to jax.vjp of the XLA
    render_fused_bricked off the kernel envelope.
    """
    import jax as _jax

    from volume_renderer_tpu.ops.pallas_march import (
        _note_fallback,
        choose_sweep_axis,
        unsupported_reason,
    )

    if interpret is None:
        interpret = _jax.default_backend() == "cpu"
    n, _ = _mesh_geometry(scene, opts, mesh, axis_name, None)

    def fallback():
        diff, template = split_scene(scene)

        def forward(d):
            return render_fused_bricked(
                merge_scene(template, d), opts, camera_x_offset,
                mesh=mesh, axis_name=axis_name)

        img, vjp_fn = _jax.vjp(forward, diff)
        return img, vjp_fn(jnp.asarray(g, jnp.float32))[0]

    reason = unsupported_reason(scene, opts, grads=True)
    if reason is None and scene.emission.data.shape[0] // n < 2:
        reason = "brick depth < 2 slices"
    axis, ascending = choose_sweep_axis(scene)
    if reason is None and axis != "z":
        reason = f"principal axis {axis} != brick axis z"
    if reason is not None:
        _note_fallback(reason)
        return fallback()

    for wr in (64, 128):
        (out, d_em, d_ab, d_fem, d_fab, d_col, ovf, ok) = _bricked_grads_fast(
            scene, opts, jnp.float32(camera_x_offset), ascending, wr,
            bool(interpret), g, mesh=mesh, axis_name=axis_name)
        if not bool(ok):
            _note_fallback("degenerate sweep direction")
            return fallback()
        if bool(ovf):
            continue
        _note_fallback(None)
        grads = {
            "emission": d_em,
            "factor_emission": d_fem,
            "factor_absorption": d_fab,
            "factor_reflection": jnp.float32(0.0),
            "color": d_col,
        }
        if not scene.absorption_aliased:
            grads["absorption"] = d_ab
        if not scene.reflection_aliased:
            grads["reflection"] = jnp.zeros(
                scene.reflection.data.shape, jnp.float32)
        return out, grads
    _note_fallback("tile sample footprint overflowed the 128-row window")
    return fallback()


def train_step_fast_bricked(
    params,
    opt_state,
    scene: Scene,
    opts: RenderOptions,
    target,
    optimizer,
    *,
    mesh: Mesh,
    axis_name: str = "bricks",
    camera_x_offset: float = 0.0,
):
    """Brick-sharded training step at kernel speed (SSE loss): the
    voxel grids stay z-sharded across the mesh end to end — forward,
    in-kernel scatter backward, halo-returned gradients, optimizer
    update on the sharded grids. The huge-volume training analog of
    pallas_dp.train_step_fast_sharded. Returns (params, opt_state,
    loss); falls back inside voxel_grads_bricked_fast off the envelope.
    """
    import optax

    from volume_renderer_tpu import train

    merged = train.merge_params(params, scene)
    tgt = jnp.asarray(target, jnp.float32)
    # the cotangent needs the image first; voxel_grads_bricked_fast
    # renders internally, so one extra forward is avoided by computing g
    # from its own returned image in a second call — instead we accept
    # the standard two-sweep structure: render, then grads with g
    img = render_forward_bricked_fast(
        merged, opts, camera_x_offset, mesh=mesh, axis_name=axis_name)
    resid = img - tgt
    loss = jnp.sum(resid ** 2)
    _, grads_all = voxel_grads_bricked_fast(
        merged, opts, 2.0 * resid, camera_x_offset, mesh=mesh,
        axis_name=axis_name)
    grads = {k: grads_all[k] for k in params}
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


# ---------------------------------------------------------------------------
# backward: fused render over bricks (custom VJP)
# ---------------------------------------------------------------------------


def _scatter_meta_zslab(slab_shape, z_offset, full_d, coords: F3):
    """Adjoint metadata of ``sample_trilinear_zslab``: flat indices into the
    halo-padded local slab + trilinear weights, mirroring its clamping."""
    slab_d, h, w = slab_shape
    i0, i1, fx, fy, fz = trilinear_setup((full_d, h, w), coords)
    z0 = jnp.clip(i0.z - z_offset, 0, slab_d - 1)
    z1 = jnp.clip(i1.z - z_offset, 0, slab_d - 1)
    sy, sz = w, w * h

    def flat(ix, iy, iz):
        return ix + iy * sy + iz * sz

    idx = jnp.stack(
        [
            flat(i0.x, i0.y, z0), flat(i1.x, i0.y, z0),
            flat(i0.x, i1.y, z0), flat(i1.x, i1.y, z0),
            flat(i0.x, i0.y, z1), flat(i1.x, i0.y, z1),
            flat(i0.x, i1.y, z1), flat(i1.x, i1.y, z1),
        ],
        axis=-1,
    )
    gx0, gx1 = 1.0 - fx, fx
    gy0, gy1 = 1.0 - fy, fy
    gz0, gz1 = 1.0 - fz, fz
    wgt = jnp.stack(
        [
            gx0 * gy0 * gz0, gx1 * gy0 * gz0, gx0 * gy1 * gz0, gx1 * gy1 * gz0,
            gx0 * gy0 * gz1, gx1 * gy0 * gz1, gx0 * gy1 * gz1, gx1 * gy1 * gz1,
        ],
        axis=-1,
    )
    return idx, wgt


def _scatter_add(flat_grad, meta, d_val):
    idx, wgt = meta
    return flat_grad.at[idx.reshape(-1)].add((wgt * d_val[..., None]).reshape(-1))


def render_fused_bricked(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset: float = 0.0,
    *,
    mesh: Mesh,
    axis_name: str = "bricks",
    ray_axis: str = None,
) -> jnp.ndarray:
    """Differentiable brick-sharded render (drop-in for render_fused).

    Forward: the exact two-phase bricked march. Backward: per-device
    O(1)-memory replay of its OWN steps with globally-correct cotangents
    (one all_gather of per-brick contribution dots globalizes the
    prefix), scatter-add into halo-padded local grids, adjoint halo
    exchange, psum of parameter gradients.
    """
    diff, template = split_scene(scene)
    return _bricked_fused(diff, template, jnp.float32(camera_x_offset),
                          opts, mesh, axis_name, ray_axis)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _bricked_fused(diff, template, cam_off, opts, mesh, axis_name, ray_axis):
    scene = merge_scene(template, diff)
    return render_forward_bricked(
        scene, opts, cam_off, mesh=mesh, axis_name=axis_name, ray_axis=ray_axis)


def _bricked_fused_fwd(diff, template, cam_off, opts, mesh, axis_name, ray_axis):
    out = _bricked_fused(diff, template, cam_off, opts, mesh, axis_name, ray_axis)
    return out, (diff, template, cam_off, out)


def _bricked_fused_bwd(opts, mesh, axis_name, ray_axis, residuals, g):
    diff, template, cam_off, out = residuals
    scene = merge_scene(template, diff)
    n, n_rows = _mesh_geometry(scene, opts, mesh, axis_name, ray_axis)
    lighting = scene.has_lighting
    lookup = scene.has_gradient_volumes

    def shard_fn(scene_local: Scene, cam_off_, out_local, g_local):
        rays = _BrickRays(scene_local, opts, cam_off_, axis_name, n,
                          ray_axis, n_rows)
        consts = rays.consts
        thr = consts.opacity_threshold
        samplers = _brick_samplers(scene_local, axis_name, n, rays.b)
        params = core.params_of(scene_local, consts)

        T = _transmittance_pass(rays, scene_local, samplers, thr)
        w_in = _entry_opacity(rays, T, axis_name)

        r = n_rows * opts.width
        g_flat = g_local.reshape(r, 3)
        g3 = F3(g_flat[:, 0], g_flat[:, 1], g_flat[:, 2])
        out_flat = out_local.reshape(r, 3)
        total_dot = (g_flat[:, 0] * out_flat[:, 0]
                     + g_flat[:, 1] * out_flat[:, 1]
                     + g_flat[:, 2] * out_flat[:, 2])

        # own contribution's dot with g: replay values only (phase 2 again)
        rgb_own, _ = _shaded_pass(rays, scene_local, samplers, w_in, params)
        dot_own = g3.x * rgb_own.x + g3.y * rgb_own.y + g3.z * rgb_own.z
        dots = jax.lax.all_gather(dot_own, axis_name)  # (n, R)
        asc = jnp.cumsum(dots, axis=0)
        desc = jnp.cumsum(dots[::-1], axis=0)[::-1]
        b = rays.b
        fwdo = rays.dz >= 0
        up_asc = jnp.where(b > 0, asc[jnp.maximum(b - 1, 0)], 0.0)
        up_desc = jnp.where(b < n - 1, desc[jnp.minimum(b + 1, n - 1)], 0.0)
        upstream_dot = jnp.where(fwdo, up_asc, up_desc)

        # slab scatter geometry per role
        def slab_geom(local_data):
            full_d = local_data.shape[0] * n
            bd = full_d // n
            z_offset = rays.b * bd - HALO
            shape = (bd + 2 * HALO, local_data.shape[1], local_data.shape[2])
            return shape, z_offset, full_d

        em_geom = slab_geom(scene_local.emission.data)
        ab_geom = em_geom if scene_local.absorption_aliased else slab_geom(
            scene_local.absorption.data)
        re_geom = None
        if lighting and not scene_local.reflection_aliased:
            re_geom = slab_geom(scene_local.reflection.data)
        grad_geoms = None
        if lookup:
            grad_geoms = tuple(
                slab_geom(getattr(scene_local, k).data)
                for k in ("gradient_x", "gradient_y", "gradient_z"))

        def nelem(geom):
            s = geom[0]
            return int(s[0]) * int(s[1]) * int(s[2])

        vzero = jnp.sum(g_flat) * 0.0
        acc0 = {
            "emission": jnp.zeros(nelem(em_geom), jnp.float32) + vzero,
            "factor_emission": jnp.float32(0) + vzero,
            "factor_absorption": jnp.float32(0) + vzero,
            "factor_reflection": jnp.float32(0) + vzero,
            "color": jnp.zeros(3, jnp.float32) + vzero,
        }
        if not scene_local.absorption_aliased:
            acc0["absorption"] = jnp.zeros(nelem(ab_geom), jnp.float32) + vzero
        if lighting and not scene_local.reflection_aliased:
            acc0["reflection"] = jnp.zeros(nelem(re_geom), jnp.float32) + vzero
        if lighting:
            acc0["light_colors"] = jnp.zeros_like(scene_local.light_colors) + vzero
        if lookup:
            for key, geom in zip(("gradient_x", "gradient_y", "gradient_z"),
                                 grad_geoms):
                acc0[key] = jnp.zeros(nelem(geom), jnp.float32) + vzero

        def body(carry):
            k, w, prefix_local, acc = carry
            act, nf = rays.step_active(k)
            act = act & (w <= thr)
            pos = rays.pos_at(nf)
            taps = core.gather_taps(scene_local, consts, pos, samplers)

            def f(taps_, params_):
                return core.step_from_taps(
                    scene_local, consts, params_, taps_, pos, rays.origin,
                    samplers)

            (s_rgb, alpha), vjp_fn = jax.vjp(f, taps, params)

            tr = 1.0 - w
            contrib_dot = tr * (g3.x * s_rgb.x + g3.y * s_rgb.y + g3.z * s_rgb.z)
            prefix_local = prefix_local + jnp.where(act, contrib_dot, 0.0)
            prefix_global = upstream_dot + prefix_local

            d_s = F3(
                jnp.where(act, g3.x * tr, 0.0),
                jnp.where(act, g3.y * tr, 0.0),
                jnp.where(act, g3.z * tr, 0.0),
            )
            one_m_a = 1.0 - alpha
            safe = act & (one_m_a > 0.0)
            d_alpha = jnp.where(
                safe,
                -(total_dot - prefix_global)
                / jnp.where(one_m_a > 0.0, one_m_a, 1.0),
                0.0,
            )

            d_taps, d_params = vjp_fn((d_s, d_alpha))

            sample_pos = core.to_sample_coords(pos, consts)
            em_meta = _scatter_meta_zslab(*em_geom, sample_pos)
            acc = dict(acc)
            acc["emission"] = _scatter_add(acc["emission"], em_meta, d_taps.em)
            if scene_local.absorption_aliased:
                acc["emission"] = _scatter_add(acc["emission"], em_meta, d_taps.ab)
            else:
                ab_meta = _scatter_meta_zslab(*ab_geom, sample_pos)
                acc["absorption"] = _scatter_add(acc["absorption"], ab_meta,
                                                 d_taps.ab)
            if lighting:
                if scene_local.reflection_aliased:
                    acc["emission"] = _scatter_add(acc["emission"], em_meta,
                                                   d_taps.re)
                else:
                    re_meta = _scatter_meta_zslab(*re_geom, sample_pos)
                    acc["reflection"] = _scatter_add(acc["reflection"], re_meta,
                                                     d_taps.re)
                if lookup:
                    for key, geom, dval in zip(
                            ("gradient_x", "gradient_y", "gradient_z"),
                            grad_geoms, d_taps.grad_taps):
                        meta = _scatter_meta_zslab(*geom, sample_pos)
                        acc[key] = _scatter_add(acc[key], meta, dval)
                else:
                    for p_, dval in zip(
                            core.otf_tap_positions(pos, consts),
                            d_taps.grad_taps):
                        meta = _scatter_meta_zslab(*em_geom, p_)
                        acc["emission"] = _scatter_add(acc["emission"], meta, dval)

            acc["factor_emission"] = acc["factor_emission"] + d_params.factor_emission
            acc["factor_absorption"] = (acc["factor_absorption"]
                                        + d_params.factor_absorption)
            acc["factor_reflection"] = (acc["factor_reflection"]
                                        + d_params.factor_reflection)
            acc["color"] = acc["color"] + jnp.stack(
                [d_params.color.x, d_params.color.y, d_params.color.z])
            if lighting:
                acc["light_colors"] = acc["light_colors"] + d_params.light_colors

            new_w = w + tr * alpha
            w = jnp.where(act, new_w, w)
            return (k + 1, w, prefix_local, acc)

        def cond(carry):
            k, w, _, _ = carry
            return jnp.any(~rays.past_brick(k) & rays.hit & (w <= thr))

        _, _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), w_in, jnp.zeros_like(w_in), acc0))

        # fold halo-row gradients back to their owning bricks, strip halos
        def fold(flat_grad, geom, local_shape):
            padded = flat_grad.reshape(geom[0])
            return _return_halo(padded, axis_name, n).reshape(local_shape)

        d_diff = {
            "emission": fold(acc["emission"], em_geom,
                             scene_local.emission.data.shape),
            "factor_emission": jax.lax.psum(acc["factor_emission"], axis_name),
            "factor_absorption": jax.lax.psum(acc["factor_absorption"], axis_name),
            "factor_reflection": jax.lax.psum(acc["factor_reflection"], axis_name),
            "color": jax.lax.psum(acc["color"], axis_name),
        }
        if "absorption" in diff:
            d_diff["absorption"] = fold(acc["absorption"], ab_geom,
                                        scene_local.absorption.data.shape)
        if "reflection" in diff:
            if "reflection" in acc:
                d_diff["reflection"] = fold(acc["reflection"], re_geom,
                                            scene_local.reflection.data.shape)
            else:
                d_diff["reflection"] = jnp.zeros(
                    scene_local.reflection.data.shape, jnp.float32)
        if lighting:
            d_diff["light_colors"] = jax.lax.psum(acc["light_colors"], axis_name)
        if lookup:
            for key, geom in zip(("gradient_x", "gradient_y", "gradient_z"),
                                 grad_geoms):
                d_diff[key] = fold(acc[key], geom,
                                   getattr(scene_local, key).data.shape)

        # ray-axis replicas each saw only their rows; params need that sum too
        if ray_axis is not None:
            for key in ("factor_emission", "factor_absorption",
                        "factor_reflection", "color", "light_colors"):
                if key in d_diff:
                    d_diff[key] = jax.lax.psum(d_diff[key], ray_axis)
        return d_diff

    specs = _brick_specs(scene, axis_name)
    img_spec = P() if ray_axis is None else P(ray_axis, None, None)

    # output gradient specs mirror the diff dict's sharding
    d_specs = {}
    for key in diff:
        if key in ("emission", "absorption", "reflection",
                   "gradient_x", "gradient_y", "gradient_z"):
            d_specs[key] = P(axis_name, None, None)
        else:
            d_specs[key] = P()

    d_diff = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(specs, P(), img_spec, img_spec),
        out_specs=d_specs,
        check_vma=False,
    )(scene, jnp.float32(cam_off), out, g)

    d_template = jax.tree.map(jnp.zeros_like, template)
    return (d_diff, d_template, jnp.zeros_like(residuals[2]))


_bricked_fused.defvjp(_bricked_fused_fwd, _bricked_fused_bwd)
