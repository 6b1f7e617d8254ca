"""Rays-DP over a device mesh with the Pallas march kernel per shard.

Round-3 multi-chip paths marched with the flat XLA kernel — scaling a
~100x-too-slow per-chip engine. Here each device renders its own
TILE-aligned horizontal image band through the tiled Pallas march
(ops/pallas_march._launch with ``band=(axis_index * rows, rows)``), so
the per-chip engine inside ``shard_map`` IS the production kernel:

- forward: no communication at all (bands concatenate);
- backward: each shard replays its band with the in-kernel MXU one-hot
  scatter and the voxel/parameter gradients are ``psum``-ed across the
  mesh — the all-reduce rides ICI.

The kernel's envelope checks stay host-driven OUTSIDE shard_map: the
sweep-direction test and the window-overflow flags come back as shard
outputs, and the wrapper falls back to the XLA paths
(parallel.sharding.render_forward_sharded / train_step_sharded) exactly
like the single-chip wrappers do.

Reference anchor: the reference is single-GPU (one thread per pixel,
src/C/mex/render.cpp:236-238); this subsystem realizes the BASELINE.json
north star ("image tiles and rays sharded across a multi-host TPU pod
slice ... parameter gradients all-reduced").
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from volume_renderer_tpu.models.scene import RenderOptions, Scene
from volume_renderer_tpu.ops.pallas_march import (
    TILE,
    _launch,
    _note_fallback,
    choose_sweep_axis,
    unsupported_reason,
)

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _band_rows(height: int, n: int) -> int:
    return int(math.ceil(math.ceil(height / n) / TILE)) * TILE


@partial(jax.jit, static_argnames=("opts", "axis", "ascending", "wr",
                                   "interpret", "mesh"))
def _forward_sharded(scene: Scene, opts: RenderOptions, cam_off,
                     axis: str, ascending: bool, wr: int, interpret: bool,
                     *, mesh: Mesh):
    (axis_name,) = mesh.axis_names
    n = mesh.devices.size
    rows = _band_rows(opts.height, n)

    def shard_fn(scene_l, cam):
        i = jax.lax.axis_index(axis_name)
        img, ovf, dir_ok = _launch(
            scene_l, opts, cam, axis, ascending, wr, interpret,
            band=(i * rows, rows))
        return img, ovf.reshape(1), dir_ok.reshape(1)

    img, ovf, dir_ok = shard_map(
        shard_fn, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P(axis_name, None, None), P(axis_name), P(axis_name)),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )(scene, jnp.float32(cam_off))
    return img[: opts.height], jnp.any(ovf), jnp.all(dir_ok)


def _psum_chunked(grid, axis_name, n_chunks: int = 4):
    """psum a (D, H, W) gradient grid in ``n_chunks`` z-chunks.

    Equivalent to one ``psum`` (allclose exactly: same adds, same order
    per element); emitting several smaller collectives lets them
    pipeline on ICI. See the call-site note.
    """
    d = grid.shape[0]
    n = min(n_chunks, d)
    bounds = [round(i * d / n) for i in range(n + 1)]
    parts = [jax.lax.psum(grid[bounds[i]:bounds[i + 1]], axis_name)
             for i in range(n)]
    return jnp.concatenate(parts, axis=0)


@partial(jax.jit, static_argnames=("opts", "axis", "ascending", "wr",
                                   "interpret", "mesh"))
def _voxel_grads_sharded(scene: Scene, opts: RenderOptions, cam_off,
                         axis: str, ascending: bool, wr: int,
                         interpret: bool, g_img, out_img, *, mesh: Mesh):
    (axis_name,) = mesh.axis_names
    n = mesh.devices.size
    rows = _band_rows(opts.height, n)
    pad = rows * n - opts.height
    gp = jnp.pad(g_img, ((0, pad), (0, 0), (0, 0)))
    op = jnp.pad(out_img, ((0, pad), (0, 0), (0, 0)))

    def shard_fn(scene_l, cam, g_band, out_band):
        i = jax.lax.axis_index(axis_name)
        d_em, d_ab, d_fem, d_fab, d_col, extras, ovf, dir_ok = _launch(
            scene_l, opts, cam, axis, ascending, wr, interpret,
            grad_inputs=(g_band, out_band), scatter=True,
            band=(i * rows, rows))
        # Grid-sized all-reduces go out in z-chunks, not one monolith:
        # XLA lowers each chunk to its own async collective, so on a
        # real pod chunk i's ICI transfer overlaps chunk i+1's
        # reduce-combine (and any remaining backward epilogue) instead
        # of serializing one grid-sized all-reduce at the very end —
        # the "all-reduced overlapped with the backward ray-march"
        # clause of BASELINE.json:5, to the extent a single
        # pallas_call backward permits (the kernel must complete before
        # its outputs exist; the overlap is across the chunked
        # collectives and the rest of the step's tail).
        d_em = _psum_chunked(d_em, axis_name)
        d_ab = (_psum_chunked(d_ab, axis_name)
                if d_ab is not None else None)
        d_fem = jax.lax.psum(d_fem, axis_name)
        d_fab = jax.lax.psum(d_fab, axis_name)
        d_col = jax.lax.psum(d_col, axis_name)
        del extras  # rays-DP serves lighting-off scenes (lit scenes fall
        # back before reaching here); no lit extras to reduce
        return (d_em, d_ab, d_fem, d_fab, d_col, ovf.reshape(1),
                dir_ok.reshape(1))

    outs = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(axis_name, None, None),
                  P(axis_name, None, None)),
        out_specs=(P(), P(), P(), P(), P(), P(axis_name), P(axis_name)),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )(scene, jnp.float32(cam_off), gp, op)
    d_em, d_ab, d_fem, d_fab, d_col, ovf, dir_ok = outs
    return d_em, d_ab, d_fem, d_fab, d_col, jnp.any(ovf), jnp.all(dir_ok)


def render_forward_fast_sharded(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset: float = 0.0,
    *,
    mesh: Mesh,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Rays-DP forward render, Pallas kernel per shard, XLA fallback.

    Host-driven like render_forward_fast (reads the envelope flags
    concretely); the fallback is parallel.sharding.render_forward_sharded
    so a fallback render is still sharded.
    """
    from volume_renderer_tpu.parallel.sharding import render_forward_sharded

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    reason = unsupported_reason(scene, opts)
    if reason is not None:
        _note_fallback(reason)
        return render_forward_sharded(scene, opts, camera_x_offset,
                                      mesh=mesh)
    axis, ascending = choose_sweep_axis(scene)
    for wr in (64, 128):
        img, ovf, dir_ok = _forward_sharded(
            scene, opts, jnp.float32(camera_x_offset), axis, ascending,
            wr, bool(interpret), mesh=mesh)
        if not bool(dir_ok):
            _note_fallback("degenerate sweep direction")
            return render_forward_sharded(scene, opts, camera_x_offset,
                                          mesh=mesh)
        if not bool(ovf):
            _note_fallback(None)
            return img
    _note_fallback("tile sample footprint overflowed the 128-row window")
    return render_forward_sharded(scene, opts, camera_x_offset, mesh=mesh)


def train_step_fast_sharded(
    params,
    opt_state,
    scene: Scene,
    opts: RenderOptions,
    target,
    optimizer,
    *,
    mesh: Mesh,
    camera_x_offset: float = 0.0,
    interpret: Optional[bool] = None,
):
    """Rays-DP training step with the Pallas kernel fwd+bwd per shard
    and psum-ed voxel/parameter gradients (BASELINE.json: "parameter
    gradients all-reduced"). SSE loss; falls back to the replay-based
    train_step_sharded off the kernel envelope. Returns
    (params, opt_state, loss).
    """
    import optax

    from volume_renderer_tpu import train
    from volume_renderer_tpu.ops.pallas_march import pallas_supported

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    merged = train.merge_params(params, scene)
    if not pallas_supported(merged, opts, grads=True):
        return train.train_step_sharded(
            params, opt_state, scene, opts, jnp.asarray(target), optimizer,
            mesh=mesh)

    img = render_forward_fast_sharded(
        merged, opts, camera_x_offset, mesh=mesh, interpret=interpret)
    resid = img - jnp.asarray(target, jnp.float32)
    loss = jnp.sum(resid ** 2)
    g = 2.0 * resid

    axis, ascending = choose_sweep_axis(merged)
    d_em = None
    for wr in (64, 128):
        d_em, d_ab, d_fem, d_fab, d_col, ovf, dir_ok = _voxel_grads_sharded(
            merged, opts, jnp.float32(camera_x_offset), axis, ascending,
            wr, bool(interpret), g, img, mesh=mesh)
        if not bool(dir_ok) or bool(ovf):
            d_em = None
            continue
        break
    if d_em is None:
        return train.train_step_sharded(
            params, opt_state, scene, opts, jnp.asarray(target), optimizer,
            mesh=mesh)

    grads_all = {
        "emission": d_em,
        "factor_emission": d_fem,
        "factor_absorption": d_fab,
        "factor_reflection": jnp.float32(0.0),
        "color": d_col,
    }
    if d_ab is not None:
        grads_all["absorption"] = d_ab
    grads = {k: grads_all[k] for k in params}
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
