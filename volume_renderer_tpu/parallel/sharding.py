"""Image-tile data parallelism over a TPU device mesh.

The reference renderer is strictly single-GPU (one CUDA thread per pixel,
src/C/mex/render.cpp:236-238); its only scale-out story is the manual
multi-pass channel split (SURVEY.md C21). Here, scale-out is first-class:
the pixel grid is sharded across chips with ``shard_map`` over a
``jax.sharding.Mesh`` — each device marches the rays of its own horizontal
image band against a replicated (or brick-sharded, see
``volume_renderer_tpu.parallel.bricks``) scene; the forward pass needs no
communication at all, and gradient reductions ride ICI via ``psum``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from volume_renderer_tpu.models.scene import RenderOptions, Scene
from volume_renderer_tpu.ops.forward import render_rows

try:  # jax >= 0.6 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = RAY_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def _padded_rows(height: int, n_shards: int) -> int:
    return int(math.ceil(height / n_shards)) * n_shards


@partial(jax.jit, static_argnames=("opts", "mesh", "differentiable"))
def render_forward_sharded(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset=0.0,
    *,
    mesh: Mesh,
    differentiable: bool = False,
) -> jnp.ndarray:
    """Forward render with rays sharded across ``mesh``'s single axis.

    Scene is replicated on every device; device i renders rows
    [i * rows_per_shard, (i+1) * rows_per_shard). Returns the full
    (H, W, 3) image (sharded on axis 0 across the mesh).
    """
    (axis_name,) = mesh.axis_names
    n = mesh.devices.size
    padded_h = _padded_rows(opts.height, n)
    rows_per = padded_h // n

    def shard_fn(scene_local, cam_off):
        i = jax.lax.axis_index(axis_name)
        band = render_rows(
            scene_local,
            opts,
            cam_off,
            y_offset=i * rows_per,
            n_rows=rows_per,
            differentiable=differentiable,
        )
        return band

    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(axis_name, None, None),
    )(scene, jnp.float32(camera_x_offset))
    return out[: opts.height]
