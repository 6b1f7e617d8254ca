"""Camera ray generation and ray-box intersection.

Exact reference semantics:

- Ray generation (reference src/C/vr/volumeRender_kernel.cu:388-413):
    u = (x / W) * 2 - 1
    ratio = H / W
    v = (y / H) * 2 * ratio - ratio
    origin = cameraXOffset * xVec - objectDistance * zVec
    dir = normalize(u * normalize(xVec) + v * yVec + focalLength * zVec)
  Note the asymmetry: only xVec is re-normalized (replicated deliberately).

- Slab-method AABB intersection (reference
  src/C/vr/volumeRender_kernel.cu:155-199, Williams et al. 2005). The
  branch cascade is replicated so the hit predicate matches bitwise.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from volume_renderer_tpu.ops.float3 import F3, Array, normalize


def generate_rays(
    width: int,
    height: int,
    x_vec: F3,
    y_vec: F3,
    z_vec: F3,
    camera_x_offset,
    focal_length,
    object_distance,
    pixel_x: Array,
    pixel_y: Array,
) -> Tuple[F3, F3]:
    """Eye rays for integer pixel coords (pixel_x, pixel_y), SoA.

    Returns (origin, direction); origin components broadcast to pixel shape.
    """
    u = (pixel_x.astype(jnp.float32) / jnp.float32(width)) * 2.0 - 1.0
    ratio = jnp.float32(height) / jnp.float32(width)
    v = (pixel_y.astype(jnp.float32) / jnp.float32(height)) * 2.0 * ratio - 1.0 * ratio

    origin = camera_x_offset * x_vec + (-1.0 * object_distance) * z_vec

    xn = normalize(x_vec)
    direction = normalize(
        F3(
            u * xn.x + v * y_vec.x + focal_length * z_vec.x,
            u * xn.y + v * y_vec.y + focal_length * z_vec.y,
            u * xn.z + v * y_vec.z + focal_length * z_vec.z,
        )
    )
    return origin, direction


def intersect_box(
    origin: F3, direction: F3, boxmin: F3, boxmax: F3
) -> Tuple[Array, Array, Array]:
    """Slab intersection; returns (hit, tnear, tfar).

    Replicates the sign-indexed cascade of the reference. With IEEE floats
    and no NaNs this is equivalent to tnear = max of per-axis mins,
    tfar = min of per-axis maxes, hit = all pairwise checks pass.
    """
    inv_x = 1.0 / direction.x
    inv_y = 1.0 / direction.y
    inv_z = 1.0 / direction.z

    # parameters[sign] selects boxmin when inv >= 0 else boxmax
    tx_lo = jnp.where(inv_x < 0, boxmax.x, boxmin.x)
    tx_hi = jnp.where(inv_x < 0, boxmin.x, boxmax.x)
    ty_lo = jnp.where(inv_y < 0, boxmax.y, boxmin.y)
    ty_hi = jnp.where(inv_y < 0, boxmin.y, boxmax.y)
    tz_lo = jnp.where(inv_z < 0, boxmax.z, boxmin.z)
    tz_hi = jnp.where(inv_z < 0, boxmin.z, boxmax.z)

    tmin = (tx_lo - origin.x) * inv_x
    tmax = (tx_hi - origin.x) * inv_x
    tymin = (ty_lo - origin.y) * inv_y
    tymax = (ty_hi - origin.y) * inv_y

    fail1 = (tmin > tymax) | (tymin > tmax)

    tmin = jnp.where(tymin > tmin, tymin, tmin)
    tmax = jnp.where(tymax < tmax, tymax, tmax)

    tzmin = (tz_lo - origin.z) * inv_z
    tzmax = (tz_hi - origin.z) * inv_z

    fail2 = (tmin > tzmax) | (tzmin > tmax)

    tmin = jnp.where(tzmin > tmin, tzmin, tmin)
    tmax = jnp.where(tzmax < tmax, tzmax, tmax)

    hit = jnp.logical_not(fail1 | fail2)
    return hit, tmin, tmax
