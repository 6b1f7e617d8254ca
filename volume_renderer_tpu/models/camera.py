"""Camera pytree.

Replaces the camera-related surface of the reference's MATLAB
``VolumeRender`` class (RotationMatrix / FocalLength / DistanceToObject /
CameraXOffset properties plus ``rotate()``, reference
src/matlab/VolumeRender/VolumeRender.m:115-121, 239-262).

Convention note (derived, not copied): the MATLAB side passes
``flip(RotationMatrix)`` and the mex bridge reverses each row
(reference VolumeRender.m:560, src/C/mex/render.cpp:211-221). The two
reversals cancel so that the kernel's xVector/yVector/zVector are simply
the COLUMNS of the user's RotationMatrix. We store that matrix directly;
``basis()`` returns its columns.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from volume_renderer_tpu.ops.float3 import F3


@struct.dataclass
class Camera:
    rotation: jnp.ndarray  # (3, 3) float32; columns are xVec, yVec, zVec
    # intrinsics are pytree LEAVES (round 5): the fused backward exposes
    # d/d(focal_length, distance_to_object) alongside the rotation
    # (SURVEY section 7.4), which requires them traced, not aux data
    focal_length: float = 0.0
    distance_to_object: float = 0.0

    @classmethod
    def create(cls, rotation=None, focal_length: float = 0.0, distance_to_object: float = 0.0) -> "Camera":
        if rotation is None:
            rotation = jnp.eye(3, dtype=jnp.float32)
        return cls(
            rotation=jnp.asarray(rotation, jnp.float32),
            focal_length=float(focal_length),
            distance_to_object=float(distance_to_object),
        )

    def basis(self) -> Tuple[F3, F3, F3]:
        """(x_vec, y_vec, z_vec) as scalar F3s — columns of the rotation."""
        m = self.rotation
        return (
            F3(m[0, 0], m[1, 0], m[2, 0]),
            F3(m[0, 1], m[1, 1], m[2, 1]),
            F3(m[0, 2], m[1, 2], m[2, 2]),
        )

    def rotate(self, alpha_deg: float, beta_deg: float, gamma_deg: float) -> "Camera":
        """R <- R @ Rx(alpha) @ Ry(beta) @ Rz(gamma), angles in degrees
        (reference VolumeRender.m:239-262)."""
        a = jnp.deg2rad(jnp.float32(alpha_deg))
        b = jnp.deg2rad(jnp.float32(beta_deg))
        g = jnp.deg2rad(jnp.float32(gamma_deg))
        ca, sa = jnp.cos(a), jnp.sin(a)
        cb, sb = jnp.cos(b), jnp.sin(b)
        cg, sg = jnp.cos(g), jnp.sin(g)
        rx = jnp.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]], dtype=jnp.float32)
        ry = jnp.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]], dtype=jnp.float32)
        rz = jnp.array([[cg, -sg, 0], [sg, cg, 0], [0, 0, 1]], dtype=jnp.float32)
        # force f32 matmul — TPU's default precision is bf16-ish, which is
        # far too coarse for a camera basis
        hi = jax.lax.Precision.HIGHEST
        m = jnp.matmul(
            jnp.matmul(jnp.matmul(self.rotation, rx, precision=hi), ry, precision=hi),
            rz,
            precision=hi,
        )
        return self.replace(rotation=m)
