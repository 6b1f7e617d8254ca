"""Scene pytree + render-option derivation.

``Scene`` bundles everything the ray-march kernel consumes; it replaces the
reference's MManager registry + RenderOptions plumbing (reference
src/C/vr/mm/mmanager.hxx:25-295, src/C/vr/volumeRender.cpp:112-156).

``build_render_options`` replicates ``vr::initRender`` exactly
(volumeRender.cpp:112-156):
- render box: boxmax = (1, h*esy/(w*esx), d*esz/(w*esx)), boxmin = -boxmax,
  derived from the EMISSION volume extent only (render.cpp:245).
- step size: tstep = 1 / (2.2 * D) where D = fminf of the three face
  diagonals — the reference comment says "maximal diagonal" but the code
  takes the min; we replicate the code.
- gradient step: (1/w, 1/h, 1/d) (volumeRender.cpp:273-275).

All option arithmetic is done in numpy float32 so the host-side constants
match the reference's float math bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from volume_renderer_tpu.models.camera import Camera
from volume_renderer_tpu.models.volume import Volume


@struct.dataclass
class RenderSettings:
    """Transfer factors + color + opacity threshold (all differentiable).

    Mirrors the VolumeRender property surface defaults (reference
    VolumeRender.m:64-126): factors 1.0, color white, threshold 0.95.
    """

    factor_emission: jnp.ndarray
    factor_reflection: jnp.ndarray
    factor_absorption: jnp.ndarray
    color: jnp.ndarray  # (3,)
    opacity_threshold: jnp.ndarray

    @classmethod
    def create(
        cls,
        factor_emission: float = 1.0,
        factor_reflection: float = 1.0,
        factor_absorption: float = 1.0,
        color=(1.0, 1.0, 1.0),
        opacity_threshold: float = 0.95,
    ) -> "RenderSettings":
        return cls(
            factor_emission=jnp.float32(factor_emission),
            factor_reflection=jnp.float32(factor_reflection),
            factor_absorption=jnp.float32(factor_absorption),
            color=jnp.asarray(color, jnp.float32),
            opacity_threshold=jnp.float32(opacity_threshold),
        )


class RenderOptions:
    """Static, host-side render constants (hashable; jit static arg).

    Equivalent of vr::RenderOptions minus the traced pieces (rotation,
    factors) which live in Camera / RenderSettings.
    """

    __slots__ = ("width", "height", "boxmin", "boxmax", "tstep", "gradient_step", "n_steps")

    def __init__(self, width, height, boxmin, boxmax, tstep, gradient_step, n_steps):
        self.width = int(width)
        self.height = int(height)
        self.boxmin = tuple(float(v) for v in boxmin)
        self.boxmax = tuple(float(v) for v in boxmax)
        self.tstep = float(tstep)
        self.gradient_step = tuple(float(v) for v in gradient_step)
        self.n_steps = int(n_steps)

    def _key(self):
        return (self.width, self.height, self.boxmin, self.boxmax, self.tstep,
                self.gradient_step, self.n_steps)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, RenderOptions) and self._key() == other._key()

    def __repr__(self):
        return (f"RenderOptions(width={self.width}, height={self.height}, "
                f"boxmax={self.boxmax}, tstep={self.tstep}, n_steps={self.n_steps})")


def build_render_options(
    emission_extent_xyz: Tuple[int, int, int],
    element_size_um: Tuple[float, float, float],
    width: int,
    height: int,
) -> RenderOptions:
    """Host-side option derivation; float32 arithmetic as in initRender."""
    w, h, d = (np.float32(v) for v in emission_extent_xyz)
    esx, esy, esz = (np.float32(v) for v in element_size_um)

    bx = np.float32(1.0)
    by = np.float32(esy * h) / np.float32(w * esx)
    bz = np.float32(esz * d) / np.float32(w * esx)

    diag_xy = np.sqrt(np.float32(w * w + h * h))
    diag_yz = np.sqrt(np.float32(h * h + d * d))
    diag_xz = np.sqrt(np.float32(w * w + d * d))
    min_diag = np.float32(min(diag_xy, diag_yz, diag_xz))
    tstep = np.float32(1.0) / (np.float32(2.2) * min_diag)

    gradient_step = (1.0 / float(w), 1.0 / float(h), 1.0 / float(d))

    # Static upper bound on executed march steps: the loop runs while
    # t <= tfar with t starting at tnear >= 0 and (tfar - tnear) bounded by
    # the box diagonal |boxmax - boxmin|; +2 covers the unconditional first
    # step and the step that crosses tfar.
    diag_len = 2.0 * float(np.sqrt(bx * bx + by * by + bz * bz))
    n_steps = int(np.ceil(diag_len / float(tstep))) + 2

    return RenderOptions(
        width=width,
        height=height,
        boxmin=(-float(bx), -float(by), -float(bz)),
        boxmax=(float(bx), float(by), float(bz)),
        tstep=float(tstep),
        gradient_step=gradient_step,
        n_steps=n_steps,
    )


@struct.dataclass
class Scene:
    """Everything the march consumes. Optional fields statically specialize
    the kernel (None => feature compiled out, like the reference's
    command-protocol argument count switching, render.cpp:93-129).

    Volume aliasing: absorption=None or reflection=None means "same volume
    as emission" — the TPU equivalent of the reference's texture aliasing
    (``referenceTexture`` / ``syncWithDevice`` dedup of identical volumes,
    volumeRender_kernel.cu:631-648, 739-867): the aliased role is sampled
    from the emission grid with no extra gathers, and its gradients flow
    into the emission grid.
    """

    emission: Volume
    camera: Camera
    settings: RenderSettings
    absorption: Optional[Volume] = None
    reflection: Optional[Volume] = None
    # precomputed gradient volumes => gradientLookup mode; None => on-the-fly
    gradient_x: Optional[Volume] = None
    gradient_y: Optional[Volume] = None
    gradient_z: Optional[Volume] = None
    # illumination LUT (D,H,W) + lights; None/empty => no shading term
    illumination: Optional[jnp.ndarray] = None
    light_positions: Optional[jnp.ndarray] = None  # (L, 3)
    light_colors: Optional[jnp.ndarray] = None  # (L, 3)

    @property
    def absorption_aliased(self) -> bool:
        return self.absorption is None

    @property
    def reflection_aliased(self) -> bool:
        return self.reflection is None

    @property
    def absorption_volume(self) -> Volume:
        return self.emission if self.absorption is None else self.absorption

    @property
    def reflection_volume(self) -> Volume:
        return self.emission if self.reflection is None else self.reflection

    @property
    def has_lighting(self) -> bool:
        return (
            self.illumination is not None
            and self.light_positions is not None
            and self.light_positions.shape[0] > 0
        )

    @property
    def has_gradient_volumes(self) -> bool:
        return (
            self.gradient_x is not None
            and self.gradient_y is not None
            and self.gradient_z is not None
        )

    def options(self, width: int, height: int) -> RenderOptions:
        return build_render_options(
            self.emission.extent_xyz, self.emission.element_size_um, width, height
        )
