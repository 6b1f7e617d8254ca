"""Light sources.

Replaces the reference's MATLAB ``LightSource`` class + device upload path
(reference src/matlab/VolumeRender/LightSource.m:31-105,
src/C/vr/volumeRender_kernel.cu:57-65, 600-609). Positions are world-space
(x, y, z) — the mex bridge's (lev,row,col)->(x,y,z) flip
(src/C/mex/render.cpp:167) is a MATLAB-indexing artifact that does not
apply to this API; a MATLAB-convention position can be passed reversed.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


class LightSource:
    """Position + color, both length-3."""

    def __init__(self, position, color):
        position = tuple(float(p) for p in position)
        color = tuple(float(c) for c in color)
        if len(position) != 3:
            raise ValueError("dimensions of position must be [1,3]")
        if len(color) != 3:
            raise ValueError("dimensions of color must be [1,3]")
        self.position = position
        self.color = color

    def __repr__(self):
        return f"LightSource(position={self.position}, color={self.color})"


def pack_lights(lights: Sequence[LightSource]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stack lights into (L, 3) position and color arrays for the kernel."""
    if not lights:
        return (jnp.zeros((0, 3), jnp.float32), jnp.zeros((0, 3), jnp.float32))
    pos = jnp.asarray([l.position for l in lights], jnp.float32)
    col = jnp.asarray([l.color for l in lights], jnp.float32)
    return pos, col
