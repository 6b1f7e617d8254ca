"""Structure-of-arrays 3-vector helpers.

TPU vector lanes are 128 wide; arrays with a trailing dimension of 3 tile
terribly. All ray-march math therefore runs on three separate component
arrays (x, y, z), each of shape (R,) (or scalar for the per-pixel oracle).
``F3`` is a thin NamedTuple wrapper so the math still reads like vector code.

Numerical contract mirrors the CUDA helper_math.h functions used by the
reference kernel (reference src/C/vr/volumeRender_kernel.cu): ``normalize``
is ``v * rsqrt(dot(v, v))``, guarded against zero-length inputs (CUDA would
produce NaNs there; we define the result as the zero vector and document the
divergence — it only occurs for zero gradients / degenerate geometry).
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

Array = jnp.ndarray
Scalar = Union[float, Array]


class F3(NamedTuple):
    x: Array
    y: Array
    z: Array

    def __add__(self, o: "F3") -> "F3":
        return F3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "F3") -> "F3":
        return F3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, o: Union["F3", Scalar]) -> "F3":
        if isinstance(o, F3):
            return F3(self.x * o.x, self.y * o.y, self.z * o.z)
        return F3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __neg__(self) -> "F3":
        return F3(-self.x, -self.y, -self.z)


def f3(x, y, z) -> F3:
    return F3(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32), jnp.asarray(z, jnp.float32))


def f3_full(v: F3, like: Array) -> F3:
    """Broadcast a scalar F3 against ``like``."""
    return F3(
        jnp.broadcast_to(v.x, like.shape).astype(jnp.float32),
        jnp.broadcast_to(v.y, like.shape).astype(jnp.float32),
        jnp.broadcast_to(v.z, like.shape).astype(jnp.float32),
    )


def dot(a: F3, b: F3) -> Array:
    return a.x * b.x + a.y * b.y + a.z * b.z


def length(a: F3) -> Array:
    return jnp.sqrt(dot(a, a))


def normalize(a: F3) -> F3:
    """CUDA helper_math normalize: v * rsqrt(dot(v, v)), 0-safe."""
    d = dot(a, a)
    inv = jnp.where(d > 0.0, jax.lax.rsqrt(jnp.where(d > 0.0, d, 1.0)), 0.0)
    return a * inv


def where3(c: Array, a: F3, b: F3) -> F3:
    return F3(jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y), jnp.where(c, a.z, b.z))
