"""Henyey-Greenstein illumination LUT, vectorized for TPU.

Replaces the reference's CPU mex triple loop (reference
src/C/mex/HenyeyGreenstein.cc:29-96). For cell (c, a, b) of an N^3 cube:

    gamma = c * pi / N,  alpha = a * pi / N,  beta = b * pi / N
    lightOut = (sin a, 0, cos a), rotated around X by gamma
             -> (sin a, sin g * cos a, cos g * cos a)
    lightIn  = (sin b, 0, cos b)
    cos_theta = dot = sin a * sin b + cos g * cos a * cos b
    HG = 1/(4 pi) * (1 - g^2) / (1 + g^2 - 2 g cos_theta)^(3/2)

The result is stored as (c, a, b) in C order — the same memory layout the
reference produces column-major (b fastest, reference
src/C/mex/HenyeyGreenstein.cc:86) — so normalized texture coordinate x maps
to the b axis, y to a, z to c, exactly as ``tex_illumination`` sees it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(0, 1))
def henyey_greenstein_lut(n: int, g: float = 0.8) -> jnp.ndarray:
    """N^3 float32 LUT of the Henyey-Greenstein phase function."""
    if not -1.0 <= float(g) <= 1.0:
        raise ValueError("g must be in interval [-1,1]")
    frac = jnp.float32(jnp.pi) / jnp.float32(n)
    idx = jnp.arange(n, dtype=jnp.float32) * frac

    gamma = idx[:, None, None]  # c axis
    alpha = idx[None, :, None]  # a axis
    beta = idx[None, None, :]  # b axis

    cos_theta = jnp.sin(alpha) * jnp.sin(beta) + jnp.cos(gamma) * jnp.cos(alpha) * jnp.cos(beta)

    g = jnp.float32(g)
    numerator = 1.0 - g * g
    denominator = jnp.sqrt((1.0 + g * g - 2.0 * g * cos_theta) ** 3)
    return (1.0 / (4.0 * jnp.float32(jnp.pi)) * numerator / denominator).astype(jnp.float32)
