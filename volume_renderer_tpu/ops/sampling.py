"""CUDA-texture-semantics trilinear sampling.

Replicates the reference's 3-D texture reads (reference
src/C/vr/volumeRender_kernel.cu:544-548): normalized coordinates, linear
filtering, clamp addressing. CUDA linear filtering samples the texel grid at
``u = c * N - 0.5`` per axis; the 8 surrounding texels are blended with the
fractional weights, with out-of-range texel indices clamped to [0, N-1].

The fixed-point caveat: real CUDA hardware quantises the fractional blend
weights to 8 bits; we use full float32 weights. This is the documented
divergence for bit-level comparisons against GPU hardware — allclose at
~1e-2 relative worst-case per sample, far tighter in practice.

Volumes are stored as C-order arrays of shape (D, H, W) == (z, y, x) with x
fastest-varying — byte-identical layout to the reference's column-major
MATLAB volumes (flat index x + W*y + W*H*z, reference
src/C/mex/render.cpp:248-271, src/C/vr/volumeRender.cpp:307-342).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from volume_renderer_tpu.ops.float3 import F3, Array


def trilinear_setup(shape_dhw: Tuple[int, int, int], coords: F3):
    """Compute corner indices and weights for a CUDA-style trilinear fetch.

    coords are normalized (x, y, z) in [0, 1] (values outside clamp).
    Returns (i0, i1, fx, fy, fz) where i0/i1 are F3 of int32 clamped indices.
    """
    d, h, w = shape_dhw
    ux = coords.x * jnp.float32(w) - 0.5
    uy = coords.y * jnp.float32(h) - 0.5
    uz = coords.z * jnp.float32(d) - 0.5

    fx0 = jnp.floor(ux)
    fy0 = jnp.floor(uy)
    fz0 = jnp.floor(uz)

    fx = ux - fx0
    fy = uy - fy0
    fz = uz - fz0

    ix0 = jnp.clip(fx0.astype(jnp.int32), 0, w - 1)
    iy0 = jnp.clip(fy0.astype(jnp.int32), 0, h - 1)
    iz0 = jnp.clip(fz0.astype(jnp.int32), 0, d - 1)
    ix1 = jnp.clip(fx0.astype(jnp.int32) + 1, 0, w - 1)
    iy1 = jnp.clip(fy0.astype(jnp.int32) + 1, 0, h - 1)
    iz1 = jnp.clip(fz0.astype(jnp.int32) + 1, 0, d - 1)

    return (F3(ix0, iy0, iz0), F3(ix1, iy1, iz1), fx, fy, fz)


def sample_trilinear(volume: Array, coords: F3) -> Array:
    """Trilinear sample of ``volume`` (D, H, W) at normalized coords (x, y, z).

    Fully differentiable: gradients flow to ``volume`` (scatter-add) and to
    ``coords`` (through the fractional weights; ``floor`` has zero grad).
    """
    d, h, w = volume.shape
    i0, i1, fx, fy, fz = trilinear_setup((d, h, w), coords)

    flat = volume.reshape(-1)
    stride_y = w
    stride_z = w * h

    def fetch(ix, iy, iz):
        idx = ix + iy * stride_y + iz * stride_z
        return jnp.take(flat, idx, mode="clip")

    c000 = fetch(i0.x, i0.y, i0.z)
    c100 = fetch(i1.x, i0.y, i0.z)
    c010 = fetch(i0.x, i1.y, i0.z)
    c110 = fetch(i1.x, i1.y, i0.z)
    c001 = fetch(i0.x, i0.y, i1.z)
    c101 = fetch(i1.x, i0.y, i1.z)
    c011 = fetch(i0.x, i1.y, i1.z)
    c111 = fetch(i1.x, i1.y, i1.z)

    # blend x, then y, then z (matches GPU filtering order)
    c00 = c000 + fx * (c100 - c000)
    c10 = c010 + fx * (c110 - c010)
    c01 = c001 + fx * (c101 - c001)
    c11 = c011 + fx * (c111 - c011)

    c0 = c00 + fy * (c10 - c00)
    c1 = c01 + fy * (c11 - c01)

    return c0 + fz * (c1 - c0)


def sample_trilinear_zslab(
    slab: Array, coords: F3, z_offset, full_d: int
) -> Array:
    """Trilinear sample from a z-slab of a (full_d, H, W) volume.

    ``slab`` holds rows [z_offset, z_offset + slab_d) of the full volume
    (including any halo rows the caller packed in). Coordinates are GLOBAL
    normalized coords; corner indices are clamped against the FULL volume
    extent first (identical values to sample_trilinear on the full array),
    then shifted into the slab. The caller guarantees that every global
    z index actually touched lies inside the slab (enough halo).

    This is the sampling primitive for brick-sharded volumes and the
    slab-swept large-volume march.
    """
    slab_d, h, w = slab.shape
    i0, i1, fx, fy, fz = trilinear_setup((full_d, h, w), coords)

    z0 = jnp.clip(i0.z - z_offset, 0, slab_d - 1)
    z1 = jnp.clip(i1.z - z_offset, 0, slab_d - 1)

    flat = slab.reshape(-1)
    stride_y = w
    stride_z = w * h

    def fetch(ix, iy, iz):
        idx = ix + iy * stride_y + iz * stride_z
        return jnp.take(flat, idx, mode="clip")

    c000 = fetch(i0.x, i0.y, z0)
    c100 = fetch(i1.x, i0.y, z0)
    c010 = fetch(i0.x, i1.y, z0)
    c110 = fetch(i1.x, i1.y, z0)
    c001 = fetch(i0.x, i0.y, z1)
    c101 = fetch(i1.x, i0.y, z1)
    c011 = fetch(i0.x, i1.y, z1)
    c111 = fetch(i1.x, i1.y, z1)

    c00 = c000 + fx * (c100 - c000)
    c10 = c010 + fx * (c110 - c010)
    c01 = c001 + fx * (c101 - c001)
    c11 = c011 + fx * (c111 - c011)
    c0 = c00 + fy * (c10 - c00)
    c1 = c01 + fy * (c11 - c01)
    return c0 + fz * (c1 - c0)
