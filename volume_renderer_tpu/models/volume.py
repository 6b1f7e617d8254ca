"""Volume container pytree + volume ops.

Replaces the reference's MATLAB ``Volume`` handle class (reference
src/matlab/VolumeRender/Volume.m:1-239) with a functional JAX pytree.

Data layout: C-order (D, H, W) == (z, y, x), x fastest — byte-identical to
the reference's column-major MATLAB volume memory (MATLAB dim 1 maps to the
CUDA texture x axis, reference src/C/vr/volumeRender.cpp:307-342). A Python
user loading the ViBE-Z h5 datasets with h5py gets exactly this layout.

There is no timestamp/dirty-bit machinery (reference Volume.m:225-239,
mm/mmanager.hxx): JAX arrays live on device and are immutable, so "sync"
is simply jax.device_put, handled by the session layer.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Volume:
    """Volumetric data + physical voxel size.

    data: float32 array, shape (D, H, W) = (z, y, x).
    element_size_um: static (sx, sy, sz) physical voxel extent in micrometers
        (x, y, z order — note h5 files often store it (z, y, x); flip there).
    """

    data: jnp.ndarray
    element_size_um: Tuple[float, float, float] = struct.field(
        pytree_node=False, default=(1.0, 1.0, 1.0)
    )

    @classmethod
    def create(cls, data, element_size_um=(1.0, 1.0, 1.0)) -> "Volume":
        arr = jnp.asarray(data, dtype=jnp.float32)
        if arr.ndim == 2:
            arr = arr[None, :, :]
        if arr.ndim != 3:
            raise ValueError(f"Volume data must be 2D or 3D, got shape {arr.shape}")
        return cls(data=arr, element_size_um=tuple(float(e) for e in element_size_um))

    @property
    def shape_dhw(self) -> Tuple[int, int, int]:
        return tuple(self.data.shape)

    @property
    def extent_xyz(self) -> Tuple[int, int, int]:
        """(width, height, depth) — the reference's cudaExtent order."""
        d, h, w = self.data.shape
        return (w, h, d)

    # ---- ops (functional equivalents of reference Volume.m methods) ----

    def resize(self, newsize: Union[float, Tuple[int, int, int]], method: str = "cubic") -> "Volume":
        """Trilinear/tricubic resize (reference Volume.m:93-105 imresize3).

        newsize: either a scale factor or an explicit (D, H, W) shape.
        """
        if isinstance(newsize, (int, float)):
            shape = tuple(max(1, int(round(s * newsize))) for s in self.data.shape)
        else:
            shape = tuple(int(s) for s in newsize)
        out = jax.image.resize(self.data, shape, method=method)
        return self.replace(data=out.astype(jnp.float32))

    def pad(self, padding: int, value: float = 0.0) -> "Volume":
        """Pad all three axes by ``padding`` on both sides (Volume.m:119-135)."""
        p = int(padding)
        out = jnp.pad(self.data, ((p, p), (p, p), (p, p)), constant_values=value)
        return self.replace(data=out)

    def mip(self) -> jnp.ndarray:
        """Maximum intensity projection along z -> (H, W) image (Volume.m:138-146)."""
        return jnp.max(self.data, axis=0)

    def mean(self) -> jnp.ndarray:
        return jnp.mean(self.data)

    def max(self) -> jnp.ndarray:
        return jnp.max(self.data)

    def min(self) -> jnp.ndarray:
        return jnp.min(self.data)

    def normalize(self, new_min: float = 0.0, new_max: float = 1.0) -> "Volume":
        """Linear rescale to [new_min, new_max] (Volume.m:208-220)."""
        mx = jnp.max(self.data)
        mn = jnp.min(self.data)
        out = (self.data - mn) * (new_max - new_min) / (mx - mn) + new_min
        return self.replace(data=out)

    def gradient_volumes(self) -> Tuple["Volume", "Volume", "Volume"]:
        """Central-difference gradients along the texture x, y, z axes.

        Matches what the renderer's on-the-fly mode (computeGradient,
        reference volumeRender_kernel.cu:212-253) approximates: interior
        (f[i+1] - f[i-1]) / 2, one-sided at the edges (numpy.gradient
        semantics, identical to MATLAB gradient with unit spacing).
        Returns (d/dx, d/dy, d/dz) as Volumes.
        """
        gz, gy, gx = jnp.gradient(self.data)  # axes (0, 1, 2) = (z, y, x)
        return (
            self.replace(data=gx.astype(jnp.float32)),
            self.replace(data=gy.astype(jnp.float32)),
            self.replace(data=gz.astype(jnp.float32)),
        )

    def grad_matlab(self) -> Tuple["Volume", "Volume", "Volume"]:
        """MATLAB ``[gx, gy, gz] = gradient(Data)`` ordering (Volume.m:181-205).

        MATLAB's first output runs along its dim 2 (= texture y axis) and the
        second along dim 1 (= texture x axis); the reference examples assign
        these directly to VolumeGradientX/Y (example1_grad.m:28-37), so this
        replicates that exact (quirky) axis pairing for example parity.
        """
        gx, gy, gz = self.gradient_volumes()
        return (gy, gx, gz)
