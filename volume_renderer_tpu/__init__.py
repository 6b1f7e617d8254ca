"""volume_renderer_tpu — a TPU-native differentiable volume renderer in JAX/Pallas.

A from-scratch re-design of the capabilities of raphiniert-com/volume_renderer
(a MATLAB-fronted CUDA ray-casting renderer) for TPU hardware:

- scene description as JAX pytrees (replaces the MATLAB ``VolumeRender`` /
  ``Volume`` / ``LightSource`` classes, reference src/matlab/VolumeRender/*.m)
- a pure-JAX reference renderer with exact CUDA-texture sampling and
  front-to-back compositing semantics (stands in for the CUDA kernel
  ``d_render``, reference src/C/vr/volumeRender_kernel.cu:365-507)
- a batched, XLA/Pallas-optimised forward + custom-VJP backward ray-march
- multi-chip sharding of rays/image tiles and voxel bricks via
  ``jax.sharding.Mesh`` + ``shard_map`` (the reference is single-GPU)
"""

from volume_renderer_tpu.models.volume import Volume
from volume_renderer_tpu.models.camera import Camera
from volume_renderer_tpu.models.lights import LightSource, pack_lights
from volume_renderer_tpu.models.scene import Scene, RenderSettings, RenderOptions, build_render_options
from volume_renderer_tpu.ops.hg import henyey_greenstein_lut
from volume_renderer_tpu.ops.oracle import render_oracle
from volume_renderer_tpu.ops.forward import render_forward
from volume_renderer_tpu.ops.pallas_march import (
    render_forward_fast,
    transfer_grads_fast,
    voxel_grads_fast,
)
from volume_renderer_tpu.ops.vjp import render_fused
from volume_renderer_tpu.api.renderer import VolumeRenderer, StereoRenderMode

__all__ = [
    "Volume",
    "Camera",
    "LightSource",
    "pack_lights",
    "Scene",
    "RenderSettings",
    "RenderOptions",
    "build_render_options",
    "henyey_greenstein_lut",
    "render_oracle",
    "render_forward",
    "render_forward_fast",
    "render_fused",
    "transfer_grads_fast",
    "voxel_grads_fast",
    "VolumeRenderer",
    "StereoRenderMode",
]

__version__ = "0.1.0"
