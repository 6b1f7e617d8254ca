"""Session-layer renderer facade.

Mirrors the property surface and behavior of the reference's MATLAB
``VolumeRender`` class (reference src/matlab/VolumeRender/VolumeRender.m),
including off-axis stereo rendering (VolumeRender.m:275-308) and the
static image/sequence normalization helpers (VolumeRender.m:586-701).

The reference's mex handle + MManager timestamp machinery (reference
src/C/mex/render.cpp, src/C/vr/mm/mmanager.hxx) has no TPU equivalent by
design: JAX arrays are immutable and device-resident, so "sync" is just
building the Scene pytree; jit compilation caches per scene structure, and
repeated renders of unchanged volumes never re-upload.
"""

from __future__ import annotations

import enum
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from volume_renderer_tpu.api.planner import plan_render
from volume_renderer_tpu.models.camera import Camera
from volume_renderer_tpu.models.lights import LightSource, pack_lights
from volume_renderer_tpu.models.scene import RenderSettings, Scene, build_render_options
from volume_renderer_tpu.models.volume import Volume
from volume_renderer_tpu.native import content_hash
from volume_renderer_tpu.ops.forward import render_forward
from volume_renderer_tpu.ops.oracle import render_oracle


class StereoRenderMode(enum.Enum):
    """Stereo output modes (reference StereoRenderMode.m:32-38)."""

    RED_CYAN = "RedCyan"
    LEFT_RIGHT_HORIZONTAL = "LeftRightHorizontal"


class VolumeRenderer:
    """Stateful facade over the functional render path.

    Attributes mirror VolumeRender.m's validated properties with the same
    defaults (VolumeRender.m:64-126). ``image_resolution`` is
    (width, height).
    """

    def __init__(self, backend: str = "forward"):
        self.focal_length: float = 0.0
        self.distance_to_object: float = 0.0
        self.opacity_threshold: float = 0.95
        self.light_sources: List[LightSource] = []
        self.color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
        self.factor_emission: float = 1.0
        self.factor_reflection: float = 1.0
        self.factor_absorption: float = 1.0
        self.camera_x_offset: float = 0.0
        self.stereo_output: StereoRenderMode = StereoRenderMode.RED_CYAN
        self.element_size_um: Tuple[float, float, float] = (1.0, 1.0, 1.0)
        self.rotation_matrix: jnp.ndarray = jnp.eye(3, dtype=jnp.float32)
        self.image_resolution: Tuple[int, int] = (0, 0)

        self.volume_emission: Optional[Volume] = None
        self.volume_absorption: Optional[Volume] = None
        self.volume_reflection: Optional[Volume] = None
        self.volume_gradient_x: Optional[Volume] = None
        self.volume_gradient_y: Optional[Volume] = None
        self.volume_gradient_z: Optional[Volume] = None
        self.volume_illumination: Optional[jnp.ndarray] = None

        if backend not in ("forward", "oracle"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend

        # Memory planner knobs: None = query the device (api/planner.py).
        self.memory_budget_bytes: Optional[int] = None
        self.last_plan = None
        # Optional jax.sharding.Mesh: unlocks the multi-device tiers
        # (rays-DP when the scene fits each device, z-bricked sharding
        # when it does not; api/planner.py). None = single device.
        self.mesh = None

        # content-hash cache for identical-volume dedup; keyed by array id
        # with the array pinned so ids can't be recycled.
        self._hash_cache: dict = {}

    # ---- scene assembly -------------------------------------------------

    def rotate(self, alpha_deg: float, beta_deg: float, gamma_deg: float) -> None:
        """In-place Euler rotation of the view matrix (VolumeRender.m:239-262)."""
        cam = Camera.create(rotation=self.rotation_matrix).rotate(alpha_deg, beta_deg, gamma_deg)
        self.rotation_matrix = cam.rotation

    def reset_gradient_volumes(self) -> None:
        """Switch back to on-the-fly gradients (VolumeRender.m:314-346)."""
        self.volume_gradient_x = None
        self.volume_gradient_y = None
        self.volume_gradient_z = None

    def _content_hash(self, data) -> int:
        key = id(data)
        hit = self._hash_cache.get(key)
        if hit is not None and hit[0] is data:
            return hit[1]
        h = content_hash(np.asarray(data))
        self._hash_cache[key] = (data, h)  # pin the array so ids are stable
        return h

    def _same_volume(self, a: Optional[Volume], b: Optional[Volume]) -> bool:
        """Reference-parity volume equality (volumeRender_kernel.cu:790-817:
        ``Volume::operator==`` compares extents then contents)."""
        if a is None or b is None:
            return False
        if a is b or a.data is b.data:
            return True
        if tuple(a.data.shape) != tuple(b.data.shape):
            return False
        if self._content_hash(a.data) != self._content_hash(b.data):
            return False
        # hash match: confirm with an exact comparison (collision guard)
        return bool(np.array_equal(np.asarray(a.data), np.asarray(b.data)))

    def _build_scene(self) -> Scene:
        if self.volume_emission is None or self.volume_absorption is None:
            raise ValueError("Not all volumes are properly set! "
                             "(emission and absorption are required)")

        # Identical-volume deduplication (the reference's syncWithDevice
        # aliasing, volumeRender_kernel.cu:739-867, which aliases any
        # PAIRWISE-EQUAL volumes, not just same-object ones): object
        # identity short-circuits; otherwise equal-size volumes are
        # compared by cached content hash + exact equality check, so two
        # equal-VALUED distinct arrays also share one resident grid.
        absorption = self.volume_absorption
        if self._same_volume(absorption, self.volume_emission):
            absorption = None

        reflection = self.volume_reflection
        if reflection is not None and self._same_volume(reflection, self.volume_emission):
            reflection = None
        elif reflection is None:
            # VolumeRender.m:131 defaults VolumeReflection to Volume(1)
            reflection = Volume.create(np.ones((1, 1, 1), np.float32))

        grads = (self.volume_gradient_x, self.volume_gradient_y, self.volume_gradient_z)
        if any(g is not None for g in grads) and not all(g is not None for g in grads):
            raise ValueError("All gradient dimensions need to be set!")

        lights_set = len(self.light_sources) > 0 and self.volume_illumination is not None
        light_pos, light_col = pack_lights(self.light_sources if lights_set else [])

        illumination = None
        if lights_set:
            illumination = jnp.asarray(self.volume_illumination, jnp.float32)

        camera = Camera.create(
            rotation=self.rotation_matrix,
            focal_length=self.focal_length,
            distance_to_object=self.distance_to_object,
        )
        settings = RenderSettings.create(
            factor_emission=self.factor_emission,
            factor_reflection=self.factor_reflection,
            factor_absorption=self.factor_absorption,
            color=self.color,
            opacity_threshold=self.opacity_threshold,
        )
        emission = self.volume_emission.replace(
            element_size_um=tuple(float(e) for e in self.element_size_um)
        )
        return Scene(
            emission=emission,
            absorption=absorption,
            reflection=reflection,
            camera=camera,
            settings=settings,
            gradient_x=self.volume_gradient_x,
            gradient_y=self.volume_gradient_y,
            gradient_z=self.volume_gradient_z,
            illumination=illumination,
            light_positions=light_pos if lights_set else None,
            light_colors=light_col if lights_set else None,
        )

    def _render_once(self, camera_x_offset: float, width: int, height: int) -> jnp.ndarray:
        scene = self._build_scene()
        opts = build_render_options(
            scene.emission.extent_xyz, scene.emission.element_size_um, width, height
        )
        if self.backend == "oracle":
            return render_oracle(scene, opts, camera_x_offset)
        # memory pre-flight: flat when it fits, z-slab sweep when it
        # doesn't (the reference errors instead, mmanager.hxx:144-173);
        # with a mesh set, the multi-device tiers come first
        plan = plan_render(scene, opts, budget_bytes=self.memory_budget_bytes,
                           mesh=self.mesh)
        self.last_plan = plan
        if plan.path == "pallas_dp":
            import dataclasses

            from volume_renderer_tpu.ops.pallas_march import last_fallback_reason
            from volume_renderer_tpu.parallel.pallas_dp import (
                render_forward_fast_sharded,
            )

            img = render_forward_fast_sharded(
                scene, opts, camera_x_offset, mesh=self.mesh)
            reason = last_fallback_reason()
            if reason is not None:
                self.last_plan = dataclasses.replace(
                    plan, note=f"kernel fell back (sharded XLA): {reason}")
            return img
        if plan.path == "bricked":
            import dataclasses

            from volume_renderer_tpu.ops.pallas_march import last_fallback_reason
            from volume_renderer_tpu.parallel.bricks import (
                render_forward_bricked_fast,
            )

            img = render_forward_bricked_fast(
                scene, opts, camera_x_offset, mesh=self.mesh)
            reason = last_fallback_reason()
            if reason is not None:
                self.last_plan = dataclasses.replace(
                    plan, note=f"kernel fell back (bricked XLA): {reason}")
            return img
        if plan.path == "pallas":
            import dataclasses

            from volume_renderer_tpu.ops.pallas_march import (
                last_fallback_reason,
                render_forward_fast,
            )

            img = render_forward_fast(scene, opts, camera_x_offset)
            reason = last_fallback_reason()
            if reason is not None:
                # the kernel bailed at run time; record what actually ran
                # (the reference reports when it can't serve a render,
                # mmanager.hxx:144-173 — a silent 100x cliff is a bug)
                self.last_plan = dataclasses.replace(
                    plan, path="flat", note=f"pallas fell back: {reason}")
            return img
        if plan.path == "slabbed":
            from volume_renderer_tpu.ops.slab import render_forward_slabbed

            return render_forward_slabbed(
                scene, opts, camera_x_offset, n_slabs=plan.n_slabs
            )
        if plan.path == "streamed":
            from volume_renderer_tpu.ops.slab import render_forward_streamed

            return render_forward_streamed(
                scene, opts, camera_x_offset, n_slabs=plan.n_slabs
            )
        return render_forward(scene, opts, camera_x_offset)

    # ---- rendering ------------------------------------------------------

    def render(self) -> jnp.ndarray:
        """Render to an (H, W, 3) image; stereo if camera_x_offset != 0
        (reference VolumeRender.m:264-309)."""
        width, height = (int(v) for v in self.image_resolution)
        if width <= 0 or height <= 0:
            raise ValueError("image_resolution must be set to positive (width, height)")

        if self.camera_x_offset == 0:
            return self._render_once(0.0, width, height)

        # Off-axis stereo: two full passes at widened resolution, crop the
        # disparity delta from opposite sides, merge (VolumeRender.m:275-308).
        base = self.camera_x_offset / 2.0
        fov = 2.0 * np.arctan(1.0 / self.focal_length)
        # NB the reference uses ImageResolution(2) (= height) in the
        # disparity formula (VolumeRender.m:281-283); replicated verbatim.
        delta = int(round((base * height) / (2.0 * self.focal_length * np.tan(fov / 2.0))))

        wide = width + delta
        right = self._render_once(base, wide, height)
        left = self._render_once(-base, wide, height)

        left_c = left[:, delta:, :]
        right_c = right[:, : wide - delta, :]

        if self.stereo_output == StereoRenderMode.RED_CYAN:
            return jnp.stack(
                [left_c[:, :, 0], right_c[:, :, 1], right_c[:, :, 2]], axis=-1
            )
        return jnp.concatenate([left_c, right_c], axis=1)

    # ---- introspection --------------------------------------------------

    def mem_info(self) -> str:
        """Human-readable scene memory report (MManager::memInfo analog,
        reference mm/mmanager.hxx:218-284)."""
        lines = ["volume_renderer_tpu scene memory:"]
        total = 0
        seen = []  # (name, Volume) already counted as resident
        for name in ("volume_emission", "volume_absorption", "volume_reflection",
                     "volume_gradient_x", "volume_gradient_y", "volume_gradient_z"):
            vol = getattr(self, name)
            if vol is None:
                continue
            nbytes = int(np.prod(vol.data.shape)) * 4
            # same pairwise content-equality rule the render path uses for
            # aliasing (_same_volume), so the report matches what is
            # actually resident — not just object identity.
            shared_with = next(
                (n for n, v in seen if self._same_volume(vol, v)), None)
            dedup = f" (shared with {shared_with})" if shared_with else ""
            if not shared_with:
                seen.append((name, vol))
                total += nbytes
            lines.append(f"  {name}: shape={tuple(vol.data.shape)} {nbytes / 2**20:.1f} MiB{dedup}")
        if self.volume_illumination is not None:
            nbytes = int(np.prod(self.volume_illumination.shape)) * 4
            total += nbytes
            lines.append(
                f"  volume_illumination: shape={tuple(self.volume_illumination.shape)} "
                f"{nbytes / 2**20:.1f} MiB"
            )
        lines.append(f"  total (deduplicated): {total / 2**20:.1f} MiB")
        try:
            import jax

            dev = jax.devices()[0]
            stats = dev.memory_stats() or {}
            if "bytes_in_use" in stats:
                lines.append(f"  device bytes_in_use: {stats['bytes_in_use'] / 2**20:.1f} MiB")
        except Exception:  # pragma: no cover - platform dependent
            pass
        return "\n".join(lines)

    # ---- static helpers (VolumeRender.m:586-701) -----------------------

    @staticmethod
    def normalize_image(image_rgb, min_value: Optional[float] = None,
                        max_value: Optional[float] = None):
        """Normalize an RGB image to [0, 1] (VolumeRender.m:632-701)."""
        img = jnp.asarray(image_rgb, jnp.float32)
        if min_value is None:
            min_value = float(jnp.min(img))
        if max_value is None:
            max_value = float(jnp.max(img))
        if min_value < 0:
            # replicate the reference's negative-min shift semantics
            img = img + min_value
            max_value = max_value + abs(min_value)
        return img / max_value

    @staticmethod
    def normalize_sequence(sequence):
        """Normalize a 4D (H, W, 3, T) sequence globally (VolumeRender.m:587-630)."""
        seq = jnp.asarray(sequence, jnp.float32)
        if seq.ndim < 4:
            raise ValueError("input must be a multiframe image (4D)")
        mn = float(jnp.min(seq))
        mx = float(jnp.max(seq))
        frames = [
            VolumeRenderer.normalize_image(seq[..., i], mn, mx)
            for i in range(seq.shape[-1])
        ]
        return jnp.stack(frames, axis=-1)
