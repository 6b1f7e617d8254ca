"""Shared test fixtures: small random scenes."""

from __future__ import annotations

import numpy as np

from volume_renderer_tpu.models.camera import Camera
from volume_renderer_tpu.models.scene import RenderSettings, Scene, build_render_options
from volume_renderer_tpu.models.volume import Volume
from volume_renderer_tpu.ops.hg import henyey_greenstein_lut

import jax.numpy as jnp


def smooth_random_volume(rng, shape, scale=1.0):
    """Smooth nonneg random volume (random lowres, trilinearly upsampled)."""
    coarse = rng.random([max(2, s // 4) for s in shape]).astype(np.float32)
    # numpy trilinear upsample via repeat + smoothing
    from jax import image as jimage

    up = np.asarray(jimage.resize(jnp.asarray(coarse), shape, method="linear"))
    return (up * scale).astype(np.float32)


def make_scene(
    rng=None,
    vol_shape=(16, 12, 10),
    element_size_um=(1.0, 1.0, 1.0),
    lighting=False,
    gradient_volumes=False,
    rotate=(30.0, -20.0, 10.0),
    focal_length=3.0,
    distance=6.0,
    factors=(1.0, 0.4, 0.6),
    color=(1.0, 0.9, 0.8),
    opacity_threshold=0.95,
    lut_size=16,
):
    rng = rng or np.random.default_rng(0)
    em = smooth_random_volume(rng, vol_shape, 2.0)
    ab = smooth_random_volume(rng, vol_shape, 1.5)
    re = smooth_random_volume(rng, vol_shape, 1.0)

    cam = Camera.create(focal_length=focal_length, distance_to_object=distance)
    cam = cam.rotate(*rotate)

    settings = RenderSettings.create(
        factor_emission=factors[0],
        factor_reflection=factors[1],
        factor_absorption=factors[2],
        color=color,
        opacity_threshold=opacity_threshold,
    )

    kwargs = {}
    np_extra = {}
    if lighting:
        lut = np.asarray(henyey_greenstein_lut(lut_size), np.float32)
        lp = np.array([[2.0, 3.0, -1.5], [-1.0, 2.0, 2.0]], np.float32)
        lc = np.array([[1.0, 0.5, 1.0], [0.0, 1.0, 1.0]], np.float32)
        kwargs.update(
            illumination=jnp.asarray(lut),
            light_positions=jnp.asarray(lp),
            light_colors=jnp.asarray(lc),
        )
        np_extra.update(lut=lut, light_positions=lp, light_colors=lc)
    if gradient_volumes:
        vol = Volume.create(em)
        gx, gy, gz = vol.gradient_volumes()
        kwargs.update(gradient_x=gx, gradient_y=gy, gradient_z=gz)
        np_extra.update(
            gradient_volumes=(
                np.asarray(gx.data),
                np.asarray(gy.data),
                np.asarray(gz.data),
            )
        )

    scene = Scene(
        emission=Volume.create(em, element_size_um),
        absorption=Volume.create(ab, element_size_um),
        reflection=Volume.create(re, element_size_um),
        camera=cam,
        settings=settings,
        **kwargs,
    )

    np_args = dict(
        emission=em,
        absorption=ab,
        reflection=re,
        rotation=np.asarray(cam.rotation),
        focal_length=focal_length,
        distance=distance,
        camera_x_offset=0.0,
        element_size_um=element_size_um,
        factor_emission=factors[0],
        factor_reflection=factors[1],
        factor_absorption=factors[2],
        color=color,
        opacity_threshold=opacity_threshold,
        **np_extra,
    )
    return scene, np_args
