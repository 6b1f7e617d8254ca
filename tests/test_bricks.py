"""Brick-sharded rendering vs single-device render.

Bricked mode composites segments exactly but skips the opacity-threshold
early exit, so comparisons use a threshold that never triggers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_scene
from volume_renderer_tpu.parallel.bricks import render_forward_bricked
from volume_renderer_tpu.parallel.sharding import make_mesh
from volume_renderer_tpu.ops.forward import render_forward

W, H = 16, 12


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(8, axis_name="bricks")


def _uncapped(scene):
    return scene.replace(
        settings=scene.settings.replace(opacity_threshold=jnp.float32(10.0))
    )


@pytest.mark.parametrize(
    "case",
    [
        dict(lighting=False, gradient_volumes=False),
        dict(lighting=True, gradient_volumes=False),
        dict(lighting=True, gradient_volumes=True),
    ],
    ids=["plain", "light-otf", "light-lookup"],
)
def test_bricked_matches_single(mesh, case):
    scene, _ = make_scene(vol_shape=(16, 12, 10), **case)
    scene = _uncapped(scene)
    opts = scene.options(W, H)
    single = np.asarray(render_forward(scene, opts))
    bricked = np.asarray(render_forward_bricked(scene, opts, mesh=mesh))
    np.testing.assert_allclose(bricked, single, rtol=5e-4, atol=1e-5)


def test_bricked_negative_z_direction(mesh):
    """Camera flipped so rays traverse bricks in decreasing z order."""
    scene, _ = make_scene(vol_shape=(16, 12, 10), rotate=(180.0, 20.0, 0.0))
    scene = _uncapped(scene)
    opts = scene.options(W, H)
    single = np.asarray(render_forward(scene, opts))
    bricked = np.asarray(render_forward_bricked(scene, opts, mesh=mesh))
    assert single.max() > 0
    np.testing.assert_allclose(bricked, single, rtol=5e-4, atol=1e-5)


def test_bricked_rejects_indivisible_depth(mesh):
    scene, _ = make_scene(vol_shape=(10, 12, 10))
    opts = scene.options(W, H)
    with pytest.raises(ValueError, match="divisible"):
        render_forward_bricked(scene, opts, mesh=mesh)


def test_bricked_aliased_volumes(mesh):
    scene, _ = make_scene(vol_shape=(16, 12, 10), lighting=True)
    scene = _uncapped(scene).replace(absorption=None, reflection=None)
    opts = scene.options(W, H)
    single = np.asarray(render_forward(scene, opts))
    bricked = np.asarray(render_forward_bricked(scene, opts, mesh=mesh))
    np.testing.assert_allclose(bricked, single, rtol=5e-4, atol=1e-5)


def test_bricked_2d_mesh():
    """Rays x bricks 2D mesh: rows data-parallel, volume z-sharded."""
    import numpy as _np
    from jax.sharding import Mesh

    devices = _np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2d = Mesh(devices, ("rays", "bricks"))
    scene, _ = make_scene(vol_shape=(16, 12, 10), lighting=True)
    scene = _uncapped(scene)
    opts = scene.options(W, H)  # H=12 divisible by 2
    single = np.asarray(render_forward(scene, opts))
    out = np.asarray(
        render_forward_bricked(scene, opts, mesh=mesh2d, ray_axis="rays")
    )
    assert out.shape == (H, W, 3)
    np.testing.assert_allclose(out, single, rtol=5e-4, atol=1e-5)
