"""Brick-sharded rendering + gradients vs the single-device paths.

Bricked mode applies the opacity-threshold early exit EXACTLY (two-phase
transmittance relay, parallel/bricks.py docstring), so all comparisons
run at the default 0.95 threshold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_scene
from volume_renderer_tpu.parallel.bricks import (
    render_forward_bricked,
    render_fused_bricked,
)
from volume_renderer_tpu.parallel.sharding import make_mesh
from volume_renderer_tpu.ops.forward import render_forward
from volume_renderer_tpu.ops.vjp import render_fused, split_scene

pytestmark = pytest.mark.slow  # interpret-mode kernel sweeps

W, H = 16, 12


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(8, axis_name="bricks")


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
    opts = scene.options(W, H)
    single = np.asarray(render_forward(scene, opts))
    bricked = np.asarray(render_forward_bricked(scene, opts, mesh=mesh))
    np.testing.assert_allclose(bricked, single, rtol=5e-4, atol=1e-5)


def test_bricked_early_termination_exact(mesh):
    """Dense scene + LOW threshold: terminations happen mid-volume and the
    bricked result must still match the sequential early-exit march."""
    scene, _ = make_scene(vol_shape=(16, 12, 10), factors=(3.0, 0.4, 4.0))
    scene = scene.replace(
        settings=scene.settings.replace(opacity_threshold=jnp.float32(0.3))
    )
    opts = scene.options(W, H)
    single = np.asarray(render_forward(scene, opts))
    bricked = np.asarray(render_forward_bricked(scene, opts, mesh=mesh))
    np.testing.assert_allclose(bricked, single, rtol=5e-4, atol=1e-5)


def test_bricked_negative_z_direction(mesh):
    """Camera flipped so rays traverse bricks in decreasing z order."""
    scene, _ = make_scene(vol_shape=(16, 12, 10), rotate=(180.0, 20.0, 0.0))
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
    scene = scene.replace(absorption=None, reflection=None)
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
    opts = scene.options(W, H)  # H=12 divisible by 2
    single = np.asarray(render_forward(scene, opts))
    out = np.asarray(
        render_forward_bricked(scene, opts, mesh=mesh2d, ray_axis="rays")
    )
    assert out.shape == (H, W, 3)
    np.testing.assert_allclose(out, single, rtol=5e-4, atol=1e-5)


# ---- backward through bricks ------------------------------------------------


def _grads(render, scene, opts, target):
    diff, template = split_scene(scene)

    from volume_renderer_tpu.ops.vjp import merge_scene

    def loss(d):
        img = render(merge_scene(template, d))
        return jnp.mean((img - target) ** 2)

    return jax.grad(loss)(diff)


@pytest.mark.parametrize(
    "case",
    [
        dict(lighting=False, gradient_volumes=False),
        dict(lighting=True, gradient_volumes=False),
        dict(lighting=True, gradient_volumes=True),
    ],
    ids=["plain", "light-otf", "light-lookup"],
)
def test_bricked_grads_match_single(mesh, case):
    """Voxel/parameter gradients through the brick-sharded render match the
    single-device fused custom-VJP path."""
    scene, _ = make_scene(vol_shape=(16, 12, 10), **case)
    opts = scene.options(W, H)
    target = render_forward(scene, opts) * 0.8 + 0.001

    g_single = _grads(lambda s: render_fused(s, opts), scene, opts, target)
    g_brick = _grads(
        lambda s: render_fused_bricked(s, opts, mesh=mesh), scene, opts, target
    )

    assert set(g_single.keys()) == set(g_brick.keys())
    for key in g_single:
        np.testing.assert_allclose(
            np.asarray(g_brick[key]), np.asarray(g_single[key]),
            rtol=2e-3, atol=2e-6, err_msg=f"gradient mismatch for {key}",
        )


def test_bricked_grads_early_termination(mesh):
    """Gradients agree when the opacity break fires mid-volume (the replay
    must stop at the same steps on both paths)."""
    scene, _ = make_scene(vol_shape=(16, 12, 10), factors=(3.0, 0.4, 4.0))
    scene = scene.replace(
        settings=scene.settings.replace(opacity_threshold=jnp.float32(0.3))
    )
    opts = scene.options(W, H)
    target = render_forward(scene, opts) * 0.8

    g_single = _grads(lambda s: render_fused(s, opts), scene, opts, target)
    g_brick = _grads(
        lambda s: render_fused_bricked(s, opts, mesh=mesh), scene, opts, target
    )
    for key in g_single:
        np.testing.assert_allclose(
            np.asarray(g_brick[key]), np.asarray(g_single[key]),
            rtol=2e-3, atol=2e-6, err_msg=f"gradient mismatch for {key}",
        )


class TestBrickedKernelForward:
    """render_forward_bricked_fast: the Pallas march per brick with the
    two-phase transmittance relay — matches the single-device render
    exactly like the XLA bricked path does."""

    def _check(self, scene, n=4, w=32, h=32):
        import numpy as np

        from volume_renderer_tpu.ops.forward import render_forward
        from volume_renderer_tpu.ops.pallas_march import last_fallback_reason
        from volume_renderer_tpu.parallel.bricks import (
            render_forward_bricked_fast,
        )
        from volume_renderer_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(n, axis_name="bricks")
        opts = scene.options(w, h)
        ref = np.asarray(render_forward(scene, opts))
        out = np.asarray(render_forward_bricked_fast(scene, opts, mesh=mesh))
        assert last_fallback_reason() is None
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-4)

    def test_ascending(self):
        from tests.test_pallas import _scene

        self._check(_scene(vol=16, rot=(0, 0, 0)))

    def test_descending_eight_bricks(self):
        from tests.test_pallas import _scene

        self._check(_scene(vol=16, rot=(180, 0, 0)), n=8)

    def test_opaque_early_termination(self):
        from tests.test_pallas import _scene

        scene = _scene(vol=16, rot=(0, 0, 0))
        scene = scene.replace(absorption=scene.absorption.replace(
            data=scene.absorption.data * 60.0 + 5.0))
        self._check(scene)

    def test_non_z_axis_falls_back(self):
        import numpy as np

        from tests.test_pallas import _scene
        from volume_renderer_tpu.ops.forward import render_forward
        from volume_renderer_tpu.ops.pallas_march import last_fallback_reason
        from volume_renderer_tpu.parallel.bricks import (
            render_forward_bricked_fast,
        )
        from volume_renderer_tpu.parallel.sharding import make_mesh

        scene = _scene(vol=16, rot=(0, 90, 0))  # x-principal camera
        mesh = make_mesh(4, axis_name="bricks")
        opts = scene.options(16, 16)
        ref = np.asarray(render_forward(scene, opts))
        out = np.asarray(render_forward_bricked_fast(scene, opts, mesh=mesh))
        assert "brick axis" in (last_fallback_reason() or "")
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


class TestBrickedKernelBackward:
    """voxel_grads_bricked_fast: three kernel sweeps per brick (relay,
    shaded, grad scatter with globalized prefix) + adjoint halo return
    match jax.vjp of the single-device replay path."""

    def _check(self, scene, n=4, w=32, h=32):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from volume_renderer_tpu.ops.pallas_march import last_fallback_reason
        from volume_renderer_tpu.ops.vjp import (
            merge_scene, render_fused, split_scene)
        from volume_renderer_tpu.parallel.bricks import (
            voxel_grads_bricked_fast,
        )
        from volume_renderer_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(n, axis_name="bricks")
        opts = scene.options(w, h)
        g = np.asarray(
            np.random.RandomState(1).randn(h, w, 3), np.float32) * 1e-3
        img, grads = voxel_grads_bricked_fast(scene, opts, g, mesh=mesh)
        assert last_fallback_reason() is None
        diff, template = split_scene(scene)
        ref_img, vjp_fn = jax.vjp(
            lambda d: render_fused(merge_scene(template, d), opts), diff)
        ref = vjp_fn(jnp.asarray(g))[0]
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                                   atol=3e-5, rtol=3e-4)
        assert set(grads) == set(ref)
        for key in grads:
            np.testing.assert_allclose(
                np.asarray(grads[key]), np.asarray(ref[key]),
                rtol=5e-3, atol=1e-7, err_msg=key)

    def test_ascending(self):
        from tests.test_pallas import _scene

        self._check(_scene(vol=16, rot=(10, 5, 0)))

    def test_descending_aliased(self):
        from tests.test_pallas import _scene

        self._check(_scene(vol=16, rot=(180, 0, 0), alias=True))

    def test_opaque_early_termination(self):
        from tests.test_pallas import _scene

        scene = _scene(vol=16, rot=(0, 0, 0))
        scene = scene.replace(absorption=scene.absorption.replace(
            data=scene.absorption.data * 60.0 + 5.0))
        self._check(scene)
