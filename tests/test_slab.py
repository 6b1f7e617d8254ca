"""z-slab-swept single-device render vs the flat march, and the planner."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_scene
from volume_renderer_tpu.api.planner import plan_render, scene_volume_bytes
from volume_renderer_tpu.ops.forward import render_forward
from volume_renderer_tpu.ops.slab import render_forward_slabbed

W, H = 16, 12


@pytest.mark.parametrize(
    "case",
    [
        dict(lighting=False, gradient_volumes=False),
        dict(lighting=True, gradient_volumes=False),
        dict(lighting=True, gradient_volumes=True),
    ],
    ids=["plain", "light-otf", "light-lookup"],
)
def test_slabbed_matches_flat(case):
    scene, _ = make_scene(vol_shape=(16, 12, 10), **case)
    opts = scene.options(W, H)
    flat = np.asarray(render_forward(scene, opts))
    slabbed = np.asarray(render_forward_slabbed(scene, opts, n_slabs=4))
    assert flat.max() > 0
    np.testing.assert_allclose(slabbed, flat, rtol=5e-4, atol=1e-5)


def test_slabbed_negative_z_direction():
    """Camera flipped: rays sweep slabs in descending z order."""
    scene, _ = make_scene(vol_shape=(16, 12, 10), rotate=(180.0, 20.0, 0.0))
    opts = scene.options(W, H)
    flat = np.asarray(render_forward(scene, opts))
    slabbed = np.asarray(render_forward_slabbed(scene, opts, n_slabs=4))
    assert flat.max() > 0
    np.testing.assert_allclose(slabbed, flat, rtol=5e-4, atol=1e-5)


def test_slabbed_early_termination_exact():
    """Unlike bricked segment mode, the slab sweep applies the opacity
    break exactly — compare with a LOW threshold that triggers often."""
    scene, _ = make_scene(vol_shape=(16, 12, 10), factors=(3.0, 0.4, 4.0))
    scene = scene.replace(
        settings=scene.settings.replace(opacity_threshold=jnp.float32(0.3))
    )
    opts = scene.options(W, H)
    flat = np.asarray(render_forward(scene, opts))
    slabbed = np.asarray(render_forward_slabbed(scene, opts, n_slabs=4))
    np.testing.assert_allclose(slabbed, flat, rtol=5e-4, atol=1e-5)


def test_slabbed_aliased():
    scene, _ = make_scene(vol_shape=(16, 12, 10), lighting=True)
    scene = scene.replace(absorption=None, reflection=None)
    opts = scene.options(W, H)
    flat = np.asarray(render_forward(scene, opts))
    slabbed = np.asarray(render_forward_slabbed(scene, opts, n_slabs=2))
    np.testing.assert_allclose(slabbed, flat, rtol=5e-4, atol=1e-5)


def test_slabbed_rejects_indivisible():
    scene, _ = make_scene(vol_shape=(10, 12, 10))
    opts = scene.options(W, H)
    with pytest.raises(ValueError, match="divisible"):
        render_forward_slabbed(scene, opts, n_slabs=3)


# ---- planner ----------------------------------------------------------------


def test_planner_fast_path_when_fits():
    # lighting-off scene in budget -> the Pallas march (throughput-first)
    scene, _ = make_scene(vol_shape=(16, 12, 10))
    opts = scene.options(W, H)
    plan = plan_render(scene, opts, budget_bytes=1 << 30)
    assert plan.path == "pallas"


def test_planner_flat_when_pallas_unsupported():
    # gradient volumes in a different layout than emission are the one
    # remaining lighting config outside the kernel envelope -> flat path
    import numpy as np

    from volume_renderer_tpu.models.volume import Volume

    scene, _ = make_scene(vol_shape=(16, 12, 10), lighting=True,
                          gradient_volumes=True)
    scene = scene.replace(
        gradient_x=Volume.create(np.zeros((4, 4, 4), np.float32)))
    opts = scene.options(W, H)
    plan = plan_render(scene, opts, budget_bytes=1 << 30)
    assert plan.path == "flat"


def test_planner_slabs_when_tight():
    scene, _ = make_scene(vol_shape=(16, 12, 10))
    opts = scene.options(W, H)
    from volume_renderer_tpu.api.planner import ray_state_bytes

    vol_bytes = scene_volume_bytes(scene)
    # budget that fits the grids + slabs + rays but not 2x grids
    budget = int(vol_bytes * 1.9) + ray_state_bytes(opts)
    plan = plan_render(scene, opts, budget_bytes=budget, headroom=1.0)
    assert plan.path == "slabbed"
    assert plan.n_slabs > 1
    assert scene.emission.data.shape[0] % plan.n_slabs == 0


def test_streamed_matches_flat():
    """Host-resident grids streamed slab-by-slab match the flat render."""
    import numpy as _np
    from volume_renderer_tpu.ops.slab import render_forward_streamed

    for rot in [(30.0, -20.0, 10.0), (180.0, 20.0, 0.0)]:
        scene, _ = make_scene(vol_shape=(16, 12, 10), lighting=True, rotate=rot)
        opts = scene.options(W, H)
        flat = _np.asarray(render_forward(scene, opts))
        # hand the streamed path numpy (host) volumes
        host_scene = scene.replace(
            emission=scene.emission.replace(data=_np.asarray(scene.emission.data)),
            absorption=scene.absorption.replace(data=_np.asarray(scene.absorption.data)),
            reflection=scene.reflection.replace(data=_np.asarray(scene.reflection.data)),
        )
        streamed = _np.asarray(render_forward_streamed(host_scene, opts, n_slabs=4))
        np.testing.assert_allclose(streamed, flat, rtol=5e-4, atol=1e-5)


def test_planner_streams_when_volume_exceeds_budget():
    from volume_renderer_tpu.api.planner import ray_state_bytes

    scene, _ = make_scene(vol_shape=(16, 12, 10))
    opts = scene.options(W, H)
    vol_bytes = scene_volume_bytes(scene)
    budget = int(vol_bytes * 0.8) + ray_state_bytes(opts)
    plan = plan_render(scene, opts, budget_bytes=budget, headroom=1.0)
    assert plan.path == "streamed"


def test_planner_errors_when_hopeless():
    scene, _ = make_scene(vol_shape=(16, 12, 10))
    opts = scene.options(W, H)
    with pytest.raises(ValueError, match="budget"):
        plan_render(scene, opts, budget_bytes=1024)


def test_renderer_uses_slab_plan():
    """The facade picks the slab path under a tight budget and the image
    matches the flat render."""
    from volume_renderer_tpu.api.renderer import VolumeRenderer
    from volume_renderer_tpu.models.volume import Volume

    from volume_renderer_tpu.api.planner import ray_state_bytes

    rng = np.random.default_rng(3)
    em = rng.random((32, 12, 10)).astype(np.float32)

    def make(budget):
        r = VolumeRenderer()
        r.volume_emission = Volume.create(em)
        r.volume_absorption = Volume.create(em * 0.5)
        r.focal_length, r.distance_to_object = 3.0, 6.0
        r.rotate(30, -20, 10)
        r.image_resolution = (W, H)
        r.memory_budget_bytes = budget
        return r

    r_flat = make(1 << 30)
    img_flat = np.asarray(r_flat.render())
    assert r_flat.last_plan.path == "pallas"

    vol_bytes = 2 * em.size * 4  # em + ab grids
    from volume_renderer_tpu.models.scene import build_render_options

    opts = build_render_options((10, 12, 32), (1.0, 1.0, 1.0), W, H)
    rays = ray_state_bytes(opts)
    # between slabbed (vol + 2*slabs + rays) and flat (2*vol + rays)
    budget = int((vol_bytes * 1.75 + rays) / 0.7)
    r_slab = make(budget)
    img_slab = np.asarray(r_slab.render())
    assert r_slab.last_plan.path == "slabbed", r_slab.last_plan
    # closed-form vs accumulated t: one boundary step of drift allowed
    np.testing.assert_allclose(img_slab, img_flat, rtol=5e-3, atol=1e-4)
