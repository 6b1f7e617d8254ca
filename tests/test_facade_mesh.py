"""Facade + planner multi-device routing (VERDICT r4 missing #5).

The reference's whole user story runs through its facade
(reference src/matlab/VolumeRender/VolumeRender.m:264-309); here the
facade accepts a ``jax.sharding.Mesh`` and the planner picks the
multi-device tiers: rays-DP when the scene fits each device, z-bricked
sharding when it does not (instead of round 4's host-streaming).
"""

import numpy as np
import pytest

from volume_renderer_tpu import LightSource, Volume, VolumeRenderer
from volume_renderer_tpu.api.planner import plan_render
from volume_renderer_tpu.parallel.sharding import make_mesh


def _renderer(vol=32, res=64):
    z, y, x = np.mgrid[0:vol, 0:vol, 0:vol].astype(np.float32)
    c = (vol - 1) / 2.0
    r2 = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) / c
    em = np.exp(-6.0 * (r2 - 0.6) ** 2).astype(np.float32)
    r = VolumeRenderer()
    r.volume_emission = Volume.create(em)
    r.volume_absorption = Volume.create(em * 0.7)
    r.focal_length = 3.0
    r.distance_to_object = 6.0
    r.rotate(125, 25, 0)
    r.image_resolution = (res, res)
    return r


def test_planner_picks_rays_dp_with_mesh():
    r = _renderer()
    scene = r._build_scene()
    from volume_renderer_tpu.models.scene import build_render_options

    opts = build_render_options(
        scene.emission.extent_xyz, scene.emission.element_size_um, 64, 64)
    mesh = make_mesh(8)
    plan = plan_render(scene, opts, mesh=mesh)
    assert plan.path == "pallas_dp"
    assert plan.n_devices == 8
    assert "n_devices=8" in str(plan)


def test_planner_picks_bricked_when_over_budget():
    r = _renderer()
    scene = r._build_scene()
    from volume_renderer_tpu.models.scene import build_render_options

    opts = build_render_options(
        scene.emission.extent_xyz, scene.emission.element_size_um, 64, 64)
    mesh = make_mesh(8, axis_name="bricks")
    # budget above one brick's working set + ray state, but below the
    # full flat working set (2*vol + rays): bricked fits, flat does not
    from volume_renderer_tpu.api.planner import ray_state_bytes, scene_volume_bytes

    rays = ray_state_bytes(opts)
    vol_bytes = scene_volume_bytes(scene)
    budget = rays + vol_bytes * 2 // 3
    plan = plan_render(scene, opts, budget_bytes=budget, headroom=1.0,
                       mesh=mesh)
    assert plan.path == "bricked", str(plan)
    assert plan.n_devices == 8
    # without the mesh the same budget degrades to a single-device tier
    plan1 = plan_render(scene, opts, budget_bytes=budget, headroom=1.0)
    assert plan1.path in ("slabbed", "streamed")


def test_facade_renders_through_rays_dp():
    r = _renderer()
    ref = np.asarray(r.render())
    assert r.last_plan.path == "pallas"
    r.mesh = make_mesh(8)
    got = np.asarray(r.render())
    assert r.last_plan.path == "pallas_dp"
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-4)


def test_facade_renders_through_bricks():
    r = _renderer()
    ref = np.asarray(r.render())
    r.mesh = make_mesh(8, axis_name="bricks")
    from volume_renderer_tpu.api.planner import ray_state_bytes, scene_volume_bytes
    from volume_renderer_tpu.models.scene import build_render_options

    scene = r._build_scene()
    opts = build_render_options(
        scene.emission.extent_xyz, scene.emission.element_size_um, 64, 64)
    r.memory_budget_bytes = int(
        (ray_state_bytes(opts) + scene_volume_bytes(scene) * 2 // 3) / 0.7)
    got = np.asarray(r.render())
    assert r.last_plan.path == "bricked", str(r.last_plan)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-4)


def test_facade_lit_mesh_falls_back_sharded():
    """Lit scenes ride the sharded XLA fallback, and the plan says so."""
    r = _renderer()
    from volume_renderer_tpu.ops.hg import henyey_greenstein_lut

    r.volume_reflection = Volume.create(
        np.asarray(r.volume_emission.data))
    r.volume_illumination = henyey_greenstein_lut(16)
    r.light_sources = [LightSource([2, 3, -1.5], [1, 1, 1])]
    ref = np.asarray(r.render())
    r.mesh = make_mesh(8)
    got = np.asarray(r.render())
    assert r.last_plan.path == "pallas_dp"
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-4)


def test_train_step_planned_mesh_tiers():
    """train_step_planned routes through the sharded tiers when a mesh
    is supplied (rays-DP when the scene fits, bricked when it does not)
    and the loss decreases either way."""
    import optax

    from volume_renderer_tpu import train
    from volume_renderer_tpu.api.planner import ray_state_bytes, scene_volume_bytes
    from volume_renderer_tpu.models.scene import build_render_options
    from volume_renderer_tpu.ops.forward import render_forward

    r = _renderer(vol=32, res=32)
    scene = r._build_scene()
    opts = build_render_options(
        scene.emission.extent_xyz, scene.emission.element_size_um, 32, 32)
    target = render_forward(scene, opts)
    params, _ = train.split_params(scene)
    params = dict(params)
    params["emission"] = params["emission"] * 1.3 + 0.05
    opt = optax.adam(1e-2)

    mesh = make_mesh(8)
    st = opt.init(params)
    p1, st, l1, plan1 = train.train_step_planned(
        params, st, scene, opts, target, opt, mesh=mesh)
    assert plan1.path == "pallas_dp", str(plan1)
    _, _, l2, _ = train.train_step_planned(
        p1, st, scene, opts, target, opt, mesh=mesh)
    assert float(l2) < float(l1)

    mesh_b = make_mesh(8, axis_name="bricks")
    rays = ray_state_bytes(opts)
    vol_bytes = scene_volume_bytes(scene)
    # above the bricked working set (training adds vol-sized grads to
    # the ray state), below the flat one (2*vol + rays + vol)
    budget = int((rays + vol_bytes + vol_bytes // 2) / 0.7)
    st = opt.init(params)
    _, _, lb, planb = train.train_step_planned(
        params, st, scene, opts, target, opt, mesh=mesh_b,
        budget_bytes=budget)
    assert planb.path == "bricked", str(planb)
    assert np.isfinite(float(lb))
