"""Rays-DP with the Pallas kernel per shard (8-device CPU mesh,
interpret mode): forward bands match the flat path; the sharded kernel
backward with psum-ed gradients matches the single-device train step."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_pallas import _scene
from volume_renderer_tpu.ops.forward import render_forward
from volume_renderer_tpu.parallel.pallas_dp import (
    render_forward_fast_sharded,
    train_step_fast_sharded,
)
from volume_renderer_tpu.parallel.sharding import make_mesh


def test_dp_forward_matches_flat():
    mesh = make_mesh(8)
    scene = _scene(vol=14, rot=(125, 25, 0))
    opts = scene.options(64, 320)  # 8 bands of 40 rows -> 64-row tiles
    from volume_renderer_tpu.ops.pallas_march import last_fallback_reason

    ref = np.asarray(render_forward(scene, opts))
    out = np.asarray(render_forward_fast_sharded(scene, opts, mesh=mesh))
    assert last_fallback_reason() is None
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-4)

pytestmark = pytest.mark.slow  # interpret-mode kernel sweeps



def test_dp_forward_fallback_matches():
    """Off-envelope scenes (mismatched gradient volumes) fall back to
    the sharded XLA path with identical output."""
    from tests.test_pallas import _mismatched_grad_scene

    mesh = make_mesh(4)
    scene = _mismatched_grad_scene()
    opts = scene.options(16, 64)
    ref = np.asarray(render_forward(scene, opts))
    out = np.asarray(render_forward_fast_sharded(scene, opts, mesh=mesh))
    np.testing.assert_allclose(out, ref, atol=1e-6)


@pytest.mark.parametrize("alias", [False, True], ids=["ab", "alias"])
def test_dp_train_step_matches_single_device(alias):
    import optax

    from volume_renderer_tpu import train

    mesh = make_mesh(8)
    scene = _scene(vol=14, rot=(125, 25, 0), alias=alias)
    opts = scene.options(32, 256)
    target = np.asarray(render_forward(scene, opts))

    params, static_scene = train.split_params(scene)
    params = dict(params)
    params["emission"] = params["emission"] * 1.3 + 0.05
    opt = optax.sgd(1e-2)
    st = opt.init(params)

    p1, _, loss1 = train_step_fast_sharded(
        params, st, static_scene, opts, target, opt, mesh=mesh)
    p2, _, loss2 = train.train_step(
        params, st, static_scene, opts, jnp.asarray(target), opt)
    assert abs(float(loss1) - float(loss2)) / float(loss2) < 1e-4
    for k in p2:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), rtol=5e-4, atol=1e-7,
            err_msg=k)


def test_dp_forward_lighting_matches_flat():
    """Lighting-on scenes ride the kernel inside the DP shards too."""
    from tests.test_pallas import _lit_scene
    from volume_renderer_tpu.ops.pallas_march import last_fallback_reason

    mesh = make_mesh(4)
    scene = _lit_scene(vol=14)
    opts = scene.options(32, 128)
    ref = np.asarray(render_forward(scene, opts))
    out = np.asarray(render_forward_fast_sharded(scene, opts, mesh=mesh))
    assert last_fallback_reason() is None
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-4)
