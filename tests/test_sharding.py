"""Multi-device sharding: sharded render equals single-device; sharded
training step psums gradients correctly. Runs on the 8-virtual-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tests.helpers import make_scene
from volume_renderer_tpu import train
from volume_renderer_tpu.parallel.sharding import make_mesh, render_forward_sharded
from volume_renderer_tpu.ops.forward import render_forward

W, H = 16, 16


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "tests require 8 virtual devices (conftest)"
    return make_mesh(8)


def test_sharded_render_matches_single(mesh):
    scene, _ = make_scene()
    opts = scene.options(W, H)
    single = np.asarray(render_forward(scene, opts))
    sharded = np.asarray(render_forward_sharded(scene, opts, mesh=mesh))
    np.testing.assert_allclose(single, sharded, rtol=1e-6, atol=1e-7)


def test_sharded_render_nondivisible_rows(mesh):
    scene, _ = make_scene()
    opts = scene.options(W, 13)  # 13 rows over 8 devices -> padding
    single = np.asarray(render_forward(scene, opts))
    sharded = np.asarray(render_forward_sharded(scene, opts, mesh=mesh))
    assert sharded.shape == (13, W, 3)
    np.testing.assert_allclose(single, sharded, rtol=1e-6, atol=1e-7)


def test_sharded_train_step_matches_single(mesh):
    scene, _ = make_scene(vol_shape=(8, 8, 8))
    opts = scene.options(W, H)
    target = np.asarray(render_forward(scene, opts))

    # perturb emission so gradients are nonzero
    params, static_scene = train.split_params(scene)
    params = dict(params)
    params["emission"] = params["emission"] * 1.3 + 0.05

    optimizer = optax.sgd(1e-3)
    opt_state = optimizer.init(params)

    p1, _, loss1 = train.train_step(
        params, opt_state, static_scene, opts, jnp.asarray(target), optimizer
    )
    p8, _, loss8 = train.train_step_sharded(
        params, opt_state, static_scene, opts, jnp.asarray(target), optimizer,
        mesh=mesh,
    )
    assert np.isclose(float(loss1), float(loss8), rtol=1e-5)
    for k in p1:
        # band-wise sums + psum reassociate float adds vs the full-image
        # sum; allow a few-ulp drift
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p8[k]), rtol=1e-3, atol=1e-5,
            err_msg=f"param {k} mismatch",
        )


def test_train_reduces_loss(mesh):
    scene, _ = make_scene(vol_shape=(8, 8, 8))
    opts = scene.options(W, H)
    target = jnp.asarray(np.asarray(render_forward(scene, opts)))

    params, static_scene = train.split_params(scene)
    params = dict(params)
    params["emission"] = params["emission"] * 1.5 + 0.1

    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    losses = []
    for _ in range(5):
        params, opt_state, loss = train.train_step_sharded(
            params, opt_state, static_scene, opts, target, optimizer, mesh=mesh
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, f"loss did not decrease: {losses}"
