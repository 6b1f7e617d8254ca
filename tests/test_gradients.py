"""Differentiability: autodiff gradients vs finite differences.

The backward pass (pixel -> voxel / transfer-parameter gradients) has no
counterpart in the forward-only reference; the differentiable scan forward
is the gradient oracle that the fused custom-VJP kernel must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_scene
from volume_renderer_tpu.ops.forward import render_forward

W, H = 12, 10


def _loss(scene, opts, weights):
    img = render_forward(scene, opts, differentiable=True)
    return jnp.sum(img * weights)


@pytest.mark.parametrize("lighting", [False, True], ids=["plain", "lit"])
def test_emission_grad_matches_fd(lighting):
    scene, _ = make_scene(vol_shape=(8, 6, 6), lighting=lighting)
    opts = scene.options(W, H)
    rng = np.random.default_rng(0)
    weights = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))

    def loss_of_em(em):
        s = scene.replace(emission=scene.emission.replace(data=em))
        return _loss(s, opts, weights)

    g = np.asarray(jax.grad(loss_of_em)(scene.emission.data))

    # probe voxels with central differences. The render is only piecewise
    # smooth (trilinear kinks, the zero-normal clamp, acos pole guards);
    # at a discontinuity FD measures the jump (~1/eps) while autodiff gives
    # the correct one-sided derivative — so first check FD is converged
    # across two eps values and skip probes that straddle a kink.
    def fd_at(idx, eps):
        ep = em0.copy()
        ep[idx] += eps
        em = em0.copy()
        em[idx] -= eps
        return (float(loss_of_em(jnp.asarray(ep))) - float(loss_of_em(jnp.asarray(em)))) / (2 * eps)

    em0 = np.asarray(scene.emission.data)
    idxs = [(2, 3, 1), (4, 2, 3), (1, 1, 1), (3, 2, 2), (5, 3, 4)]
    checked = 0
    for idx in idxs:
        fd1 = fd_at(idx, 1e-3)
        fd2 = fd_at(idx, 3e-3)
        if not np.isclose(fd1, fd2, rtol=0.1, atol=1e-4):
            continue  # non-smooth probe point
        assert np.isclose(g[idx], fd1, rtol=5e-2, atol=2e-4), (idx, g[idx], fd1)
        checked += 1
    assert checked >= 2, "too few smooth probe points"


def test_factor_grads_match_fd():
    scene, _ = make_scene(vol_shape=(8, 6, 6))
    opts = scene.options(W, H)
    rng = np.random.default_rng(1)
    weights = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))

    def loss_of_factors(fe, fa):
        s = scene.replace(
            settings=scene.settings.replace(factor_emission=fe, factor_absorption=fa)
        )
        return _loss(s, opts, weights)

    ge, ga = jax.grad(loss_of_factors, argnums=(0, 1))(jnp.float32(1.0), jnp.float32(0.6))
    eps = 1e-3
    fd_e = (float(loss_of_factors(jnp.float32(1 + eps), jnp.float32(0.6)))
            - float(loss_of_factors(jnp.float32(1 - eps), jnp.float32(0.6)))) / (2 * eps)
    fd_a = (float(loss_of_factors(jnp.float32(1.0), jnp.float32(0.6 + eps)))
            - float(loss_of_factors(jnp.float32(1.0), jnp.float32(0.6 - eps)))) / (2 * eps)
    assert np.isclose(float(ge), fd_e, rtol=2e-2, atol=1e-5)
    assert np.isclose(float(ga), fd_a, rtol=2e-2, atol=1e-5)


def test_color_grad_nonzero_and_fd():
    scene, _ = make_scene(vol_shape=(8, 6, 6))
    opts = scene.options(W, H)
    weights = jnp.ones((H, W, 3), jnp.float32)

    def loss_of_color(c):
        s = scene.replace(settings=scene.settings.replace(color=c))
        return _loss(s, opts, weights)

    c0 = jnp.asarray([1.0, 0.9, 0.8], jnp.float32)
    g = np.asarray(jax.grad(loss_of_color)(c0))
    assert (np.abs(g) > 0).all()
    eps = 1e-3
    dc = jnp.asarray([eps, 0.0, 0.0], jnp.float32)
    fd = (float(loss_of_color(c0 + dc)) - float(loss_of_color(c0 - dc))) / (2 * eps)
    assert np.isclose(g[0], fd, rtol=2e-2, atol=1e-5)
