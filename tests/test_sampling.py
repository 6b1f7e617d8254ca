"""Trilinear sampling semantics (CUDA-texture contract)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.numpy_ref import trilinear as np_trilinear
from volume_renderer_tpu.ops.float3 import F3
from volume_renderer_tpu.ops.sampling import sample_trilinear


@pytest.fixture
def vol():
    rng = np.random.default_rng(7)
    return rng.random((9, 7, 5)).astype(np.float32)


def test_voxel_centers_exact(vol):
    """coord (i + 0.5) / N must return the voxel value exactly."""
    d, h, w = vol.shape
    for (z, y, x) in [(0, 0, 0), (3, 2, 1), (8, 6, 4)]:
        c = F3(
            jnp.float32((x + 0.5) / w),
            jnp.float32((y + 0.5) / h),
            jnp.float32((z + 0.5) / d),
        )
        got = sample_trilinear(jnp.asarray(vol), c)
        assert np.allclose(np.asarray(got), vol[z, y, x], atol=1e-6)


def test_matches_numpy_reference(vol):
    rng = np.random.default_rng(3)
    # include out-of-range coords to exercise clamping
    coords = rng.uniform(-0.3, 1.3, size=(3, 200)).astype(np.float32)
    got = sample_trilinear(
        jnp.asarray(vol),
        F3(jnp.asarray(coords[0]), jnp.asarray(coords[1]), jnp.asarray(coords[2])),
    )
    want = np_trilinear(vol, coords[0], coords[1], coords[2])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_clamp_addressing(vol):
    """Far out-of-range coords clamp to the boundary voxel value."""
    got = sample_trilinear(
        jnp.asarray(vol), F3(jnp.float32(-5.0), jnp.float32(-5.0), jnp.float32(-5.0))
    )
    assert np.allclose(np.asarray(got), vol[0, 0, 0], atol=1e-6)
    got = sample_trilinear(
        jnp.asarray(vol), F3(jnp.float32(7.0), jnp.float32(7.0), jnp.float32(7.0))
    )
    assert np.allclose(np.asarray(got), vol[-1, -1, -1], atol=1e-6)


def test_gradient_wrt_volume_and_coords(vol):
    import jax

    v = jnp.asarray(vol)
    c = F3(jnp.float32(0.4), jnp.float32(0.6), jnp.float32(0.3))

    g_vol = jax.grad(lambda vv: sample_trilinear(vv, c))(v)
    # gradient is the trilinear weights: nonneg, sums to 1, 8 nonzeros max
    g = np.asarray(g_vol)
    assert g.min() >= 0
    assert np.isclose(g.sum(), 1.0, atol=1e-6)
    assert (g > 0).sum() <= 8

    # coord gradient == finite difference
    def f(cx):
        return sample_trilinear(v, F3(cx, c.y, c.z))

    g_c = jax.grad(f)(jnp.float32(0.4))
    eps = 1e-3
    fd = (f(jnp.float32(0.4 + eps)) - f(jnp.float32(0.4 - eps))) / (2 * eps)
    assert np.allclose(np.asarray(g_c), np.asarray(fd), rtol=1e-2, atol=1e-4)
