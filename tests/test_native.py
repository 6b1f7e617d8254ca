"""Native host runtime (libvrtcore.so via ctypes) vs the JAX/numpy paths."""

import numpy as np
import pytest

from volume_renderer_tpu import native
from volume_renderer_tpu.ops.hg import henyey_greenstein_lut


@pytest.fixture(scope="module")
def vol():
    rng = np.random.default_rng(3)
    return rng.random((20, 16, 12)).astype(np.float32)


def test_library_builds_and_loads():
    # the toolchain is part of the environment; the native path must be live
    assert native.available()


def test_timestamp_monotonic():
    a = native.timestamp_ms()
    b = native.timestamp_ms()
    assert b >= a > 1_500_000_000_000  # sanity: epoch ms, after 2017


def test_content_hash_dedup(vol):
    assert native.content_hash(vol) == native.content_hash(vol.copy())
    v2 = vol.copy()
    v2[3, 4, 5] += 1e-4
    assert native.content_hash(vol) != native.content_hash(v2)


def test_hg_lut_matches_jax():
    got = native.hg_lut(16, 0.8)
    want = np.asarray(henyey_greenstein_lut(16, 0.8))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_hg_lut_validates_g():
    with pytest.raises(ValueError):
        native.hg_lut(8, 2.0)


def test_gradient_matches_numpy(vol):
    gx, gy, gz = native.gradient(vol)
    ngz, ngy, ngx = np.gradient(vol)
    np.testing.assert_allclose(gx, ngx, atol=1e-6)
    np.testing.assert_allclose(gy, ngy, atol=1e-6)
    np.testing.assert_allclose(gz, ngz, atol=1e-6)


def test_resize_matches_jax(vol):
    import jax

    for shape in [(10, 8, 6), (30, 24, 18)]:
        got = native.resize_trilinear(vol, shape)
        want = np.asarray(
            jax.image.resize(np.asarray(vol), shape, method="linear", antialias=False)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_normalize(vol):
    out = native.normalize(vol * 7 - 3, 0.0, 1.0)
    assert np.isclose(out.min(), 0.0, atol=1e-6)
    assert np.isclose(out.max(), 1.0, atol=1e-6)


def test_pad(vol):
    out = native.pad(vol, 2, 0.5)
    assert out.shape == tuple(s + 4 for s in vol.shape)
    assert out[0, 0, 0] == 0.5
    np.testing.assert_array_equal(out[2:-2, 2:-2, 2:-2], vol)


def test_mip(vol):
    np.testing.assert_array_equal(native.mip(vol), vol.max(axis=0))
