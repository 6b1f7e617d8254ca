"""Volume ops, camera math, render options, light packing."""

import jax.numpy as jnp
import numpy as np
import pytest

from volume_renderer_tpu.models.camera import Camera
from volume_renderer_tpu.models.lights import LightSource, pack_lights
from volume_renderer_tpu.models.scene import build_render_options
from volume_renderer_tpu.models.volume import Volume


class TestVolume:
    def test_create_coerces_float32(self):
        v = Volume.create(np.arange(8, dtype=np.int64).reshape(2, 2, 2))
        assert v.data.dtype == jnp.float32

    def test_extent_xyz(self):
        v = Volume.create(np.zeros((4, 3, 2)))
        assert v.shape_dhw == (4, 3, 2)
        assert v.extent_xyz == (2, 3, 4)  # (W, H, D)

    def test_pad(self):
        v = Volume.create(np.ones((2, 2, 2))).pad(1, 0.0)
        assert v.data.shape == (4, 4, 4)
        assert float(v.data[0, 0, 0]) == 0.0
        assert float(v.data[1, 1, 1]) == 1.0

    def test_mip(self):
        data = np.zeros((3, 4, 5), np.float32)
        data[1, 2, 3] = 7.0
        img = np.asarray(Volume.create(data).mip())
        assert img.shape == (4, 5)
        assert img[2, 3] == 7.0

    def test_normalize(self):
        rng = np.random.default_rng(0)
        v = Volume.create(rng.random((4, 4, 4)) * 10 - 5).normalize(0, 1)
        assert np.isclose(float(v.min()), 0.0, atol=1e-6)
        assert np.isclose(float(v.max()), 1.0, atol=1e-6)

    def test_resize_scale(self):
        v = Volume.create(np.ones((8, 8, 8))).resize(0.5)
        assert v.data.shape == (4, 4, 4)
        np.testing.assert_allclose(np.asarray(v.data), 1.0, atol=1e-5)

    def test_gradient_volumes_matches_numpy(self):
        rng = np.random.default_rng(1)
        data = rng.random((6, 5, 4)).astype(np.float32)
        gx, gy, gz = Volume.create(data).gradient_volumes()
        ngz, ngy, ngx = np.gradient(data)
        np.testing.assert_allclose(np.asarray(gx.data), ngx, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy.data), ngy, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gz.data), ngz, atol=1e-6)

    def test_grad_matlab_axis_swap(self):
        rng = np.random.default_rng(2)
        data = rng.random((6, 5, 4)).astype(np.float32)
        vol = Volume.create(data)
        mx, my, mz = vol.grad_matlab()
        gx, gy, gz = vol.gradient_volumes()
        np.testing.assert_array_equal(np.asarray(mx.data), np.asarray(gy.data))
        np.testing.assert_array_equal(np.asarray(my.data), np.asarray(gx.data))
        np.testing.assert_array_equal(np.asarray(mz.data), np.asarray(gz.data))


class TestCamera:
    def test_identity_basis(self):
        cam = Camera.create()
        x, y, z = cam.basis()
        assert (float(x.x), float(x.y), float(x.z)) == (1.0, 0.0, 0.0)
        assert (float(y.x), float(y.y), float(y.z)) == (0.0, 1.0, 0.0)
        assert (float(z.x), float(z.y), float(z.z)) == (0.0, 0.0, 1.0)

    def test_rotate_90_x(self):
        cam = Camera.create().rotate(90, 0, 0)
        r = np.asarray(cam.rotation)
        want = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
        np.testing.assert_allclose(r, want, atol=1e-6)

    def test_rotation_composition_order(self):
        """rotate(a,b,c) == R @ Rx @ Ry @ Rz (right-multiplied, in order)."""
        cam = Camera.create().rotate(30, 40, 50)
        cam2 = Camera.create().rotate(30, 0, 0).rotate(0, 40, 0).rotate(0, 0, 50)
        np.testing.assert_allclose(
            np.asarray(cam.rotation), np.asarray(cam2.rotation), atol=1e-6
        )

    def test_orthonormal(self):
        cam = Camera.create().rotate(125, 25, 0)
        r = np.asarray(cam.rotation)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


class TestRenderOptions:
    def test_cube_box_and_tstep(self):
        opts = build_render_options((64, 64, 64), (1, 1, 1), 256, 256)
        assert opts.boxmax == (1.0, 1.0, 1.0)
        face_diag = np.float32(np.sqrt(np.float32(64 * 64 + 64 * 64)))
        want = np.float32(1.0) / (np.float32(2.2) * face_diag)
        assert np.isclose(opts.tstep, float(want), rtol=1e-7)

    def test_anisotropic_box(self):
        # extent (w=100,h=50,d=25), element size (1,2,4):
        # boxmax = (1, 50*2/100, 25*4/100) = (1, 1, 1)
        opts = build_render_options((100, 50, 25), (1, 2, 4), 64, 64)
        np.testing.assert_allclose(opts.boxmax, (1.0, 1.0, 1.0), rtol=1e-6)

    def test_min_face_diagonal_not_max(self):
        """The reference code takes fminf of the face diagonals
        (volumeRender.cpp:133-145) despite its comment; replicate the code."""
        opts = build_render_options((10, 10, 1000), (1, 1, 1), 8, 8)
        face_diag = np.sqrt(np.float32(10 * 10 + 10 * 10))  # the min one
        want = 1.0 / (2.2 * face_diag)
        assert np.isclose(opts.tstep, want, rtol=1e-6)

    def test_gradient_step(self):
        opts = build_render_options((10, 20, 40), (1, 1, 1), 8, 8)
        np.testing.assert_allclose(opts.gradient_step, (0.1, 0.05, 0.025))

    def test_hashable_static(self):
        a = build_render_options((16, 16, 16), (1, 1, 1), 32, 32)
        b = build_render_options((16, 16, 16), (1, 1, 1), 32, 32)
        assert a == b and hash(a) == hash(b)


class TestLights:
    def test_validation(self):
        with pytest.raises(ValueError):
            LightSource([1, 2], [1, 1, 1])
        with pytest.raises(ValueError):
            LightSource([1, 2, 3], [1])

    def test_pack(self):
        pos, col = pack_lights(
            [LightSource([1, 2, 3], [1, 0, 0]), LightSource([4, 5, 6], [0, 1, 0])]
        )
        assert pos.shape == (2, 3)
        np.testing.assert_allclose(np.asarray(pos)[1], [4, 5, 6])

    def test_pack_empty(self):
        pos, col = pack_lights([])
        assert pos.shape == (0, 3)
