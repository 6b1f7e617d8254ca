"""End-to-end render correctness: oracle and fused forward vs the
independent numpy reference, across feature combinations."""

import numpy as np
import pytest

from tests.helpers import make_scene
from tests.numpy_ref import render_numpy
from volume_renderer_tpu.ops.forward import render_forward
from volume_renderer_tpu.ops.oracle import render_oracle

W, H = 24, 20


def _opts(scene):
    return scene.options(W, H)


def assert_images_close(got, want, rtol=2e-4, atol=2e-5, frac=0.99, loose_atol=0.05):
    """Robust image comparison across independent float32 implementations.

    Rays sitting exactly on an early-termination boundary (opacity threshold
    or tfar crossing) can take one march step more/less between two
    implementations that differ by ulps (e.g. rsqrt vs 1/sqrt in the ray
    normalize), changing those pixels by up to one step's contribution.
    Require: >= ``frac`` of pixels inside the tight tolerance, ALL pixels
    inside ``loose_atol``.
    """
    got = np.asarray(got)
    want = np.asarray(want)
    ok = np.abs(got - want) <= (atol + rtol * np.abs(want))
    frac_ok = ok.mean()
    assert frac_ok >= frac, f"only {frac_ok:.4f} of pixels within tight tol"
    np.testing.assert_allclose(got, want, atol=loose_atol)


CASES = [
    dict(lighting=False, gradient_volumes=False),
    dict(lighting=True, gradient_volumes=False),
    dict(lighting=True, gradient_volumes=True),
]


@pytest.mark.parametrize("case", CASES, ids=["plain", "light-otf", "light-lookup"])
def test_oracle_matches_numpy(case):
    scene, np_args = make_scene(**case)
    img = np.asarray(render_oracle(scene, _opts(scene)))
    want = render_numpy(width=W, height=H, **np_args)
    assert img.shape == (H, W, 3)
    assert_images_close(img, want)


@pytest.mark.parametrize("case", CASES, ids=["plain", "light-otf", "light-lookup"])
def test_forward_matches_oracle(case):
    scene, _ = make_scene(**case)
    opts = _opts(scene)
    a = np.asarray(render_oracle(scene, opts))
    b = np.asarray(render_forward(scene, opts))
    # same step math, but two differently-compiled programs (vmap'd
    # while_loop vs batched march) may contract FMAs differently
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_forward_differentiable_matches():
    scene, _ = make_scene(lighting=True)
    opts = _opts(scene)
    a = np.asarray(render_forward(scene, opts))
    b = np.asarray(render_forward(scene, opts, differentiable=True))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_nonuniform_element_size():
    scene, np_args = make_scene(element_size_um=(0.5, 1.0, 2.0))
    img = np.asarray(render_forward(scene, _opts(scene)))
    want = render_numpy(width=W, height=H, **np_args)
    assert_images_close(img, want)


def test_camera_x_offset():
    scene, np_args = make_scene()
    np_args["camera_x_offset"] = 0.7
    img = np.asarray(render_forward(scene, _opts(scene), camera_x_offset=0.7))
    want = render_numpy(width=W, height=H, **np_args)
    assert_images_close(img, want)


def test_opacity_early_termination():
    """A dense absorber saturates; early termination must not change values."""
    scene, np_args = make_scene(factors=(5.0, 0.2, 50.0), opacity_threshold=0.6)
    opts = _opts(scene)
    a = np.asarray(render_oracle(scene, opts))
    b = np.asarray(render_forward(scene, opts))
    want = render_numpy(width=W, height=H, **np_args)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    assert_images_close(a, want)


def test_miss_rays_are_black():
    """Camera displaced far sideways -> all rays miss the box -> zeros."""
    scene, _ = make_scene(rotate=(0.0, 0.0, 0.0))
    img = np.asarray(render_forward(scene, _opts(scene), camera_x_offset=100.0))
    assert np.all(img == 0.0)


def test_box_behind_camera_single_clamped_step():
    """Reference quirk: if the box is entirely behind the camera the slab
    test still reports a hit (tnear < tfar < 0); tnear clamps to 0 and
    exactly ONE step executes at the (clamped) origin sample
    (volumeRender_kernel.cu:424-493). Oracle and forward must agree."""
    scene, np_args = make_scene(rotate=(0.0, 0.0, 0.0))
    cam = scene.camera.replace(distance_to_object=-6.0)
    scene = scene.replace(camera=cam)
    np_args["distance"] = -6.0
    opts = _opts(scene)
    a = np.asarray(render_oracle(scene, opts))
    b = np.asarray(render_forward(scene, opts))
    # same step math, but two differently-compiled programs (vmap'd
    # while_loop vs batched march) may contract FMAs differently
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    assert np.any(a != 0.0)  # the single clamped step contributes
