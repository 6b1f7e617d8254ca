"""Golden-image regression fixtures for the 5 BASELINE.json configs.

Small committed renders (synthetic stand-ins for the unshipped zebrafish
data) pin the full camera -> ray -> march -> compositing pipeline: a
regression that stays self-consistent across the oracle and the batched
paths (e.g. a camera or stereo transcription error) still fails here.

Regenerate (only after an INTENDED semantic change) with:
    python tests/test_goldens.py --regen
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from volume_renderer_tpu.api.renderer import StereoRenderMode, VolumeRenderer  # noqa: E402
from volume_renderer_tpu.models.lights import LightSource  # noqa: E402
from volume_renderer_tpu.models.volume import Volume  # noqa: E402
from volume_renderer_tpu.ops.forward import render_forward  # noqa: E402
from volume_renderer_tpu.ops.hg import henyey_greenstein_lut  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

W, H = 24, 20


def _vols(n=18, seed=7):
    rng = np.random.RandomState(seed)
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2.0
    r2 = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) / c
    em = np.exp(-6.0 * (r2 - 0.55) ** 2).astype(np.float32)
    structure = (np.exp(-8.0 * ((x - c) / c) ** 2)
                 * np.exp(-4.0 * (r2 - 0.3) ** 2)).astype(np.float32)
    return em, structure


def _base_renderer(em):
    r = VolumeRenderer()
    r.volume_emission = Volume.create(em)
    r.volume_absorption = Volume.create(em * 0.8)
    r.focal_length = 3.0
    r.distance_to_object = 6.0
    r.rotate(125, 25, 0)
    r.image_resolution = (W, H)
    return r


def _config_renders():
    """name -> (H, W, 3) array for each BASELINE.json config stand-in."""
    em, structure = _vols()
    out = {}

    # 1. PR1: emission-absorption only, no lighting
    r = _base_renderer(em)
    out["pr1_plain"] = np.asarray(r.render())

    # 2. example1: on-the-fly gradients + HG lighting
    r = _base_renderer(em)
    r.volume_reflection = Volume.create(em)
    r.volume_illumination = henyey_greenstein_lut(16)
    r.light_sources = [LightSource([5, 8, -4], [1.0, 0.7, 0.4])]
    out["example1_otf"] = np.asarray(r.render())

    # 3. example1_grad: precomputed gradient volumes + transfer factors
    gx, gy, gz = Volume.create(em).gradient_volumes()
    r = _base_renderer(em)
    r.volume_reflection = Volume.create(em)
    r.volume_illumination = henyey_greenstein_lut(16)
    r.light_sources = [LightSource([5, 8, -4], [1.0, 0.7, 0.4])]
    r.volume_gradient_x, r.volume_gradient_y, r.volume_gradient_z = gx, gy, gz
    r.factor_emission, r.factor_absorption, r.factor_reflection = 1.2, 0.7, 0.5
    out["example1_grad"] = np.asarray(r.render())

    # 4. example3: two channels combined by addition
    r = _base_renderer(em)
    r.color = (1.0, 0.3, 1.0)
    img_a = np.asarray(r.render())
    r2_ = _base_renderer(structure)
    r2_.color = (0.3, 1.0, 0.3)
    img_b = np.asarray(r2_.render())
    out["example3_two_channel"] = img_a + img_b

    # 5. example2: off-axis stereo (RedCyan)
    r = _base_renderer(em)
    r.camera_x_offset = 0.25
    r.stereo_output = StereoRenderMode.RED_CYAN
    out["example2_stereo"] = np.asarray(r.render())

    return out


@pytest.mark.parametrize("name", [
    "pr1_plain", "example1_otf", "example1_grad", "example3_two_channel",
    "example2_stereo",
])
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    assert os.path.exists(path), (
        f"golden {name} missing; run python tests/test_goldens.py --regen")
    golden = np.load(path)
    got = _config_renders()[name]
    np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-6)


def test_stereo_delta_hand_derived():
    """Independent stereo fixture: the disparity/crop arithmetic checked
    against HAND-DERIVED constants from VolumeRender.m:279-295, not
    recomputed by the implementation's own formula.

    VolumeRender.m: base = CameraXOffset/2; fov = 2*atan(1/FocalLength);
    delta = round(base * H / (2 * f * tan(fov/2))). With f = 3,
    tan(fov/2) = 1/3, so the f's cancel: delta = round(base * H / 2).
    For camera_x_offset = 0.3 (base = 0.15) and H = 20:
    delta = round(1.5) = 2. Widened width = W + 2 = 26; the left eye
    drops its first 2 columns, the right eye keeps its first 24; RedCyan
    output = [left.R, right.G, right.B].
    """
    em, _ = _vols()
    r = _base_renderer(em)
    r.camera_x_offset = 0.3
    r.stereo_output = StereoRenderMode.RED_CYAN
    img = np.asarray(r.render())
    assert img.shape == (H, W, 3)

    delta = 2  # hand-derived above
    base = 0.15
    scene = r._build_scene()
    from volume_renderer_tpu.models.scene import build_render_options

    opts_w = build_render_options(
        scene.emission.extent_xyz, scene.emission.element_size_um,
        W + delta, H)
    right = np.asarray(render_forward(scene, opts_w, base))
    left = np.asarray(render_forward(scene, opts_w, -base))
    expected = np.stack(
        [left[:, delta:, 0], right[:, :W, 1], right[:, :W, 2]], axis=-1)
    np.testing.assert_allclose(img, expected, rtol=1e-5, atol=1e-7)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, img in _config_renders().items():
            np.save(os.path.join(GOLDEN_DIR, f"{name}.npy"), img)
            print(f"wrote {name}.npy {img.shape} max={img.max():.4g}")
    else:
        print(__doc__)
