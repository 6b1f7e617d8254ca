"""Volume aliasing (absorption/reflection = emission): same image, fewer
gathers, and gradients folded into the emission grid."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import make_scene
from volume_renderer_tpu.ops.forward import render_forward
from volume_renderer_tpu.ops.vjp import render_fused

W, H = 12, 10


def _aliased_and_explicit(lighting):
    scene, _ = make_scene(vol_shape=(8, 6, 6), lighting=lighting)
    explicit = scene.replace(
        absorption=scene.absorption.replace(data=scene.emission.data),
        reflection=scene.reflection.replace(data=scene.emission.data),
    )
    aliased = scene.replace(absorption=None, reflection=None)
    return aliased, explicit


def test_aliased_render_matches_explicit():
    for lighting in (False, True):
        aliased, explicit = _aliased_and_explicit(lighting)
        opts = aliased.options(W, H)
        a = np.asarray(render_forward(aliased, opts))
        b = np.asarray(render_forward(explicit, opts))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_aliased_gradients_fold_into_emission():
    aliased, explicit = _aliased_and_explicit(True)
    opts = aliased.options(W, H)
    rng = np.random.default_rng(0)
    weights = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))

    def loss_aliased(em):
        s = aliased.replace(emission=aliased.emission.replace(data=em))
        return jnp.sum(render_fused(s, opts) * weights)

    def loss_explicit(leaves):
        s = explicit.replace(
            emission=explicit.emission.replace(data=leaves["em"]),
            absorption=explicit.absorption.replace(data=leaves["ab"]),
            reflection=explicit.reflection.replace(data=leaves["re"]),
        )
        return jnp.sum(render_fused(s, opts) * weights)

    em = aliased.emission.data
    g_aliased = np.asarray(jax.grad(loss_aliased)(em))
    g_explicit = jax.grad(loss_explicit)({"em": em, "ab": em, "re": em})
    combined = (
        np.asarray(g_explicit["em"]) + np.asarray(g_explicit["ab"]) + np.asarray(g_explicit["re"])
    )
    scale = max(np.abs(combined).max(), 1e-6)
    np.testing.assert_allclose(g_aliased, combined, rtol=2e-4, atol=3e-5 * scale)


def test_api_dedups_identical_volumes():
    from tests.helpers import smooth_random_volume
    from volume_renderer_tpu.api.renderer import VolumeRenderer
    from volume_renderer_tpu.models.volume import Volume

    rng = np.random.default_rng(5)
    vol = Volume.create(smooth_random_volume(rng, (8, 6, 6), 2.0))
    r = VolumeRenderer()
    r.volume_emission = vol
    r.volume_absorption = vol  # same object -> aliased
    r.focal_length, r.distance_to_object = 3.0, 6.0
    r.image_resolution = (10, 8)
    r.rotate(20, 10, 5)
    scene = r._build_scene()
    assert scene.absorption_aliased
    img = np.asarray(r.render())
    assert img.shape == (8, 10, 3) and np.isfinite(img).all()
