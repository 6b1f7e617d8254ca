"""Fused custom-VJP renderer: primal equals forward; gradients equal the
scan-autodiff gradient oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_scene
from volume_renderer_tpu.ops.forward import render_forward
from volume_renderer_tpu.ops.vjp import render_fused

W, H = 12, 10

CASES = [
    dict(lighting=False, gradient_volumes=False),
    dict(lighting=True, gradient_volumes=False),
    dict(lighting=True, gradient_volumes=True),
]
IDS = ["plain", "light-otf", "light-lookup"]


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_primal_matches_forward(case):
    scene, _ = make_scene(vol_shape=(8, 6, 6), **case)
    opts = scene.options(W, H)
    a = np.asarray(render_forward(scene, opts))
    b = np.asarray(jax.jit(lambda s: render_fused(s, opts))(scene))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def _grads(render, scene, opts, weights, keys):
    """Gradient of sum(render(scene) * weights) wrt selected scene leaves."""

    def loss(leaves):
        s = scene.replace(
            emission=scene.emission.replace(data=leaves["emission"]),
            absorption=scene.absorption.replace(data=leaves["absorption"]),
            reflection=scene.reflection.replace(data=leaves["reflection"]),
            settings=scene.settings.replace(
                factor_emission=leaves["factor_emission"],
                factor_absorption=leaves["factor_absorption"],
                factor_reflection=leaves["factor_reflection"],
                color=leaves["color"],
            ),
        )
        if "light_colors" in leaves:
            s = s.replace(light_colors=leaves["light_colors"])
        if "gradient_x" in leaves:
            s = s.replace(
                gradient_x=scene.gradient_x.replace(data=leaves["gradient_x"]),
                gradient_y=scene.gradient_y.replace(data=leaves["gradient_y"]),
                gradient_z=scene.gradient_z.replace(data=leaves["gradient_z"]),
            )
        return jnp.sum(render(s) * weights)

    leaves = {
        "emission": scene.emission.data,
        "absorption": scene.absorption.data,
        "reflection": scene.reflection.data,
        "factor_emission": scene.settings.factor_emission,
        "factor_absorption": scene.settings.factor_absorption,
        "factor_reflection": scene.settings.factor_reflection,
        "color": scene.settings.color,
    }
    if scene.has_lighting:
        leaves["light_colors"] = scene.light_colors
    if scene.has_gradient_volumes:
        leaves["gradient_x"] = scene.gradient_x.data
        leaves["gradient_y"] = scene.gradient_y.data
        leaves["gradient_z"] = scene.gradient_z.data
    leaves = {k: v for k, v in leaves.items() if k in keys}
    return jax.jit(jax.grad(loss))(leaves)


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_gradients_match_scan_autodiff(case):
    scene, _ = make_scene(vol_shape=(8, 6, 6), **case)
    opts = scene.options(W, H)
    rng = np.random.default_rng(0)
    weights = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))

    keys = {
        "emission", "absorption", "reflection",
        "factor_emission", "factor_absorption", "factor_reflection", "color",
    }
    if case["lighting"]:
        keys.add("light_colors")
    if case["gradient_volumes"]:
        keys |= {"gradient_x", "gradient_y", "gradient_z"}

    g_scan = _grads(
        lambda s: render_forward(s, opts, differentiable=True), scene, opts, weights, keys
    )
    g_fused = _grads(lambda s: render_fused(s, opts), scene, opts, weights, keys)

    for k in sorted(keys):
        a, b = np.asarray(g_scan[k]), np.asarray(g_fused[k])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=3e-5 * scale, err_msg=f"grad mismatch for {k}"
        )
        if k in ("emission", "absorption"):
            assert np.abs(a).max() > 0, f"degenerate zero gradient for {k}"
