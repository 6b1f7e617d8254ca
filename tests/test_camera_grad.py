"""Camera/pose gradients through the rematerialized scan path.

The fused custom-VJP path (ops/vjp.py) treats ray geometry as
non-differentiable, but ``render_forward(..., differentiable=True)`` is
plain autodiff: gradients flow through ray generation, the box clip, and
every sample position to the camera parameters. (The early-termination
boundary and per-step masks stay non-differentiable — the smooth-part
convention of differentiable ray marchers.) These tests pin that the
gradients exist and are USEFUL: gradient descent on the rotation matrix
recovers a perturbed camera pose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tests.helpers import make_scene
from volume_renderer_tpu.ops.forward import render_forward

W, H = 24, 20


def test_camera_rotation_gradients_finite_nonzero():
    scene, _ = make_scene(vol_shape=(12, 10, 8))
    opts = scene.options(W, H)
    target = render_forward(scene, opts)
    cam0 = scene.camera

    def loss(rot):
        s = scene.replace(camera=cam0.replace(rotation=rot))
        img = render_forward(s, opts, differentiable=True)
        return jnp.mean((img - target) ** 2)

    g = jax.grad(loss)(cam0.rotation + 0.03)
    assert bool(jnp.isfinite(g).all())
    assert bool(jnp.any(g != 0))


def test_pose_optimization_recovers_rotation():
    """Inverse rendering of the camera: a perturbed rotation descends back
    toward the target pose (loss strictly drops, rotation error shrinks)."""
    scene, _ = make_scene(vol_shape=(14, 12, 10))
    opts = scene.options(W, H)
    target = render_forward(scene, opts)
    cam0 = scene.camera
    rot_true = cam0.rotation

    @jax.jit
    def loss(rot):
        s = scene.replace(camera=cam0.replace(rotation=rot))
        img = render_forward(s, opts, differentiable=True)
        return jnp.mean((img - target) ** 2)

    rot = rot_true + 0.02 * jnp.asarray(
        np.random.RandomState(0).randn(3, 3), jnp.float32)
    opt = optax.adam(2e-3)
    st = opt.init(rot)
    l0 = float(loss(rot))
    e0 = float(jnp.sum((rot - rot_true) ** 2))
    grad_fn = jax.jit(jax.grad(loss))
    for _ in range(30):
        g = grad_fn(rot)
        up, st = opt.update(g, st, rot)
        rot = optax.apply_updates(rot, up)
    l1 = float(loss(rot))
    e1 = float(jnp.sum((rot - rot_true) ** 2))
    assert l1 < 0.5 * l0, (l0, l1)
    assert e1 < e0, (e0, e1)


def test_camera_grads_through_fused_vjp_match_scan():
    """The O(1)-memory replay backward (ops.vjp.render_fused with
    camera_grads=True) produces the same rotation gradients as the
    rematerialized scan path (SURVEY section 7.4: d/d(camera) in the
    fused backward contract)."""
    from volume_renderer_tpu.ops.vjp import render_fused

    scene, _ = make_scene(vol_shape=(12, 10, 8))
    opts = scene.options(W, H)
    target = render_forward(scene, opts)
    cam0 = scene.camera
    rot = cam0.rotation + 0.03

    def loss_scan(r):
        s = scene.replace(camera=cam0.replace(rotation=r))
        img = render_forward(s, opts, differentiable=True)
        return jnp.mean((img - target) ** 2)

    def loss_fused(r):
        s = scene.replace(camera=cam0.replace(rotation=r))
        img = render_fused(s, opts, camera_grads=True)
        return jnp.mean((img - target) ** 2)

    g_scan = np.asarray(jax.grad(loss_scan)(rot))
    g_fused = np.asarray(jax.grad(loss_fused)(rot))
    rel = np.abs(g_fused - g_scan).max() / np.abs(g_scan).max()
    assert rel < 5e-3, rel


def test_pose_optimization_through_fused_vjp():
    """Pose recovery end-to-end through the production O(1)-memory
    backward: the perturbed rotation descends toward the target pose."""
    from volume_renderer_tpu.ops.vjp import render_fused

    scene, _ = make_scene(vol_shape=(14, 12, 10))
    opts = scene.options(W, H)
    target = render_forward(scene, opts)
    cam0 = scene.camera
    rot_true = cam0.rotation

    @jax.jit
    def loss(rot):
        s = scene.replace(camera=cam0.replace(rotation=rot))
        img = render_fused(s, opts, camera_grads=True)
        return jnp.mean((img - target) ** 2)

    rot = rot_true + 0.02 * jnp.asarray(
        np.random.RandomState(0).randn(3, 3), jnp.float32)
    opt = optax.adam(2e-3)
    st = opt.init(rot)
    l0 = float(loss(rot))
    e0 = float(jnp.sum((rot - rot_true) ** 2))
    grad_fn = jax.jit(jax.grad(loss))
    for _ in range(30):
        g = grad_fn(rot)
        up, st = opt.update(g, st, rot)
        rot = optax.apply_updates(rot, up)
    l1 = float(loss(rot))
    e1 = float(jnp.sum((rot - rot_true) ** 2))
    assert l1 < 0.5 * l0, (l0, l1)
    assert e1 < e0, (e0, e1)
