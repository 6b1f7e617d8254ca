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


def test_fused_intrinsics_gradients_match_scan_path():
    """render_fused(camera_grads=True) exposes d/d(focal, distance,
    x_offset) (SURVEY section 7.4, VERDICT r4 missing #7). Oracle: plain
    autodiff of the fixed-trip scan forward, which shares the fused
    path's smooth-part convention (masks/termination non-differentiable
    — a finite-difference oracle would be polluted by rays gaining or
    losing whole steps at the tfar boundary)."""
    from volume_renderer_tpu.ops.vjp import render_fused

    scene, _ = make_scene(vol_shape=(12, 10, 8))
    opts = scene.options(W, H)
    g = jnp.asarray(
        np.random.RandomState(3).randn(H, W, 3), jnp.float32) * 1e-2

    def out_dot_fused(focal, dist, xoff):
        s = scene.replace(camera=scene.camera.replace(
            focal_length=focal, distance_to_object=dist))
        return jnp.sum(g * render_fused(
            s, opts, xoff, camera_grads=True, early_exit=False))

    def out_dot_scan(focal, dist, xoff):
        s = scene.replace(camera=scene.camera.replace(
            focal_length=focal, distance_to_object=dist))
        return jnp.sum(g * render_forward(
            s, opts, xoff, differentiable=True))

    args = (jnp.float32(3.0), jnp.float32(6.0), jnp.float32(0.05))
    got = jax.grad(out_dot_fused, argnums=(0, 1, 2))(*args)
    ref = jax.grad(out_dot_scan, argnums=(0, 1, 2))(*args)
    for name, a, b in zip(("camera_focal", "camera_distance",
                           "camera_x_offset"), got, ref):
        a, b = float(a), float(b)
        assert np.isfinite(a), name
        assert b != 0.0, name
        assert abs(a - b) <= 2e-3 * max(abs(a), abs(b)), (
            f"{name}: fused={a:.6g} scan={b:.6g}")


def test_fused_intrinsics_optimization_recovers():
    """Joint pose + intrinsics inverse rendering through render_fused:
    perturbed (rotation, focal, distance) descend back toward the target."""
    from volume_renderer_tpu.ops.vjp import merge_scene, render_fused, split_scene

    scene, _ = make_scene(vol_shape=(14, 12, 10))
    opts = scene.options(W, H)
    target = render_fused(scene, opts, 0.0)
    diff0, template = split_scene(scene, with_camera=True)
    truth = {k: diff0[k] for k in ("camera_rotation", "camera_focal",
                                   "camera_distance")}

    def loss(cam_params):
        d = dict(diff0)
        d.update(cam_params)
        s = merge_scene(template, d)
        img = render_fused(s, opts, 0.0, camera_grads=True)
        return jnp.mean((img - target) ** 2)

    params = {
        "camera_rotation": truth["camera_rotation"] + 0.02,
        "camera_focal": truth["camera_focal"] + 0.15,
        "camera_distance": truth["camera_distance"] - 0.2,
    }
    opt = optax.adam(5e-3)
    st = opt.init(params)
    l0 = float(loss(params))

    def err(p):
        return sum(float(jnp.sum((p[k] - truth[k]) ** 2)) for k in truth)

    e0 = err(params)
    for _ in range(12):
        l, grads = jax.value_and_grad(loss)(params)
        upd, st = opt.update(grads, st, params)
        params = optax.apply_updates(params, upd)
    assert float(loss(params)) < l0
    assert err(params) < e0
