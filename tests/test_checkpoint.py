"""Checkpoint/resume round-trip: training continues bit-identically."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tests.helpers import make_scene
from volume_renderer_tpu import train
from volume_renderer_tpu.ops.forward import render_forward
from volume_renderer_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip_resumes_identically(tmp_path):
    scene, _ = make_scene(vol_shape=(10, 8, 8))
    opts = scene.options(12, 10)
    target = render_forward(scene, opts)

    params, static_scene = train.split_params(scene)
    params = dict(params)
    params["emission"] = params["emission"] * 1.3 + 0.05
    opt = optax.adam(1e-2)
    st = opt.init(params)

    # two steps, checkpoint, one more step
    for step in range(2):
        params, st, _ = train.train_step(params, st, static_scene, opts, target, opt)
    path = os.path.join(tmp_path, "ck.npz")
    save_checkpoint(path, params, st, 2)
    params_cont, st_cont, loss_cont = train.train_step(
        params, st, static_scene, opts, target, opt)

    # resume from disk into fresh structures and take the same step
    fresh_params, _ = train.split_params(scene)
    fresh_st = opt.init(dict(fresh_params))
    params_r, st_r, step_r = load_checkpoint(path, dict(fresh_params), fresh_st)
    assert step_r == 2
    params_res, st_res, loss_res = train.train_step(
        params_r, st_r, static_scene, opts, target, opt)

    assert float(loss_res) == float(loss_cont)
    for key in params_cont:
        np.testing.assert_array_equal(
            np.asarray(params_res[key]), np.asarray(params_cont[key]))


def test_checkpoint_structure_mismatch_raises(tmp_path):
    import pytest

    scene, _ = make_scene(vol_shape=(10, 8, 8))
    params, _ = train.split_params(scene)
    opt = optax.adam(1e-2)
    st = opt.init(dict(params))
    path = os.path.join(tmp_path, "ck.npz")
    save_checkpoint(path, dict(params), st, 0)

    wrong = dict(params)
    wrong["extra_key"] = jnp.zeros(3)
    with pytest.raises(KeyError, match="structure"):
        load_checkpoint(path, wrong, st)


def test_phase_timer_and_trace(tmp_path):
    """Profiling harness smoke test: phases account, trace dir populated."""
    from volume_renderer_tpu.utils.profiling import PhaseTimer, trace

    scene, _ = make_scene(vol_shape=(10, 8, 8))
    opts = scene.options(12, 10)

    pt = PhaseTimer()
    with trace(str(tmp_path)):
        img = pt.timed("forward", lambda: render_forward(scene, opts))
    assert img.shape == (10, 12, 3)
    rep = pt.report()
    assert "forward" in rep and "total" in rep
    import os as _os
    assert any(files for _, _, files in _os.walk(tmp_path)), "empty trace dir"
