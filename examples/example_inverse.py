"""Inverse rendering: recover a voxel grid from rendered views.

No reference counterpart — this exercises the new backward pass: render
target views of a known scene, then optimize a perturbed emission grid
(and transfer factors) to match, using the fused custom-VJP renderer.
Runs multi-chip when more than one device is available.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import optax

from examples._data import init_platform, load_channels, save_image
from volume_renderer_tpu import train
from volume_renderer_tpu.models.camera import Camera
from volume_renderer_tpu.models.scene import RenderSettings, Scene
from volume_renderer_tpu.models.volume import Volume
from volume_renderer_tpu.ops.forward import render_forward
from volume_renderer_tpu.parallel.sharding import make_mesh


def main():
    init_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--res", type=int, default=48)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default="out/example_inverse")
    args = ap.parse_args()

    data_main, _, element_size_um = load_channels(args.size)
    target_scene = Scene(
        emission=Volume.create(data_main, element_size_um),
        absorption=None,  # aliased to emission
        camera=Camera.create(focal_length=3.0, distance_to_object=6.0).rotate(125, 25, 0),
        settings=RenderSettings.create(factor_absorption=0.5),
    )
    opts = target_scene.options(args.res, args.res)
    target = render_forward(target_scene, opts)

    params, static_scene = train.split_params(target_scene)
    params = dict(params)
    rng = np.random.default_rng(0)
    params["emission"] = jnp.asarray(
        np.clip(np.asarray(params["emission"]) * 0.5
                + 0.3 * rng.random(params["emission"].shape, np.float32), 0, 1)
    )

    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)

    n_dev = jax.device_count()
    mesh = make_mesh(n_dev) if n_dev > 1 and args.res % n_dev == 0 else None
    print(f"devices: {n_dev}; sharded: {mesh is not None}")

    for i in range(args.steps):
        if mesh is not None:
            params, opt_state, loss = train.train_step_sharded(
                params, opt_state, static_scene, opts, target, optimizer, mesh=mesh
            )
        else:
            params, opt_state, loss = train.train_step(
                params, opt_state, static_scene, opts, target, optimizer
            )
        if i % 5 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.5f}")

    final_scene = train.merge_params(params, static_scene)
    final = np.asarray(render_forward(final_scene, opts))
    save_image(args.out + "_target.png", np.asarray(target) / max(float(jnp.max(target)), 1e-6))
    save_image(args.out + "_recovered.png", final / max(final.max(), 1e-6))
    em_err = float(jnp.mean(jnp.abs(params["emission"] - target_scene.emission.data)))
    print(f"mean |emission error|: {em_err:.4f}; wrote {args.out}_*.png")


if __name__ == "__main__":
    main()
