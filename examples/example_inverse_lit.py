"""Inverse rendering of a LIT scene through the kernel backward.

No reference counterpart (the reference is forward-only) — this
exercises the round-5 lighting-on backward: the reference's flagship
configuration (example1: HG-LUT shading with on-the-fly gradients,
reference examples/example1.m, volumeRender_kernel.cu:308-353) is
rendered to target views, then a perturbed emission grid and the
transfer/light parameters are optimized to match with
``train.train_step_fast`` — the Pallas forward + in-kernel scatter
backward, which since round 5 carries the shading chain's cotangents
(d shade -> d normal -> d taps) so lit scenes train at kernel speed
instead of the replay path.

Usage: python examples/example_inverse_lit.py [--size 32] [--steps 20]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.numpy as jnp
import optax

from examples._data import init_platform, load_channels, save_image
from volume_renderer_tpu import train
from volume_renderer_tpu.models.camera import Camera
from volume_renderer_tpu.models.scene import RenderSettings, Scene
from volume_renderer_tpu.models.volume import Volume
from volume_renderer_tpu.ops.hg import henyey_greenstein_lut
from volume_renderer_tpu.ops.pallas_march import render_forward_fast


def main():
    init_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--res", type=int, default=48)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="out/example_inverse_lit")
    args = ap.parse_args()

    data, _, element_size_um = load_channels(args.size)
    cam = Camera.create(focal_length=3.0, distance_to_object=6.0)
    cam = cam.rotate(125, 25, 0)
    vol = Volume.create(data, element_size_um=element_size_um)
    scene = Scene(
        emission=vol,
        absorption=Volume.create(data * 0.8),
        reflection=Volume.create(data),
        camera=cam,
        settings=RenderSettings.create(
            factor_emission=1.0, factor_absorption=0.8,
            factor_reflection=0.5, color=(1.0, 0.9, 0.8)),
        illumination=henyey_greenstein_lut(32),
        light_positions=jnp.asarray([[2.0, 3.0, -1.5]], jnp.float32),
        light_colors=jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32),
    )
    opts = scene.options(args.res, args.res)
    target = render_forward_fast(scene, opts)
    os.makedirs(args.out, exist_ok=True)
    save_image(os.path.join(args.out, "target.png"), np.asarray(target))

    params, static_scene = train.split_params(scene)
    params = dict(params)
    params["emission"] = params["emission"] * 1.5 + 0.08
    params["factor_reflection"] = jnp.float32(0.2)
    opt = optax.adam(3e-3)
    st = opt.init(params)

    for i in range(args.steps):
        params, st, loss = train.train_step_fast(
            params, st, static_scene, opts, target, opt)
        if i % 5 == 0 or i == args.steps - 1:
            print(f"step {i:3d}: loss={float(loss):.6f}", flush=True)

    final = render_forward_fast(
        train.merge_params(params, static_scene), opts)
    save_image(os.path.join(args.out, "recovered.png"), np.asarray(final))
    err = float(jnp.mean((final - target) ** 2))
    print(f"final image MSE: {err:.3e} -> {args.out}/", flush=True)


if __name__ == "__main__":
    main()
