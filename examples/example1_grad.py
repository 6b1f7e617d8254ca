"""Precomputed-gradient-volume variant of example1 + mode-switch check.

Port of reference examples/example1_grad.m: the surface-normal source is
three precomputed gradient volumes (MATLAB ``gradient`` axis convention,
Volume.grad_matlab) instead of on-the-fly central differences; at the end
the gradients are reset and the scene re-rendered in compute mode
(example1_grad.m:93-98).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from examples._data import init_platform, load_channels, save_image
from volume_renderer_tpu import (
    LightSource,
    Volume,
    VolumeRenderer,
    henyey_greenstein_lut,
)


def main():
    init_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--out", default="out/example1_grad")
    args = ap.parse_args()

    data_main, data_structure, element_size_um = load_channels(args.size)
    emission_main = Volume.create(data_main)
    emission_structure = Volume.create(data_structure)

    # gradients of the main channel, MATLAB axis pairing (example1_grad.m:28)
    g_x, g_y, g_z = emission_main.grad_matlab()

    render = VolumeRenderer()
    render.volume_gradient_x = g_x
    render.volume_gradient_y = g_y
    render.volume_gradient_z = g_z
    render.volume_illumination = henyey_greenstein_lut(64)
    render.light_sources = [
        LightSource([500, 1000, 550], [0, 1, 1]),
        LightSource([0, 550, 90], [1, 0.5, 1]),
    ]
    render.element_size_um = element_size_um
    render.focal_length = 3.0
    render.distance_to_object = 6
    render.rotate(125, 25, 0)
    render.opacity_threshold = 0.9
    d, h, w = emission_structure.data.shape
    render.image_resolution = (w, h)

    render.volume_emission = emission_main
    render.volume_absorption = Volume.create(data_main).resize(0.5).normalize(0, 1)
    render.factor_emission = 0.1
    render.factor_absorption = 0.4
    render.factor_reflection = 0.1
    render.color = (1, 1, 1)

    image_lookup = np.asarray(render.render())
    save_image(args.out + "_lookup.png", image_lookup)

    # switch back to on-the-fly gradient computation and re-render
    render.reset_gradient_volumes()
    image_computed = np.asarray(render.render())
    save_image(args.out + "_computed.png", image_computed)

    corr = np.corrcoef(image_lookup.ravel(), image_computed.ravel())[0, 1]
    print(f"lookup-vs-computed correlation: {corr:.3f}")
    print(f"wrote {args.out}_lookup.png / _computed.png")


if __name__ == "__main__":
    main()
