"""Two channels, two light sources, one illustration image.

Port of reference examples/paper_illustration_multiple_channels.m: render
the structure channel (magenta, self-absorbing) and the main channel
(transparent white against a resized/normalized absorption volume) as
separate passes, print mem_info between them, and combine as
imcomplement(main) + structure (paper_illustration_multiple_channels.m:
49-80).

Run: python examples/paper_illustration_multiple_channels.py [--size N]
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
    ap.add_argument("--size", type=int, default=96, help="synthetic volume size")
    ap.add_argument("--res", type=int, nargs=2, default=None, help="image W H")
    ap.add_argument("--out", default="out/paper_illustration")
    args = ap.parse_args()

    data_main, data_structure, element_size_um = load_channels(args.size)
    emission_main = Volume.create(data_main)
    emission_structure = Volume.create(data_structure)

    # general settings (paper_illustration_multiple_channels.m:29-47)
    render = VolumeRenderer()
    render.volume_illumination = henyey_greenstein_lut(64)
    render.light_sources = [
        LightSource([0, 0, 3], [1, 1, 1]),
        LightSource([0, -5, 0], [1, 1, 1]),
    ]
    render.element_size_um = element_size_um
    render.focal_length = 4.5
    render.distance_to_object = 6
    render.rotate(45, 25, 45)
    render.opacity_threshold = 0.9
    if args.res:
        render.image_resolution = tuple(args.res)
    else:
        d, h, w = emission_structure.data.shape
        render.image_resolution = (w, h)

    # first image: structure channel (m:49-60)
    render.volume_emission = emission_structure
    render.volume_absorption = emission_structure
    render.factor_absorption = 0.6
    render.factor_reflection = 0.4
    render.color = (1, 0, 1)
    image_structure = np.asarray(render.render())

    print(render.mem_info())

    # second image: main channel against resized absorption (m:62-75)
    absorption = Volume.create(data_main).resize(0.5).normalize(0, 1)
    render.volume_emission = emission_main
    render.volume_absorption = absorption
    render.factor_emission = 0.1
    render.factor_absorption = 0.4
    render.factor_reflection = 0.1
    render.color = (1, 1, 1)
    image_main = np.asarray(render.render())

    # imcomplement(main) + structure (m:78-80)
    main_n = VolumeRenderer.normalize_image(image_main)
    combined = (1.0 - np.asarray(main_n)) + image_structure

    os.makedirs(args.out, exist_ok=True)
    save_image(os.path.join(args.out, "structure.png"), image_structure)
    save_image(os.path.join(args.out, "main.png"), image_main)
    save_image(os.path.join(args.out, "combined.png"), combined)
    print(f"wrote {args.out}/structure.png, main.png, combined.png")


if __name__ == "__main__":
    main()
