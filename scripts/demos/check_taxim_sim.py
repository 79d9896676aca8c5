"""Taxim optical sanity demo: render the tactile test-shape library.

Counterpart of reference scripts/demos/check_taxim_sim.py — presses every
shape from the analytic test-shape library into the gel and writes a montage
of the resulting tactile RGB images.

Usage: python scripts/demos/check_taxim_sim.py [--out /tmp/taxim_shapes.png]
       [--press 1.0] [--shadow]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root, so scripts run from anywhere

from tacex_tpu.assets.shapes import SHAPE_LIBRARY, shape_height_map
from tacex_tpu.sensors.gelsight import taxim as tx


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/taxim_shapes.png")
    p.add_argument("--press", type=float, default=1.0)
    p.add_argument("--shadow", action="store_true")
    p.add_argument("--res", type=int, nargs=2, default=(240, 320))
    args = p.parse_args()

    res = tuple(args.res)
    calib = tx.load_calib().at_resolution(res)
    names = list(SHAPE_LIBRARY)
    hms = np.stack([shape_height_map(n, res) for n in names])
    press = jnp.full((len(names),), args.press)
    imgs = np.asarray(
        tx.render(calib, jnp.asarray(hms), press_depth=press, with_shadow=args.shadow)
    )

    cols = 6
    rows = (len(names) + cols - 1) // cols
    h, w = res
    montage = np.ones((rows * h, cols * w, 3), np.float32)
    for i, img in enumerate(imgs):
        r, c = divmod(i, cols)
        montage[r * h : (r + 1) * h, c * w : (c + 1) * w] = img

    from PIL import Image

    Image.fromarray((montage * 255).astype(np.uint8)).save(args.out)
    print(f"{len(names)} shapes rendered -> {args.out}")


if __name__ == "__main__":
    main()
