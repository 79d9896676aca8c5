"""FOTS marker-motion sanity demo: press + shear + twist marker fields.

Counterpart of reference scripts/demos/check_fots_sim.py — presses a sphere
into the gel, applies shear and twist trajectories, and writes the marker
displacement overlays on the tactile image.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root, so scripts run from anywhere

from tacex_tpu.assets.shapes import shape_height_map
from tacex_tpu.sensors.gelsight import taxim as tx
from tacex_tpu.sensors.gelsight.fots import marker_motion as fots
from tacex_tpu.sensors.gelsight.taxim import optical


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/fots_demo.png")
    args = p.parse_args()

    res = (240, 320)
    calib = tx.load_calib().at_resolution(res)
    cfg = fots.FOTSMarkerCfg(num_markers_row=9, num_markers_col=11, x0=15, y0=26)
    init_m = fots.init_marker_grid(cfg)

    hm = shape_height_map("sphere_medium", res)
    hm_p = jnp.asarray(hm[None]) - hm.min() - 1.2

    deformed, mask = optical.compute_gel_deformation(calib, hm_p)
    rgb = np.asarray(tx.render(calib, hm_p, with_shadow=False))[0]
    depth = deformed.max(axis=(-2, -1), keepdims=True) - deformed

    cases = {
        "press": ([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], False),
        "shear": ([0.0, 0.0, 0.0], [1.2, 0.6, 0.0], True),
        "twist": ([0.0, 0.0, 0.0], [0.0, 0.0, 0.6], True),
        "shear+twist": ([0.0, 0.0, 0.0], [0.8, -0.5, 0.45], True),
    }
    panels = []
    for name, (t0, t1, valid) in cases.items():
        markers = fots.marker_motion(
            cfg,
            depth,
            mask,
            jnp.asarray([t0]),
            jnp.asarray([t1]),
            jnp.asarray([valid]),
            init_m,
        )
        dots = np.asarray(fots.draw_marker_image(cfg, markers))[0]
        panels.append(rgb * dots[..., None])
        print(f"{name}: max marker displacement "
              f"{float(jnp.abs(markers - init_m).max()):.2f} px")

    montage = np.concatenate(panels, axis=1)
    from PIL import Image

    Image.fromarray((np.clip(montage, 0, 1) * 255).astype(np.uint8)).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
