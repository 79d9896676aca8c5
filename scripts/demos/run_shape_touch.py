"""Shape-touch demo: press each test shape into the gel at increasing depth.

Counterpart of reference scripts/demos/shape_touch/run_shape_touch.py (which
drives the Franka to press 25 USD test shapes into the gel). Here each shape
from the analytic library is pressed over a depth ramp and the tactile RGB +
marker responses are recorded as an image strip per shape.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax.numpy as jnp

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root, so scripts run from anywhere

from tacex_tpu.assets import meshes
from tacex_tpu.assets.shapes import SHAPE_LIBRARY, shape_height_map
from tacex_tpu.render.depth_camera import render_depth
from tacex_tpu.sensors.gelsight import taxim as tx
from tacex_tpu.sensors.gelsight.fots import marker_motion as fots
from tacex_tpu.sensors.gelsight.taxim import optical


def mesh_height_map(name: str, res: tuple[int, int], pixmm: float = 0.059) -> np.ndarray:
    """Render a (h, w) height map in mm from the shape's TRIANGLE MESH.

    The camera hangs above the part's highest point looking straight down
    (the geometry the reference's RTX TiledCamera sees in run_shape_touch,
    reference scripts/demos/shape_touch/run_shape_touch.py), so the mesh
    rasterizer — not an analytic formula — produces the contact geometry.
    """
    tris = jnp.asarray(meshes.shape_mesh(name))
    h, w = res
    extent = (w * pixmm * 1e-3, h * pixmm * 1e-3)
    z_top = float(tris[..., 2].max())
    cam_pos = jnp.array([0.0, 0.0, z_top + 1e-4])
    cam_down = jnp.array([0.0, 1.0, 0.0, 0.0])  # 180 deg about x: +Z -> -Z
    far = 1e-4 + 6e-3  # camera offset + 6 mm of visible relief, like shapes.FAR
    depth = render_depth(
        cam_pos, cam_down,
        jnp.zeros((1, 4)), jnp.zeros((1, 10)), jnp.zeros((1, 8)), jnp.zeros((1, 4)),
        (w, h), extent, far, scene_triangles=tris,
    )
    hm = (np.asarray(depth) - float(depth.min())) * 1000.0  # meters -> mm, 0 = contact
    return hm.astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", nargs="*", default=["sphere_medium", "cube_edge", "cross"])
    p.add_argument("--depths", nargs="*", type=float, default=[0.3, 0.6, 0.9, 1.2, 1.5])
    p.add_argument("--out_dir", default="/tmp/shape_touch")
    p.add_argument("--res", type=int, nargs=2, default=(240, 320))
    p.add_argument(
        "--mesh", action="store_true",
        help="render contact geometry from triangle meshes (assets.meshes) "
        "instead of the analytic height-map library",
    )
    args = p.parse_args()

    res = tuple(args.res)
    calib = tx.load_calib().at_resolution(res)
    mcfg = fots.FOTSMarkerCfg(
        num_markers_row=9, num_markers_col=11, x0=15, y0=26,
        tactile_img_width=res[1], tactile_img_height=res[0],
    )
    init_m = fots.init_marker_grid(mcfg)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    from PIL import Image

    if args.mesh and args.shapes == ["sphere_medium", "cube_edge", "cross"]:
        args.shapes = ["sphere", "cube", "gear"]  # mesh-library defaults

    for name in args.shapes:
        if args.mesh:
            if name not in meshes.MESH_SHAPE_NAMES:
                print(f"unknown mesh shape {name}; available: {meshes.MESH_SHAPE_NAMES}")
                continue
            hm0 = mesh_height_map(name, res)
        elif name not in SHAPE_LIBRARY:
            print(f"unknown shape {name}; available: {sorted(SHAPE_LIBRARY)}")
            continue
        else:
            hm0 = shape_height_map(name, res)
        panels = []
        for depth in args.depths:
            hm = jnp.asarray(hm0[None])
            rgb = tx.render(calib, hm, press_depth=jnp.full((1,), depth), with_shadow=False)
            shifted = optical.shift_height_map(hm, jnp.full((1,), depth))
            deformed, mask = optical.compute_gel_deformation(calib, shifted)
            d_mk = deformed.max(axis=(-2, -1), keepdims=True) - deformed
            markers = fots.marker_motion(
                mcfg, d_mk, mask,
                jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.asarray([False]), init_m,
            )
            dots = fots.draw_marker_image(mcfg, markers)
            panels.append(np.asarray(rgb[0] * dots[0][..., None]))
        strip = np.concatenate(panels, axis=1)
        path = out_dir / f"{name}.png"
        Image.fromarray((np.clip(strip, 0, 1) * 255).astype(np.uint8)).save(path)
        print(f"{name}: pressed {args.depths} mm -> {path}")


if __name__ == "__main__":
    main()
