"""Wrecking balls: a pile of affine bodies collapsing under gravity.

Counterpart of reference examples/libuipc-samples/6_wrecking_balls.py (many
AffineBodyConstitution cubes/balls/links, 10 MPa, dropped into a pile).
That scene is libuipc's own stress benchmark — its published trace is
230 ms/step on an RTX 4090 (reference docs/framework_details/libuipc.md:31-41).
Here: a stack of ABD cubes plus icosphere "balls" dropped onto them, all in
one dense-Newton ABD solve with body-body barriers.
"""

import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

from tacex_tpu.assets.meshes import box_mesh, icosphere, weld_soup
from tacex_tpu.uipc import UipcObject, UipcObjectCfg, UipcSim, UipcSimCfg
from tacex_tpu.uipc.objects import AffineBodyConstitutionCfg


def main() -> None:
    sim = UipcSim(
        UipcSimCfg(
            num_envs=1, dt=1 / 60, enable_ground=True,
            contact=UipcSimCfg.Contact(
                default_friction_ratio=0.5, d_hat=0.004, resistance=1e4
            ),
        )
    )
    abd = AffineBodyConstitutionCfg(m_kappa=10.0)  # reference: abd.apply_to(_, 10 MPa)
    half = 0.05
    bodies = []
    # 2x2 brick wall
    for ix in range(2):
        for iz in range(2):
            p, t = weld_soup(box_mesh(half, half, half))
            off = np.array(
                [(-0.06 + 0.12 * ix), 0.0, half + 0.004 + iz * (2 * half + 0.006)],
                np.float32,
            )
            bodies.append(
                UipcObject(UipcObjectCfg(constitution=abd), sim, points=p + off, triangles=t)
            )
    # two balls dropped onto the wall
    for ib in range(2):
        p, t = weld_soup(icosphere(0.05, 1))
        off = np.array([(-0.05 + 0.1 * ib), 0.01, 0.45 + 0.14 * ib], np.float32)
        bodies.append(
            UipcObject(UipcObjectCfg(constitution=abd), sim, points=p + off, triangles=t)
        )
    sim.setup_sim()

    t0 = time.perf_counter()
    steps = 120
    for i in range(steps):
        sim.step()
        if i % 20 == 0:
            zs = [float(b.root_pos_w[0, 2]) for b in bodies]
            print(f"step {i:3d}: body z = {np.round(zs, 3)}")
    wall = time.perf_counter() - t0
    sim.check_health()

    verts = np.concatenate([np.asarray(b.surface_positions()[0]) for b in bodies])
    assert verts[:, 2].min() > -2e-3, f"penetrated ground: {verts[:, 2].min():.4f}"
    zs = np.array([float(b.root_pos_w[0, 2]) for b in bodies])
    assert zs.max() < 0.4, "bodies failed to fall/settle"
    print(
        f"wrecking balls: {len(bodies)} affine bodies settled penetration-free; "
        f"{wall / steps * 1e3:.1f} ms/step"
    )


if __name__ == "__main__":
    main()
