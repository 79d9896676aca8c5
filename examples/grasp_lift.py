"""Grasp-and-lift: two FEM gel pads lift a free rigid cube by friction.

The unified-contact-world showcase (physics/soft/coupled.py): FEM soft
bodies and a DYNAMIC affine body in one Newton solve with cross-system
barriers + friction — the core GelSight-gripper manipulation scenario
libuipc covers with its single contact world over the
FiniteElementMethod/AffineBodyDynamics subsystems (reference
uipc_sim.py:204-208). Two gel pads squeeze a dense cube (1 mm gaps, then
0.5 mm compression per side) and raise their mounts; the cube rides up on
friction alone — with mu = 0 it falls (tests/test_coupled.py runs that
control). Batched over 2 envs to show the coupled world vmaps like every
other solver here (libuipc is single-scene).
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import numpy as np

import jax.numpy as jnp

from tacex_tpu.physics.soft.mesh import box_tet_mesh
from tacex_tpu.uipc import (
    AffineBodyConstitutionCfg,
    StableNeoHookeanCfg,
    UipcObject,
    UipcObjectCfg,
    UipcSim,
    UipcSimCfg,
)

CUBE_HALF = 0.0075


def cube_surface(s=CUBE_HALF):
    pts = np.array(
        [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)], np.float64
    )
    tris = np.array(
        [
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        ],
        np.int64,
    )
    return pts, tris


def main() -> None:
    n = 2
    sim = UipcSim(UipcSimCfg(num_envs=n, dt=1 / 100))

    pads = []
    for sgn in (-1.0, +1.0):
        mesh = box_tet_mesh((0.01, 0.03, 0.03), (2, 4, 4), center=(sgn * 0.0135, 0, 0))
        pad = UipcObject(
            UipcObjectCfg(
                constitution=StableNeoHookeanCfg(youngs_modulus=0.1),  # MPa
                mass_density=1000.0,
            ),
            sim,
            mesh=mesh,
        )
        mount = np.where(sgn * mesh.points[:, 0] > 0.0185 - 1e-9)[0].astype(np.int32)
        pad._ctrl = {"mount": mount, "rest": mesh.points[mount].copy(), "sgn": sgn}
        pads.append(pad)

    pts, tris = cube_surface()
    cube = UipcObject(
        UipcObjectCfg(
            constitution=AffineBodyConstitutionCfg(m_kappa=100.0, kinematic=False),
            mass_density=2000.0,
        ),
        sim,
        points=pts,
        triangles=tris,
    )

    ctrl = {"squeeze": 0.0, "lift": 0.0}
    for pad in pads:
        c = pad._ctrl

        def provider(c=c):
            aim = c["rest"] + np.array([-c["sgn"] * ctrl["squeeze"], 0.0, ctrl["lift"]])
            return jnp.broadcast_to(jnp.asarray(aim, jnp.float32), (n,) + aim.shape)

        pad.set_attachments(c["mount"], aim_provider=provider)

    sim.setup_sim()
    assert sim._coupled is not None, "expected the unified FEM<->ABD contact world"

    for i in range(130):
        if i < 30:
            ctrl["squeeze"] = min(ctrl["squeeze"] + 1.5e-3 / 30, 1.5e-3)
        else:
            ctrl["lift"] += 1.5e-4
        sim.step()
        if i % 20 == 0:
            z = float(sim.abd_body_pose(cube)[0, 2])
            print(f"step {i:3d}  squeeze {ctrl['squeeze']*1e3:.2f} mm  "
                  f"lift {ctrl['lift']*1e3:.2f} mm  cube dz {z*1e3:+.2f} mm")

    z = float(sim.abd_body_pose(cube)[0, 2])
    print(f"final cube rise: {z*1e3:.2f} mm of {ctrl['lift']*1e3:.2f} mm commanded")
    assert z > 0.6 * ctrl["lift"], "cube was not carried by friction"
    y = np.asarray(sim.abd_vertex_positions(cube)[0])
    assert np.isfinite(y).all()
    print("grasp-and-lift OK: cube held and lifted by gel friction")


if __name__ == "__main__":
    main()
