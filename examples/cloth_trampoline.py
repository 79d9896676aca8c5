"""Cloth trampoline: a corner-pinned cloth catches a falling rigid body.

Showcase of shells inside the unified contact world: the cloth is a set
of codimensional (membrane + bending) elements of the nodal union and the
body is a free affine-body DOF — one Newton solve resolves the cross
barriers in both directions, so the body rests ON the cloth while the
cloth SAGS under its weight. libuipc runs cloth the same way: its
NeoHookeanShell / DiscreteShellBending are FiniteElement constitutions in
the one contact world (reference
source/tacex_uipc/tacex_uipc/sim/uipc_sim.py:23-26, 204-208).
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import numpy as np

from tacex_tpu.physics.soft.shell import grid_cloth
from tacex_tpu.uipc import (
    AffineBodyConstitutionCfg,
    NeoHookeanShellCfg,
    UipcObject,
    UipcObjectCfg,
    UipcSim,
    UipcSimCfg,
)


def cube_surface(s, center):
    pts = np.array(
        [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)], np.float64
    ) + np.asarray(center)
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
    sim = UipcSim(
        UipcSimCfg(
            dt=1 / 100, num_envs=1, enable_ground=True,
            contact=UipcSimCfg.Contact(coupling_k=4),
        )
    )
    nx = 7
    cp, ct = grid_cloth(nx, nx, size=0.06, z=0.03)
    cloth = UipcObject(
        UipcObjectCfg(
            constitution=NeoHookeanShellCfg(youngs_modulus=0.1),
            mass_density=200.0,
        ),
        sim, points=cp, triangles=ct,
    )
    corners = np.asarray([0, nx - 1, nx * (nx - 1), nx * nx - 1], np.int32)
    cloth.set_attachments(corners, strength_ratio=1e4)

    pts, tris = cube_surface(0.006, (0.0, 0.0, 0.045))
    body = UipcObject(
        UipcObjectCfg(
            constitution=AffineBodyConstitutionCfg(m_kappa=100.0),
            mass_density=1000.0,
        ),
        sim, points=pts, triangles=tris,
    )

    sim.setup_sim()
    assert cloth._union_range is not None, "cloth should join the nodal union"
    assert sim._coupled is not None, "expected the unified cloth<->ABD world"

    for i in range(80):
        sim.step()
        if i % 10 == 9:
            ctr_z = 0.045 + float(sim.abd_body_pose(body)[0, 2])
            cz = np.asarray(cloth.nodal_pos_w)[0, :, 2]
            print(
                f"step {i:3d}  body center z {ctr_z*1e3:6.2f} mm  "
                f"cloth center z {cz[(nx * nx) // 2]*1e3:6.2f} mm"
            )

    ctr_z = 0.045 + float(sim.abd_body_pose(body)[0, 2])
    cz = np.asarray(cloth.nodal_pos_w)[0, :, 2]
    assert np.isfinite(cz).all()
    assert ctr_z > 0.02, f"body fell through the cloth: {ctr_z}"
    assert cz[(nx * nx) // 2] < 0.0295, "cloth did not sag under the body"
    print(
        f"cloth-trampoline OK: body caught at {ctr_z*1e3:.1f} mm, "
        f"cloth sagged to {cz[(nx * nx) // 2]*1e3:.1f} mm"
    )


if __name__ == "__main__":
    main()
