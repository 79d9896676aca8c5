"""Bunny cloth: a NeoHookeanShell cloth drapes over a fixed affine body.

Counterpart of reference examples/libuipc-samples/11_bunny_cloth.py: a
20x20 grid cloth (NeoHookeanShell 10 kPa, nu=0.499 in the sample, thickness
1 mm, density 200, DiscreteShellBending E=10) falls onto a FIXED
AffineBodyConstitution bunny (100 MPa, is_fixed=1). The fixed body here is
an icosphere trimesh standing in for bunny0.msh (no binary mesh assets in
this repo); the cloth-vs-fixed-body contact machinery is identical.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

from tacex_tpu.assets.meshes import icosphere, weld_soup
from tacex_tpu.physics.soft.shell import grid_cloth
from tacex_tpu.uipc import UipcObject, UipcObjectCfg, UipcSim, UipcSimCfg
from tacex_tpu.uipc.objects import AffineBodyConstitutionCfg, NeoHookeanShellCfg


def main() -> None:
    sim = UipcSim(
        UipcSimCfg(
            num_envs=1, dt=0.01, enable_ground=True,
            contact=UipcSimCfg.Contact(
                default_friction_ratio=0.5, d_hat=0.004, resistance=1e4
            ),
        )
    )
    # fixed "bunny": kinematic affine body the cloth lands on
    bp, bt = weld_soup(icosphere(0.1, 1))
    bunny = UipcObject(
        UipcObjectCfg(constitution=AffineBodyConstitutionCfg(m_kappa=100.0, kinematic=True)),
        sim, points=bp + np.array([0.0, 0.0, 0.1], np.float32), triangles=bt,
    )
    # the cloth grid (sample: grid20x20 scaled 2x; here 0.4 m over the body)
    cp, ct = grid_cloth(16, 16, size=0.4, z=0.3)
    cloth = UipcObject(
        UipcObjectCfg(
            constitution=NeoHookeanShellCfg(
                youngs_modulus=0.01, poisson_rate=0.3, thickness=0.001, bending_E=10.0
            ),
            mass_density=200.0,
        ),
        sim, points=cp, triangles=ct,
    )
    sim.setup_sim()

    for i in range(120):
        sim.step()
        if i % 20 == 0:
            z = np.asarray(cloth.nodal_pos_w[0, :, 2])
            print(f"step {i:3d}: cloth z [{z.min():.4f}, {z.max():.4f}]")
    sim.check_health()

    x = np.asarray(cloth.nodal_pos_w[0])
    z = x[:, 2]
    r = np.linalg.norm(x - np.array([0.0, 0.0, 0.1]), axis=-1)
    assert z.min() > -2e-3, f"cloth fell through the ground: {z.min():.4f}"
    assert r.min() > 0.09, f"cloth tunneled into the body: {r.min():.4f}"
    assert z.max() > 0.15, "cloth should drape OVER the body"
    assert z.max() - z.min() > 0.05, "cloth stayed rigid — no drape"
    print(
        f"bunny cloth: draped over the fixed body (top {z.max():.3f} m, "
        f"hem {z.min():.3f} m, clearance {r.min():.3f} m)"
    )


if __name__ == "__main__":
    main()
