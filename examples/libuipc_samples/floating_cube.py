"""Floating cube: an animated SoftPositionConstraint holds a soft cube in
the air and carries it along a trajectory.

Counterpart of reference examples/floating_cube.py (a StableNeoHookean cube
whose top vertices are driven by a libuipc ``Animation`` writing
``aim_position``/``is_constrained`` each frame — the cube hangs from moving
anchors instead of falling). The animation closure here is an
``aim_provider`` evaluated every step.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

import jax.numpy as jnp

from tacex_tpu.uipc import StableNeoHookeanCfg, UipcObject, UipcObjectCfg, UipcSim, UipcSimCfg
from tacex_tpu.uipc.objects import TetMeshCfg


def main() -> None:
    n = 2
    dt = 1 / 60
    sim = UipcSim(UipcSimCfg(num_envs=n, dt=dt, enable_ground=True))
    cube = UipcObject(
        UipcObjectCfg(
            mesh_cfg=TetMeshCfg(size=(0.04, 0.04, 0.04), resolution=(3, 3, 3), center=(0, 0, 0.1)),
            constitution=StableNeoHookeanCfg(youngs_modulus=0.05),
        ),
        sim,
    )
    top = np.where(cube.mesh.points[:, 2] > 0.12 - 1e-6)[0].astype(np.int32)
    rest_top = jnp.asarray(cube.mesh.points[top])
    frame = {"i": 0}

    def animate_anchors():
        # circle in xy while holding height — the "floating" trajectory
        t = frame["i"] * dt
        off = jnp.array([0.03 * np.sin(t), 0.03 * (1 - np.cos(t)), 0.0], jnp.float32)
        return jnp.broadcast_to(rest_top + off, (n, len(top), 3))

    cube.set_attachments(top, aim_provider=animate_anchors, strength_ratio=200.0)
    sim.setup_sim()

    z_hist = []
    for i in range(150):
        frame["i"] = i
        sim.step()
        z_hist.append(float(cube.root_pos_w[0, 2]))
    sim.check_health()

    z = np.asarray(z_hist)
    xy = np.asarray(cube.root_pos_w[0, :2])
    # floats: never lands, hangs below its anchors under gravity stretch
    assert z.min() > 0.05, f"cube fell: {z.min():.3f}"
    # and it followed the moving anchors laterally
    assert np.linalg.norm(xy) > 0.01, xy
    print(f"floating cube: held at z ~ {z[-1]:.3f} m while tracking the anchors (xy {xy.round(3)})")


if __name__ == "__main__":
    main()
