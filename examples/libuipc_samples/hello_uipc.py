"""Hello UIPC: a single soft tetrahedron falls onto the ground.

Counterpart of reference examples/libuipc-samples/1_hello_libuipc.py (one
StableNeoHookean tet dropped on the ground plane). Batched over envs here —
every env drops its own tet through the same jitted solve.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

from tacex_tpu.uipc import StableNeoHookeanCfg, UipcObject, UipcObjectCfg, UipcSim, UipcSimCfg


def main() -> None:
    n = 4
    sim = UipcSim(UipcSimCfg(num_envs=n, dt=1 / 60, enable_ground=True))
    # the libuipc hello tet: unit-ish tetrahedron above the ground
    points = 0.1 * np.array(
        [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]], np.float32
    ) + np.array([0.0, 0.0, 0.15], np.float32)
    tets = np.array([[1, 0, 2, 3]], np.int32)
    tet = UipcObject(
        UipcObjectCfg(constitution=StableNeoHookeanCfg(youngs_modulus=0.1)),
        sim, points=points, tets=tets,
    )
    sim.setup_sim()

    for i in range(90):
        sim.step()
        if i % 15 == 0:
            z = np.asarray(tet.nodal_pos_w[..., 2])
            print(f"step {i:3d}: z range [{z.min():.4f}, {z.max():.4f}]")

    z = np.asarray(tet.nodal_pos_w[..., 2])
    assert z.min() > -1e-4, "tet penetrated the ground"
    assert z.min() < 0.01, "tet did not land"
    print("hello uipc: tet landed penetration-free in all envs")


if __name__ == "__main__":
    main()
