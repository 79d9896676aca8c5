"""Falling soft cubes onto the ground — libuipc 'hello/falling cubes' sample.

Counterpart of reference source/tacex_uipc/examples/falling_cubes.py (which
drives libuipc inside Isaac): N environments each drop a soft cube onto the
ground plane; the batched IPC solver keeps them penetration-free.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root, so scripts run from anywhere

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu.physics.soft.ipc import RigidSdfScene
from tacex_tpu.uipc import StableNeoHookeanCfg, UipcObject, UipcObjectCfg, UipcSim, UipcSimCfg
from tacex_tpu.uipc.objects import TetMeshCfg


def main() -> None:
    n = 4
    sim = UipcSim(UipcSimCfg(num_envs=n, dt=1 / 120, enable_ground=True))
    cube = UipcObject(
        UipcObjectCfg(
            mesh_cfg=TetMeshCfg(size=(0.04, 0.04, 0.04), resolution=(3, 3, 3), center=(0, 0, 0.08)),
            constitution=StableNeoHookeanCfg(youngs_modulus=0.05, poisson_rate=0.45),
        ),
        sim,
    )
    sim.setup_sim()

    for i in range(60):
        sim.step()
        if i % 10 == 0:
            z = np.asarray(cube.nodal_pos_w[..., 2])
            print(f"step {i:3d}: min z {z.min():.4f}  max z {z.max():.4f}")
    z = np.asarray(cube.nodal_pos_w[..., 2])
    assert z.min() > -1e-4, "penetrated the ground!"
    print("cubes rest on the ground, penetration-free:", sim.get_sim_time_report())


if __name__ == "__main__":
    main()
