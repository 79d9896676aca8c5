"""Ramp sliding: friction ratios decide whether bodies slide or stick.

Counterpart of reference examples/libuipc-samples/10_ramp_sliding.py (cubes
on ramps with different contact friction ratios; low-friction cubes race
down, high-friction ones hold). Friction here is the solver-level lagged
Coulomb model, so each friction ratio runs as its own scene.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

import jax.numpy as jnp

from tacex_tpu.assets.meshes import box_mesh, weld_soup
from tacex_tpu.physics.soft.ipc import RigidSdfScene
from tacex_tpu.uipc import UipcObject, UipcObjectCfg, UipcSim, UipcSimCfg
from tacex_tpu.uipc.objects import AffineBodyConstitutionCfg


def run(mu: float, tilt: float = 0.35) -> float:
    """Drop a cube flush on a ramp of friction mu; return downhill travel."""
    n_vec = np.array([-np.sin(tilt), 0.0, np.cos(tilt)], np.float32)
    sim = UipcSim(
        UipcSimCfg(
            num_envs=1, dt=1 / 60, enable_ground=False,
            contact=UipcSimCfg.Contact(
                default_friction_ratio=mu, d_hat=0.002, resistance=1e4
            ),
        )
    )
    half = 0.02
    p, t = weld_soup(box_mesh(half, half, half))
    # orient the cube flush with the ramp, center one half-extent above it
    R = np.array(
        [
            [np.cos(-tilt), 0.0, np.sin(-tilt)],
            [0.0, 1.0, 0.0],
            [-np.sin(-tilt), 0.0, np.cos(-tilt)],
        ],
        np.float32,
    )
    p = p @ R.T + (half + 0.0015) * n_vec
    cube = UipcObject(
        UipcObjectCfg(constitution=AffineBodyConstitutionCfg(m_kappa=100.0)),
        sim, points=p.astype(np.float32), triangles=t,
    )
    sim.setup_sim()
    ramp = RigidSdfScene.empty(1)
    ramp = RigidSdfScene(
        ramp.spheres, ramp.boxes, ramp.capsules,
        ramp.planes.at[0, 0].set(jnp.asarray([*n_vec, 0.0])),
    )
    x0 = float(cube.root_pos_w[0, 0])
    for _ in range(90):
        sim.step(ramp)
    sim.check_health()
    return x0 - float(cube.root_pos_w[0, 0])  # downhill = -x


def main() -> None:
    travel = {mu: run(mu) for mu in (0.0, 0.2, 0.9)}
    for mu, d in travel.items():
        print(f"friction {mu:.1f}: slid {d * 100:+.1f} cm downhill")
    assert travel[0.0] > travel[0.9] + 0.02, travel
    assert abs(travel[0.9]) < 0.02, travel
    assert travel[0.0] >= travel[0.2] - 1e-3, travel
    print("ramp sliding: friction ordering matches the reference sample")


if __name__ == "__main__":
    main()
