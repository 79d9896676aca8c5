"""Characterize the kinematic-collider CCD envelope (VERDICT r3 item 7).

libuipc's line search is CCD-filtered over the WHOLE system trajectory
(reference uipc_sim.py:63-66 ccd_tol): a collider approaching fast is swept,
never skipped. In this rebuild, analytic-scene colliders move BETWEEN steps
(their poses are solver inputs), so the line-search crossing tests
(ipc.py _segment_crosses_moving_triangle / _edge_pair_crossed) cannot see a
collider that jumps past a thin soft feature within one dt. This script
measures where that starts: a rigid sphere flies straight through a hanging
thin gel slab at sweeping velocity x dt, and we record whether the slab ever
reacted (max deflection of its free center) — tunneled = it never did.

Expected physics: the sphere is "seen" iff some intermediate pose overlaps
the slab's barrier support, i.e. per-step displacement <= thickness + 2*d_hat
+ sphere diameter-ish terms; measured numbers in docs/ccd_envelope.md.
Also verifies the fix: cfg.ccd_substeps=k with scene_prev threading sweeps
the collider pose linearly and rescues every tunneling config whose
per-SUBSTEP displacement is back inside the envelope.

Usage: python scripts/benchmarking/ccd_envelope.py [--substeps 1]
Prints one JSON line per (dt, velocity) config.
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu.physics.soft import (
    IpcSolverCfg,
    RigidSdfScene,
    SoftBodyModel,
    SoftBodyState,
    box_tet_mesh,
)

THICK = 0.0045  # slab thickness (m) — the gelpad preset
D_HAT = 0.001
R_SPH = 0.005


def build_model(dt: float, substeps: int) -> SoftBodyModel:
    # 20x25 mm slab, free center, rim attached (hangs like a drum skin)
    mesh = box_tet_mesh(
        size=(0.02, 0.025, THICK), resolution=(6, 7, 2), center=(0, 0, 0)
    )
    p = mesh.points
    rim = np.where(
        (np.abs(p[:, 0]) > 0.02 / 2 - 1e-6) | (np.abs(p[:, 1]) > 0.025 / 2 - 1e-6)
    )[0].astype(np.int32)
    cfg = IpcSolverCfg(
        dt=dt,
        newton_max_iter=6,
        cg_iters=16,
        d_hat=D_HAT,
        ccd_substeps=substeps,
        gravity=(0.0, 0.0, 0.0),  # isolate the collider interaction
    )
    return SoftBodyModel(mesh, cfg=cfg, attachment_verts=rim)


def sphere_scene(z: float) -> RigidSdfScene:
    sc = RigidSdfScene.empty(1)
    sc = sc.__class__(
        spheres=jnp.asarray([[[0.0, 0.0, z, R_SPH]]], jnp.float32),
        boxes=sc.boxes,
        capsules=sc.capsules,
        planes=sc.planes,
    )
    return sc


def run(dt: float, vel: float, substeps: int) -> dict:
    m = build_model(dt, substeps)
    aim = jnp.asarray(m.mesh.points[np.asarray(m.attachment_verts)])[None]
    state = SoftBodyState.init(1, m.mesh.points)
    x0 = jnp.asarray(m.mesh.points)

    z_start = R_SPH + THICK / 2 + 2 * D_HAT + 0.002
    n_frames = int(np.ceil(2 * z_start / (vel * dt))) + 2

    step = jax.jit(lambda s, sc, sc_prev: m.step(s, sc, aim, scene_prev=sc_prev))

    max_defl = 0.0
    z_prev = z_start
    for i in range(1, n_frames + 1):
        z = z_start - vel * dt * i
        state = step(state, sphere_scene(z), sphere_scene(z_prev))
        z_prev = z
        defl = float(jnp.abs(state.x[0] - x0).max())
        max_defl = max(max_defl, defl)

    tunneled = bool(max_defl < 2e-4)  # slab never reacted
    return {
        "dt": round(dt, 6),
        "velocity_mps": vel,
        "step_disp_mm": round(1e3 * vel * dt, 3),
        "substeps": substeps,
        "max_deflection_mm": round(1e3 * max_defl, 4),
        "tunneled": tunneled,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--substeps", type=int, default=1)
    ap.add_argument("--dts", type=float, nargs="*", default=[1 / 60, 1 / 120, 1 / 240, 1 / 480])
    ap.add_argument(
        "--velocities", type=float, nargs="*",
        default=[0.1, 0.2, 0.4, 0.8, 1.6, 3.2, 6.4],
    )
    args = ap.parse_args()
    for dt in args.dts:
        for v in args.velocities:
            print(json.dumps(run(dt, v, args.substeps)), flush=True)


if __name__ == "__main__":
    main()
