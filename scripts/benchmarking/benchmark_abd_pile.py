"""Batched ABD pile benchmark: env-steps/s/chip for an 8-body pile at N envs.

The round-2 limitation was that ABD didn't batch: the dense (12B)^2
``jnp.linalg.solve`` saturated the chip at N=1 (~24 ms/env at N=8 envs).
``linear_solver="cg"`` replaces it with matrix-free preconditioned CG
(per-body 12x12 block preconditioner), which vmaps over envs like the FEM
solver. This script measures both and prints a JSON line per config.

Usage:  python scripts/benchmarking/benchmark_abd_pile.py [--envs 64]
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

import jax
import jax.numpy as jnp


def _cube(half=0.03):
    P = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half) for z in (-half, half)],
        np.float64,
    )
    faces = [
        (0, 1, 3, 2, [-1, 0, 0]),
        (4, 6, 7, 5, [1, 0, 0]),
        (0, 4, 5, 1, [0, -1, 0]),
        (2, 3, 7, 6, [0, 1, 0]),
        (0, 2, 6, 4, [0, 0, -1]),
        (1, 5, 7, 3, [0, 0, 1]),
    ]
    T = []
    for a, b, c, d, n in faces:
        for tri in ((a, b, c), (a, c, d)):
            p0, p1, p2 = P[list(tri)]
            if np.dot(np.cross(p1 - p0, p2 - p0), n) < 0:
                tri = (tri[0], tri[2], tri[1])
            T.append(tri)
    return P, np.asarray(T, np.int64)


def run(solver: str, n_envs: int, n_bodies: int = 8, steps: int = 50) -> dict:
    from tacex_tpu.physics.soft.abd import AbdModel, AbdSolverCfg, AbdState
    from tacex_tpu.physics.soft.ipc import RigidSdfScene

    P, T = _cube()
    rng = np.random.default_rng(3)
    offs = np.stack(
        [
            rng.uniform(-0.01, 0.01, n_bodies),
            rng.uniform(-0.01, 0.01, n_bodies),
            0.05 + 0.08 * np.arange(n_bodies),
        ],
        axis=-1,
    )
    model = AbdModel(
        [P] * n_bodies, [T] * n_bodies,
        cfg=AbdSolverCfg(contact_k=8, friction_mu=0.3, linear_solver=solver),
    )
    st = AbdState.identity(n_envs, n_bodies, offsets=offs)
    sc = RigidSdfScene.empty(n_envs)
    scene = RigidSdfScene(
        sc.spheres, sc.boxes, sc.capsules,
        sc.planes.at[:, 0].set(jnp.array([0.0, 0.0, 1.0, 0.0])),
    )
    step = jax.jit(model.step)
    st_w = jax.block_until_ready(step(st, scene))  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        st = step(st, scene)
    jax.block_until_ready(st.q)
    dt = time.perf_counter() - t0
    assert not np.isnan(np.asarray(st.q)).any()
    return {
        "metric": f"abd_pile_{n_bodies}body_{solver}",
        "num_envs": n_envs,
        "env_steps_per_s": round(n_envs * steps / dt, 1),
        "ms_per_step": round(1e3 * dt / steps, 2),
        "device": jax.devices()[0].device_kind,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--bodies", type=int, default=8)
    ap.add_argument(
        "--solver", default=None, choices=("dense", "cg"),
        help="run only this solver at --envs (default: dense@1, dense@N, cg@N)",
    )
    args = ap.parse_args()
    if args.solver:
        configs = ((args.solver, args.envs),)
    else:
        configs = (("dense", 1), ("dense", args.envs), ("cg", args.envs))
    for solver, n in configs:
        print(json.dumps(run(solver, n, args.bodies)))


if __name__ == "__main__":
    main()
