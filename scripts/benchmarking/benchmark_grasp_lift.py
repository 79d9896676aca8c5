"""Grasp-Lift env benchmark: env-steps/s/chip for the unified contact world.

This is the capability the reference cannot run at all: two FEM gel pads
grasping and lifting a FREE (dynamic) affine body by friction, in ONE coupled
Newton solve per substep (physics/soft/coupled.py), batched over N envs.
The reference's libuipc gelpad scenes are limited to --num_envs=1
(/root/reference/docs/source/showcases/ball_rolling.md:23) and its contact
world never mixes FEM and ABD at RL scale.

Prints one JSON line per config. Usage:
    python scripts/benchmarking/benchmark_grasp_lift.py [--envs 32] [--steps 30]
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


def run(env_id: str, n_envs: int, steps: int, overrides: dict | None = None) -> dict:
    from tacex_tpu import envs

    env = envs.make(env_id, num_envs=n_envs, **(overrides or {}))
    state = env.init_state(jax.random.PRNGKey(0))
    state, _ = env.reset_all(state)
    step = jax.jit(env.step)

    rng = np.random.default_rng(0)
    # gentle squeeze + lift so the solve carries real grasp contact; the
    # mean is sized to the env's action space (first two dims are the
    # squeeze/lift rates; anything beyond stays zero-mean)
    loc = np.zeros(env.cfg.action_space)
    loc[:2] = [0.6, 0.4]
    actions = jnp.asarray(
        np.clip(
            rng.normal(loc, 0.2, (steps + 1, n_envs, env.cfg.action_space)),
            -1.0,
            1.0,
        ).astype(np.float32)
    )

    t_compile0 = time.perf_counter()
    out = step(state, actions[0])
    state = jax.block_until_ready(out[0])
    compile_s = time.perf_counter() - t_compile0

    t0 = time.perf_counter()
    for i in range(steps):
        state = step(state, actions[i + 1])[0]
    jax.block_until_ready(state.cube.q)
    dt = time.perf_counter() - t0
    return {
        "metric": f"grasp_lift_env_step[{env_id}]",
        "num_envs": n_envs,
        **({"overrides": overrides} if overrides else {}),
        "env_steps_per_s": round(n_envs * steps / dt, 1),
        "ms_per_step": round(1e3 * dt / steps, 2),
        "compile_s": round(compile_s, 1),
        "device": jax.devices()[0].device_kind,
    }


def main() -> None:
    import ast

    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=32)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--env-id", default="TacEx-Grasp-Lift-Uipc-v0")
    ap.add_argument(
        "--env_cfg", action="append", default=[], metavar="KEY=VALUE",
        help="env cfg override, e.g. --env_cfg pad_resolution=(3,6,6) "
        "(repeatable; values parsed as Python literals) — used for the "
        "scale-knee sweep over env count x pad resolution",
    )
    args = ap.parse_args()
    overrides = {}
    for kv in args.env_cfg:
        k, v = kv.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        overrides[k] = v
    print(json.dumps(run(args.env_id, args.envs, args.steps, overrides)), flush=True)


if __name__ == "__main__":
    main()
