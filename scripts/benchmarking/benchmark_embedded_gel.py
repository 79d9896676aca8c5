"""Mixed-resolution FEM gel benchmark: sensor-fidelity surface at coarse cost.

The round-2 finding was that the FEM gel at sensor fidelity is slow: the
``extremely_high`` gel mesh (reference Gelpad_extremely_high_res USD tier,
SURVEY §2.3) solves at ~114 env-steps/s/chip while the env default is the
coarse 9x11-contact-face mesh. physics/soft/embed.py removes the trade-off:
solve the coarse mesh, embed an extremely_high-density contact SURFACE
barycentrically (one-time binding, like the marker flow), and render
depth/markers from the dense surface. This script measures the three
configurations so the claim "dense surface at coarse-solve cost" is a
number, not an assertion:

  * low            — coarse solve, coarse surface (round-2 default)
  * low + embed    — coarse solve, extremely_high EMBEDDED surface
  * extremely_high — dense solve (the thing embed replaces)

Usage: python scripts/benchmarking/benchmark_embedded_gel.py [--envs 64]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def run(num_envs: int, steps: int, gel_resolution: str, embed: str | None) -> dict:
    from tacex_tpu import envs

    env = envs.make(
        "TacEx-Ball-Rolling-Tactile-RGB-Uipc-v0",
        num_envs=num_envs,
        gel_resolution=gel_resolution,
        gel_embed_surface=embed,
    )
    state = env.init_state(jax.random.PRNGKey(0))
    state, _ = env.reset_all(state)
    step = jax.jit(env.step)
    a = jnp.zeros((num_envs, env.cfg.action_space), jnp.float32)
    s, obs, rew, *_ = step(state, a)  # compile
    jax.block_until_ready(rew)
    state = s
    t0 = time.perf_counter()
    for _ in range(steps):
        state, obs, rew, *_ = step(state, a)
    jax.block_until_ready(rew)
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(rew)).all()
    return {
        "metric": "uipc_env_steps_per_s",
        "gel_resolution": gel_resolution,
        "gel_embed_surface": embed,
        "num_envs": num_envs,
        "env_steps_per_s": round(num_envs * steps / dt, 1),
        "ms_per_step": round(1e3 * dt / steps, 2),
        "device": jax.devices()[0].device_kind,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=64)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--skip_dense", action="store_true", help="skip the slow extremely_high solve")
    args = p.parse_args()
    configs = [("low", None), ("low", "extremely_high")]
    if not args.skip_dense:
        configs.append(("extremely_high", None))
    for res, embed in configs:
        print(json.dumps(run(args.envs, args.steps, res, embed)), flush=True)


if __name__ == "__main__":
    main()
