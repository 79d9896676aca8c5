"""Benchmark a non-RL environment rollout and emit KPI metrics.

Counterpart of reference scripts/benchmarking/benchmark_non_rl_example.py:17-40
(there: an Isaac benchmark backend records app startup, scene-creation and
per-frame times for a non-RL BallRollingEnv). Here the same KPIs come from
the jitted env directly:

  * startup_s        — process start -> env constructed
  * compile_s        — first (traced+compiled) step
  * per_frame_ms     — steady-state per-step wall time
  * frames_per_sec   — num_envs * steps / wall

Prints one JSON document; optionally writes it with --out.
"""

from __future__ import annotations

import argparse
import json
import time

_T0 = time.perf_counter()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sys as _sys  # noqa: E402
from pathlib import Path as _Path  # noqa: E402

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="TacEx-Ball-Rolling-Taxim-Fots-v0")
    p.add_argument("--num_envs", type=int, default=64)
    p.add_argument("--num_frames", type=int, default=100)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from tacex_tpu import envs

    env = envs.make(args.task, num_envs=args.num_envs)
    state = env.init_state(jax.random.PRNGKey(0))
    state, _ = env.reset_all(state)
    startup_s = time.perf_counter() - _T0

    step = jax.jit(env.step)
    actions = jnp.zeros((args.num_envs, env.cfg.action_space))

    t0 = time.perf_counter()
    state, obs, rew, term, trunc, info = step(state, actions)
    jax.block_until_ready(rew)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.num_frames):
        state, obs, rew, term, trunc, info = step(state, actions)
    jax.block_until_ready(rew)
    wall = time.perf_counter() - t0

    kpi = {
        "task": args.task,
        "num_envs": args.num_envs,
        "num_frames": args.num_frames,
        "startup_s": round(startup_s, 3),
        "compile_s": round(compile_s, 3),
        "per_frame_ms": round(wall / args.num_frames * 1e3, 3),
        "frames_per_sec": round(args.num_envs * args.num_frames / wall, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(kpi, indent=2))
    if args.out:
        _Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        _Path(args.out).write_text(json.dumps(kpi, indent=2))


if __name__ == "__main__":
    main()
