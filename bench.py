"""Benchmark: tactile frames/sec (RGB + markers) on the current chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the BASELINE.md north-star configuration literally: the flagship
ball-rolling task (TacEx-Ball-Rolling-Taxim-Fots-v0 — the reference's 4096-env
RL config: 32x24 camera, Taxim optical RGB x FOTS marker composition) stepped
at 4096 environments, full env step in the loop (IK + servo + contact physics
+ depth render + tactile RGB + markers + rewards/dones/resets/obs). A frame =
one environment-step producing one tactile observation.

vs_baseline = value / 6250 (the >= 50k frames/s on v5p-8 target split across
8 chips; we run on one chip).

For the sensor-only pipeline at the reference benchmark-harness resolution
(320x240), see scripts/benchmarking/run_ball_rolling_experiment.py.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import os

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
ITERS = int(os.environ.get("BENCH_ITERS", 30))
PER_CHIP_TARGET = 50_000 / 8


def main() -> None:
    from tacex_tpu import envs

    env = envs.make("TacEx-Ball-Rolling-Taxim-Fots-v0", num_envs=NUM_ENVS)
    state = env.init_state(jax.random.PRNGKey(0))
    state, _ = env.reset_all(state)
    step = jax.jit(env.step)

    rng = np.random.default_rng(0)
    actions = jnp.asarray(
        rng.uniform(-0.3, 0.3, (ITERS + 1, NUM_ENVS, env.cfg.action_space)).astype(np.float32)
    )
    # keep gentle downward pressure so the tactile path sees real contact
    actions = actions.at[..., 2].add(-0.1)

    state, obs, *_ = step(state, actions[0])
    jax.block_until_ready(obs["vision_obs"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, obs, reward, term, trunc, info = step(state, actions[i + 1])
    jax.block_until_ready(obs["vision_obs"])
    dt = time.perf_counter() - t0

    fps = NUM_ENVS * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "tactile_env_steps_per_sec_per_chip_rgb_markers_4096envs",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / PER_CHIP_TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
