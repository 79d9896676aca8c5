"""Embedded-surface accuracy: coarse-solve + dense-embed vs true dense solve.

The shipped Grasp-Lift tactile env solves pads at ``pad_resolution=(2,4,4)``
(75 verts/pad) and renders tactile images from a 32x32 embedded surface
bound to the coarse inner face (physics/soft/embed.py). This script
quantifies what that shortcut costs: it runs the SAME deterministic
squeeze+lift trajectory with the SAME 32x32 embedded sampling while varying
only the SOLVE resolution — (2,4,4) [shipped] vs (2,8,8) vs (2,12,12) —
and reports

  * per-pad compression-image error (mm) vs the finest solve,
  * tactile RGB error at the task resolution (in /255 units) vs the finest,
  * env-steps/s per config (the price of solving dense for real).

The reference has no comparable measurement: its FEM gelpad runs at ONE
resolution on ONE env (/root/reference/docs/source/showcases/ball_rolling.md:23).

Usage: python scripts/benchmarking/embed_accuracy.py [--envs 4] [--steps 40]
Prints one JSON line per config plus a final summary line.
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import numpy as np

import jax
import jax.numpy as jnp


def rollout(pad_resolution, n_envs, steps):
    from tacex_tpu.envs.grasp_lift.env import GraspLiftEnv, GraspLiftEnvCfg

    cfg = GraspLiftEnvCfg(
        num_envs=n_envs,
        obs_mode="tactile",
        tactile_embed=(32, 32),
        pad_resolution=tuple(pad_resolution),
        stagger_initial_episodes=False,
        reset_xy_noise=0.0,  # identical initial cube pose across configs
        episode_length_s=10.0,
    )
    env = GraspLiftEnv(cfg)
    state = env.init_state(jax.random.PRNGKey(0))
    state, _ = env.reset_all(state)
    step = jax.jit(env.step)

    # deterministic squeeze-then-lift script (same for every config)
    acts = np.zeros((steps, n_envs, 2), np.float32)
    acts[:, :, 0] = 0.8            # squeeze throughout
    acts[10:, :, 1] = 0.7          # lift after contact is set
    acts = jnp.asarray(acts)

    out = step(state, acts[0])
    state = jax.block_until_ready(out[0])
    imgs, comps = [], []
    t0 = time.perf_counter()
    for i in range(1, steps):
        state, obs, *_ = step(state, acts[i])
        if i % 10 == 0 or i == steps - 1:
            imgs.append(np.asarray(obs["vision_obs"]))  # (N, 32, 32, 6)
            comps.append(
                np.asarray(env._pad_compression(state.gel.x, state.squeeze))
            )  # (N, 2, 32, 32) mm
    jax.block_until_ready(state.cube.q)
    dt = time.perf_counter() - t0
    nverts = int(np.asarray(env.gel.mesh.points).shape[0])
    return {
        "imgs": np.stack(imgs),
        "comps": np.stack(comps),
        "env_steps_per_s": round(n_envs * (steps - 1) / dt, 1),
        "ms_per_step": round(1e3 * dt / (steps - 1), 2),
        "verts": nverts,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()

    resolutions = [(2, 4, 4), (2, 8, 8), (2, 12, 12)]
    runs = {}
    for r in resolutions:
        runs[r] = rollout(r, args.envs, args.steps)
        print(
            json.dumps(
                {
                    "pad_resolution": list(r),
                    "env_steps_per_s": runs[r]["env_steps_per_s"],
                    "ms_per_step": runs[r]["ms_per_step"],
                    "device": jax.devices()[0].device_kind,
                }
            ),
            flush=True,
        )

    ref = runs[resolutions[-1]]
    summary = {"metric": "embed_accuracy_vs_true_dense", "ref": list(resolutions[-1])}
    for r in resolutions[:-1]:
        d_img = np.abs(runs[r]["imgs"] - ref["imgs"]) * 255.0
        d_cmp = np.abs(runs[r]["comps"] - ref["comps"])
        summary[str(r)] = {
            "rgb_err_255_mean": round(float(d_img.mean()), 3),
            "rgb_err_255_p99": round(float(np.percentile(d_img, 99)), 2),
            "rgb_err_255_max": round(float(d_img.max()), 2),
            "comp_err_mm_mean": round(float(d_cmp.mean()), 4),
            "comp_err_mm_max": round(float(d_cmp.max()), 4),
            "speedup_vs_ref": round(
                runs[r]["env_steps_per_s"] / ref["env_steps_per_s"], 2
            ),
        }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
