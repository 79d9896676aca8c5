"""Embedded-vs-true-dense tactile accuracy in the coupled grasp world.

Round-4 verdict #6: the tactile path renders from an embedded dense
surface barycentrically bound to the coarse solve (physics/soft/embed.py)
— quantify what that shortcut costs against a pad whose SOLVE is dense.

Three envs run the same scripted grasp (squeeze 30, then hold + lift):
  A. coarse solve (2x4x4 tets/pad) + embedded 32x32 surface  <- the shipped path
  B. dense solve (4x16x16 tets/pad, 1445 verts/pad), raw 17x17 inner grid  <- ground truth
  C. coarse solve, raw 5x5 inner grid                         <- no-embed baseline
All compression images are resized to the 32x32 task resolution and
compared per step (B is truth). The A-B gap bounds the embed error
INCLUDING coarse-solve discretization; the C-B gap shows what the
embedding recovers. Writes one JSON line.
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


def _run(env, steps, squeeze_steps=30):
    st = env.init_state(jax.random.PRNGKey(0))
    st, obs = env.reset_all(st)
    step = jax.jit(env.step)
    imgs, cube_z = [], []
    t0 = time.perf_counter()
    for i in range(steps):
        a = jnp.array([[1.0, 0.0]] if i < squeeze_steps else [[0.3, 1.0]])
        st, obs, r, te, tr, info = step(st, a)
        v = obs["vision_obs"]  # (1, gh, gw, 2) compression mm
        if v.shape[1:3] != (32, 32):
            v = jax.image.resize(v, (1, 32, 32, 2), method="linear")
        imgs.append(np.asarray(v[0]))
        cube_z.append(float(np.asarray(info["cube_z"])[0]))
    return np.asarray(imgs), np.asarray(cube_z), time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    from tacex_tpu import envs

    common = dict(
        num_envs=1, obs_mode="depth", reset_xy_noise=0.0,
        stagger_initial_episodes=False, episode_length_s=10.0,
    )
    cfgs = {
        "A_coarse_embed32": dict(pad_resolution=(2, 4, 4), tactile_embed=(32, 32)),
        "B_dense_truth": dict(pad_resolution=(4, 16, 16), tactile_embed=None),
        "C_coarse_raw": dict(pad_resolution=(2, 4, 4), tactile_embed=None),
    }
    out = {}
    for name, kw in cfgs.items():
        env = envs.make("TacEx-Grasp-Lift-Uipc-v0", **common, **kw)
        imgs, cz, dt = _run(env, args.steps)
        out[name] = {"imgs": imgs, "cube_z": cz, "s_per_step": dt / args.steps}

    truth = out["B_dense_truth"]["imgs"]
    contact = truth.max(axis=(1, 2, 3)) > 0.05  # steps with real contact
    row = {"metric": "embed_tactile_accuracy[grasp_lift]", "steps": int(contact.sum())}
    for name in ("A_coarse_embed32", "C_coarse_raw"):
        err = np.abs(out[name]["imgs"] - truth)[contact]
        scale = np.abs(truth[contact]).max()
        row[name] = {
            "mae_mm": round(float(err.mean()), 4),
            "max_mm": round(float(err.max()), 4),
            "rel_max": round(float(err.max() / max(scale, 1e-9)), 4),
            "cube_z_final_mm": round(out[name]["cube_z"][-1] * 1e3, 2),
            "s_per_step": round(out[name]["s_per_step"], 4),
        }
    row["truth_peak_compression_mm"] = round(float(np.abs(truth).max()), 3)
    row["B_s_per_step"] = round(out["B_dense_truth"]["s_per_step"], 4)
    row["B_cube_z_final_mm"] = round(out["B_dense_truth"]["cube_z"][-1] * 1e3, 2)
    print(json.dumps(row), flush=True)
    if args.out:
        _Path(args.out).write_text(json.dumps(row, indent=1) + "\n")


if __name__ == "__main__":
    main()
