"""ManiSkill FEM marker-flow demo: press a batched FEM gel, visualize flow.

Counterpart of the reference's mani-skill marker demo
(check_mani_skill_marker_franka.py role): a FEM gel pad is pressed onto a
ball; the ManiSkillSimulator tracks the barycentrically-bound marker grid on
the deforming surface and emits (init_uv, curr_uv) marker flow. The demo
renders the flow as arrow dots into a PNG strip over a press+shear sequence
and asserts the markers actually move with the contact.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

from tacex_tpu.core import maths
from tacex_tpu.physics.soft.ipc import IpcSolverCfg, RigidSdfScene, SoftBodyModel, SoftBodyState
from tacex_tpu.physics.soft.mesh import box_tet_mesh
from tacex_tpu.sensors.gelsight.fem import ManiSkillSimulatorCfg
from tacex_tpu.sensors.gelsight.fem.mani_skill_sim import ManiSkillSimulator


def flow_image(flow: np.ndarray, res=(240, 320)) -> np.ndarray:
    """Render (2, M, 2) [init_uv, curr_uv] flow as dots + displacement tails."""
    img = np.full((*res, 3), 0.35, np.float32)
    init, curr = flow[0], flow[1]
    for (u0, v0), (u1, v1) in zip(init, curr):
        if u0 <= 0 and v0 <= 0:
            continue
        # tail: a few samples along the displacement
        for t in np.linspace(0, 1, 8):
            u, v = u0 + t * (u1 - u0), v0 + t * (v1 - v0)
            ui, vi = int(round(v)), int(round(u))
            if 0 <= ui < res[0] and 0 <= vi < res[1]:
                img[max(ui - 1, 0) : ui + 2, max(vi - 1, 0) : vi + 2] = (0.1, 0.1, 0.1)
        ui, vi = int(round(v1)), int(round(u1))
        if 0 <= ui < res[0] and 0 <= vi < res[1]:
            img[max(ui - 2, 0) : ui + 3, max(vi - 2, 0) : vi + 3] = (0.9, 0.2, 0.2)
    return img


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/mani_skill_marker.png")
    p.add_argument("--steps", type=int, default=8)
    args = p.parse_args()

    # gel in TOOL frame, contact face at max z (the ManiSkillSimulator
    # convention), camera 0.0285 m behind it
    size = (0.018, 0.014, 0.004)
    mesh = box_tet_mesh(size, (8, 7, 2), center=(0.0, 0.0, -size[2] / 2))
    mount = np.where(mesh.points[:, 2] < -size[2] + 1e-9)[0].astype(np.int32)
    gel = SoftBodyModel(
        mesh, youngs_modulus=1.45e5, poisson_ratio=0.45,
        cfg=IpcSolverCfg(dt=1 / 60, newton_max_iter=4, cg_iters=24, d_hat=5e-4, kappa=2e4),
        attachment_verts=mount,
    )
    sim = ManiSkillSimulator(ManiSkillSimulatorCfg(), mesh)

    n = 2  # two envs: straight press and press+shear
    state = SoftBodyState.init(n, mesh.points)
    cam_pos = jnp.broadcast_to(jnp.array([0.0, 0.0, -0.0285]), (n, 3))
    cam_quat = maths.quat_identity((n,))
    mount_rest = jnp.asarray(mesh.points[mount])

    ball_r = 0.004
    step = jax.jit(gel.step)
    flows = []
    key = jax.random.PRNGKey(0)
    for i in range(args.steps):
        t = (i + 1) / args.steps
        # env 0: press straight down onto the gel; env 1: press + shear in x
        bz = ball_r + 0.002 - 0.0045 * t
        bx = jnp.array([0.0, 0.004 * t])
        sph = jnp.stack(
            [jnp.stack([bx[e], 0.0, bz, ball_r]) for e in range(n)]
        )[:, None, :]
        scene = RigidSdfScene(
            spheres=sph, boxes=jnp.zeros((n, 1, 10)),
            capsules=jnp.zeros((n, 1, 8)), planes=jnp.zeros((n, 1, 4)),
        )
        state = step(state, scene, jnp.broadcast_to(mount_rest, (n, *mount_rest.shape)))
        key, sub = jax.random.split(key)
        flow = sim.marker_motion_simulation(state, gel.surface_verts, cam_pos, cam_quat, sub)
        flows.append(np.asarray(flow))

    final = flows[-1]  # (n, 2, M, 2)
    disp = np.linalg.norm(final[:, 1] - final[:, 0], axis=-1)
    # signed mean x-flow: a straight press spreads markers SYMMETRICALLY
    # (mean ~ 0) while shear drags them coherently in +x — the right
    # discriminator between the two envs
    mean_dx = (final[:, 1, :, 0] - final[:, 0, :, 0]).mean(axis=-1)
    print(
        f"mean marker displacement (px): press={disp[0].mean():.2f} "
        f"shear={disp[1].mean():.2f} | signed x-flow: press={mean_dx[0]:+.2f} "
        f"shear={mean_dx[1]:+.2f}"
    )
    imgs = [flow_image(final[0]), flow_image(final[1])]
    strip = (np.concatenate(imgs, axis=1) * 255).astype(np.uint8)
    try:
        from PIL import Image

        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(strip).save(args.out)
        print(f"saved {args.out}")
    except ImportError:
        np.save(args.out + ".npy", strip)
    # NOTE: the reference marker grid is asymmetric in x (-8..16.5 mm,
    # marker_flow.py _generate_marker_grid), so even a pure press biases the
    # mean x-flow — press-vs-shear mean comparisons are confounded. Assert
    # what the demo actually demonstrates: markers track the deformation in
    # both envs, and the two contact modes produce distinct flow fields.
    assert disp[0].max() > 0.5, "markers did not move under press"
    assert disp[1].max() > 0.5, "markers did not move under shear"
    assert np.abs(final[1] - final[0]).max() > 0.5, "press and shear flows identical"


if __name__ == "__main__":
    main()
