"""Franka + soft gel pad attachment demo.

Counterpart of reference source/tacex_uipc/examples/single_uipc_attachment.py:
a gel pad is attached to the Franka flange with soft position constraints
and dragged through a small motion while pressing a sphere — the classic
two-way-coupling showcase, here batched over 2 envs.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root, so scripts run from anywhere

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu.core import maths
from tacex_tpu.physics.rigid import franka
from tacex_tpu.physics.soft.ipc import RigidSdfScene
from tacex_tpu.uipc import (
    StableNeoHookeanCfg,
    UipcIsaacAttachments,
    UipcIsaacAttachmentsCfg,
    UipcObject,
    UipcObjectCfg,
    UipcSim,
    UipcSimCfg,
)
from tacex_tpu.uipc.objects import TetMeshCfg


def main() -> None:
    n = 2
    sim = UipcSim(UipcSimCfg(num_envs=n, dt=1 / 60))
    gel = UipcObject(
        UipcObjectCfg(
            mesh_cfg=TetMeshCfg(
                size=(0.0208, 0.0252, 0.0045), resolution=(6, 8, 2), center=(0, 0, -0.00225)
            ),
            constitution=StableNeoHookeanCfg(youngs_modulus=0.145, poisson_rate=0.45),
        ),
        sim,
    )
    att = UipcIsaacAttachments(UipcIsaacAttachmentsCfg(attachment_points_radius=5e-4), gel)
    att.compute_attachment_data(np.zeros(3), np.array([1.0, 0, 0, 0]))
    sim.setup_sim()

    arm = franka.ArmState.init(n)
    sphere_z = -0.012

    # spawn the gel at the flange pose (rest mesh is in the tool frame)
    tool_pos0, tool_quat0 = franka.forward_kinematics(arm.q)[:2]
    gel.write_vertex_positions_to_sim(
        maths.transform_points(jnp.asarray(gel.init_vertex_pos)[None], tool_pos0, tool_quat0)
    )

    for i in range(40):
        # drive the arm down then sideways
        delta = jnp.tile(
            jnp.array([[0.15 if i > 15 else 0.0, 0.0, -0.2 if i <= 15 else 0.0, 0, 0, 0]]),
            (n, 1),
        ) * 0.05
        arm = franka.apply_delta_pose_ik(arm, delta[:, :3], delta[:, 3:6])
        arm = franka.servo_step(arm, sim.cfg.dt)
        tool_pos, tool_quat = franka.forward_kinematics(arm.q)[:2]

        gel._aim_provider = lambda: att.aim_positions(tool_pos, tool_quat)
        sphere = jnp.concatenate(
            [tool_pos[:, :2], jnp.full((n, 1), 0.0), jnp.full((n, 1), 0.006)], axis=-1
        )
        # fixed sphere below the initial tool position
        if i == 0:
            sphere0 = jnp.concatenate(
                [tool_pos + jnp.array([0.0, 0.0, sphere_z]), jnp.full((n, 1), 0.006)], -1
            )
        scene = RigidSdfScene(
            spheres=sphere0[:, None, :],
            boxes=jnp.zeros((n, 1, 10)),
            capsules=jnp.zeros((n, 1, 8)),
            planes=jnp.zeros((n, 1, 4)),
        )
        sim.step(scene)
        if i % 10 == 0:
            x = np.asarray(gel.nodal_pos_w)
            print(f"step {i:3d}: gel center {x.mean(axis=(1,)).round(4)[0]}")
    print("done;", sim.get_sim_time_report())


if __name__ == "__main__":
    main()
