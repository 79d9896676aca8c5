"""Pick-up demo (rigid gel pads): grasp a ball with the 9-DOF gripper, lift it.

Counterpart of reference scripts/demos/pick_up/pick_up_rigid.py (there: a
PhysX Franka with GelSight fingers picks a cube while Taxim renders both
fingers). Here the full loop runs on the tacex_tpu rigid layer:

  * 9-DOF articulated arm+gripper dynamics (implicit PD, gravity),
  * ball-vs-finger-pad contacts resolved with the impulse model, with the
    action-reaction force fed back to the finger prismatic joints (so grip
    force is what the finger drive can actually hold, not a script),
  * per-finger tactile RGB rendered from the ball in each finger's frame.

Phases: approach above the ball -> descend -> close fingers -> lift.
The demo asserts the ball actually rises with the hand (friction-held) and
writes a left/right tactile strip.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[3]))  # repo root

from tacex_tpu.core import maths
from tacex_tpu.physics.rigid import articulation as art
from tacex_tpu.physics.rigid import contact, franka
from tacex_tpu.render.depth_camera import SdfScene, render_depth_batch
from tacex_tpu.sensors.gelsight.sensor import GelSightSensor
from tacex_tpu.sensors.gelsight.sensor_cfg import gelsight_mini_cfg

BALL = contact.SphereParams(radius=0.012, mass=0.02, friction=0.9)
BALL_POS0 = np.array([0.45, 0.0, 0.012 + 0.0026], np.float32)
PAD_HALF = jnp.array([0.012, 0.004, 0.014], jnp.float32)  # finger gel pad box
CAM_EXTENT = (0.0295 * 640 / 1000.0, 0.0295 * 480 / 1000.0)
DT = 1.0 / 120.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps_per_phase", type=int, default=120)
    p.add_argument("--out", default="/tmp/pick_up_rigid.png")
    args = p.parse_args()

    sensor = GelSightSensor(gelsight_mini_cfg(camera_resolution=(160, 120)), num_envs=2)
    sstate = sensor.init_state()

    # start joint pose: hand above the ball pointing down
    arm = art.GripperArmState.init(1, finger_width=0.06)
    ball_pos = jnp.asarray(BALL_POS0)[None]
    ball_lin = jnp.zeros((1, 3))
    ball_ang = jnp.zeros((1, 3))

    down_quat = maths.quat_from_angle_axis(jnp.asarray(np.pi), jnp.array([1.0, 0.0, 0.0]))

    tcp_off = jnp.array([0.0, 0.0, art.HAND_TCP_OFFSET], jnp.float32)

    @jax.jit
    def ik_target(arm, goal_pos):
        """Move the ARM q_target toward the goal TCP pose with DLS steps."""
        qt = arm.q_target[:, :7]
        for _ in range(6):
            pos, quat, orig, ax = franka.forward_kinematics(qt, ee_offset_pos=tcp_off)
            jac = franka.geometric_jacobian(pos, orig, ax)
            rot_err = maths.axis_angle_from_quat(
                maths.quat_mul(jnp.broadcast_to(down_quat, quat.shape), maths.quat_conjugate(quat))
            )
            qt = jnp.clip(franka.dls_ik_step(qt, goal_pos - pos, rot_err, jac), franka.Q_LOWER, franka.Q_UPPER)
        return qt

    @jax.jit
    def physics(arm, ball_pos, ball_lin, ball_ang, tau_f, q_target):
        arm = art.GripperArmState(arm.q, arm.qd, q_target)
        pads_old, _, _ = art.finger_positions(arm.q)
        # finger reaction torque lags one step (staggered coupling)
        tau_ext = jnp.concatenate([jnp.zeros((1, 7)), tau_f], -1)
        arm = art.step(arm, DT, tau_ext=tau_ext)
        pads, _, hand_rot = art.finger_positions(arm.q)
        hand_quat = maths.quat_from_matrix(hand_rot)
        y_axis = hand_rot[..., :, 1]  # finger slide axis

        tau_f = jnp.zeros((1, 2))
        ball_lin = ball_lin + jnp.array([0.0, 0.0, -9.81]) * DT
        # both pads resolved SIMULTANEOUSLY against the same incoming ball
        # velocity, then impulses summed — sequential resolution makes the
        # symmetric squeeze asymmetric and squirts the ball out sideways.
        dls, das = [], []
        for i, sgn in enumerate((1.0, -1.0)):
            pad_vel = (pads[:, i] - pads_old[:, i]) / DT
            dl, da = contact.sphere_box_contact(
                ball_pos, ball_lin, ball_ang, pads[:, i], hand_quat, pad_vel,
                PAD_HALF, BALL, DT, lock_rotation=True,
            )
            dls.append(dl)
            das.append(da)
            f_on_ball = dl * BALL.mass / DT  # (1, 3)
            # reaction on the finger's prismatic DOF (finger 0 slides +y,
            # finger 1 slides -y; closing = moving toward the ball)
            tau_f = tau_f.at[:, i].set(jnp.sum(-f_on_ball * (sgn * y_axis), -1))
        ball_lin = ball_lin + dls[0] + dls[1]
        ball_ang = ball_ang + das[0] + das[1]
        dl, da = contact.sphere_plane_contact(
            ball_pos, ball_lin, ball_ang, (0.0, 0.0, 1.0), 0.0026, BALL, DT
        )
        ball_lin, ball_ang = ball_lin + dl, ball_ang + da
        ball_pos = ball_pos + ball_lin * DT
        grip_force = jnp.abs(tau_f).sum(-1)
        return arm, ball_pos, ball_lin, ball_ang, tau_f, grip_force

    @jax.jit
    def finger_tactile(sstate, arm, ball_pos):
        """Both finger sensors batched: camera behind each pad looking inward."""
        pads, _, hand_rot = art.finger_positions(arm.q)
        y = hand_rot[..., :, 1]
        cam_dist = 0.0285
        cam_pos = jnp.concatenate([pads[:, 0] + cam_dist * y, pads[:, 1] - cam_dist * y], 0)
        # camera +z must look along -y (left) / +y (right) of the hand frame
        rot_l = jnp.stack([hand_rot[0, :, 0], hand_rot[0, :, 2], -hand_rot[0, :, 1]], -1)
        rot_r = jnp.stack([hand_rot[0, :, 0], -hand_rot[0, :, 2], hand_rot[0, :, 1]], -1)
        cam_quat = jnp.stack([maths.quat_from_matrix(rot_l), maths.quat_from_matrix(rot_r)])
        scene = SdfScene(
            spheres=jnp.broadcast_to(
                jnp.concatenate([ball_pos[0], jnp.array([BALL.radius])])[None, None], (2, 1, 4)
            ),
            boxes=jnp.zeros((2, 1, 10)),
            capsules=jnp.zeros((2, 1, 8)),
            planes=jnp.zeros((2, 1, 4)).at[:, :, 2].set(1.0).at[:, :, 3].set(-1.0),
        )
        depth = render_depth_batch(cam_pos, cam_quat, scene, (160, 120), CAM_EXTENT, far=0.029)
        return sensor.update(sstate, depth)

    grasp_z = float(BALL_POS0[2])
    # close to a PRELOAD width, not zero: commanding width 0 drives the pads
    # through the ball and ejects it (watermelon-seed) — the grip force is
    # the finger PD spring at the commanded 3 mm squeeze, as in the factory
    # env's grip preload.
    grip_w = 2 * (BALL.radius + float(PAD_HALF[1]) - 0.007)
    phases = [
        ("approach", np.array([*BALL_POS0[:2], grasp_z + 0.12]), 0.06),
        ("descend", np.array([*BALL_POS0[:2], grasp_z]), 0.06),
        ("close", np.array([*BALL_POS0[:2], grasp_z]), grip_w),
        ("lift", np.array([*BALL_POS0[:2], grasp_z + 0.08]), grip_w),
    ]
    frames = []
    tau_f = jnp.zeros((1, 2))
    prev_goal = None
    for name, goal, width in phases:
        for k in range(args.steps_per_phase):
            # ramp the goal over the phase — a step change makes the PD arm
            # accelerate faster than the friction grip can follow
            if name == "lift" and prev_goal is not None:
                frac = min(1.0, (k + 1) / args.steps_per_phase)
                g = prev_goal + frac * (goal - prev_goal)
            else:
                g = goal
            qt_arm = ik_target(arm, jnp.asarray(g)[None])
            q_target = jnp.concatenate([qt_arm, jnp.full((1, 2), width / 2)], -1)
            arm, ball_pos, ball_lin, ball_ang, tau_f, grip = physics(
                arm, ball_pos, ball_lin, ball_ang, tau_f, q_target
            )
        prev_goal = goal
        sstate, out = finger_tactile(sstate, arm, ball_pos)
        frames.append(np.concatenate(list(np.asarray(out["tactile_rgb"])), axis=0))
        tcp_z = float(art.finger_positions(arm.q)[1][0, 2])
        print(
            f"{name:9s}: hand z={tcp_z:.3f} ball z={float(ball_pos[0, 2]):.3f} "
            f"qf={np.asarray(arm.q[0, 7:])} "
            f"grip force={float(grip[0]):.2f} N indent={np.asarray(out['indentation_depth'])}"
        )

    lifted = float(ball_pos[0, 2]) - float(BALL_POS0[2])
    print(f"ball lifted {lifted*100:.1f} cm")
    strip = (np.concatenate(frames, axis=1) * 255).astype(np.uint8)
    try:
        from PIL import Image

        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(strip).save(args.out)
        print(f"saved {args.out}")
    except ImportError:
        np.save(args.out + ".npy", strip)
    assert lifted > 0.03, f"grasp failed: ball only rose {lifted*100:.1f} cm"


if __name__ == "__main__":
    main()
