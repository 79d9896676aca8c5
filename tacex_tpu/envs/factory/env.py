"""Factory contact-rich insertion tasks with tactile-equipped gripper.

TPU rebuild of the reference's Factory port (reference
source/tacex_tasks/tacex_tasks/factory/factory_env.py + factory_env_cfg.py +
factory_tasks_cfg.py): Franka + two-finger gripper holding an asset (peg /
gear / nut) that must be inserted onto a fixed asset (hole / gear base /
bolt), with a GelSight sensor on each gripper finger
(factory_env_cfg.py:192-213). Preserved structure:

  * 6-dim bounded delta-pose actions with EMA smoothing
    (ctrl.pos_action_bounds / ema_factor);
  * keypoint-distance rewards through the squashing function
    1/(exp(a x) + b + exp(-a x)) at baseline/coarse/fine scales, plus
    engagement and success bonuses and action/action-grad penalties
    (factory_env.py:496-520);
  * success = centered (xy < 2.5 mm) AND inserted below the height
    threshold (factory_env.py:440-465);
  * obs = [fingertip_pos_rel_fixed, fingertip_quat, ee_linvel, ee_angvel,
    prev_actions]; state adds held/fixed poses and joint positions;
  * two tactile RGB images from the finger sensors observing the gripped
    asset pressed into the gels.

Simplifications (documented): the gripper holds the asset rigidly (the
reference also fixes the grasp after reset); insertion contact resolves as a
penetration-projection of the commanded pose against the fixed asset's
analytic SDF instead of a full force balance — the RL-relevant consequence
(cannot descend unless aligned) is preserved.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax
import jax.numpy as jnp

from ...core import maths
from ...core.config import configclass
from ...physics.rigid import franka
from ...sensors.gelsight.sensor import GelSightSensor
from ...sensors.gelsight.sensor_cfg import gelsight_mini_cfg
from ..base import DirectRLEnv, DirectRLEnvCfg


@configclass
class FactoryTaskCfg:
    """Per-task geometry/reward knobs (reference factory_tasks_cfg.py)."""

    name: str = "peg_insert"
    # held asset (cylinder): diameter / height
    held_diameter: float = 0.008
    held_height: float = 0.050
    # fixed asset: base block with a hole/shaft
    fixed_size: tuple = (0.025, 0.025, 0.025)
    hole_diameter: float = 0.0081
    hole_depth: float = 0.025
    fixed_init_pos: tuple = (0.6, 0.0, 0.05)
    fixed_asset_init_pos_noise: tuple = (0.05, 0.05, 0.05)
    held_asset_pos_noise: tuple = (0.0, 0.006, 0.003)
    hand_init_pos: tuple = (0.0, 0.0, 0.047)  # relative to fixed asset top
    hand_init_pos_noise: tuple = (0.02, 0.02, 0.01)
    num_keypoints: int = 4
    keypoint_scale: float = 0.15
    keypoint_coef_baseline: tuple = (5.0, 4.0)
    keypoint_coef_coarse: tuple = (50.0, 2.0)
    keypoint_coef_fine: tuple = (100.0, 0.0)
    action_penalty_scale: float = 0.0
    action_grad_penalty_scale: float = 0.0
    engage_threshold: float = 0.9
    success_threshold: float = 0.04


def peg_insert_task() -> FactoryTaskCfg:
    return FactoryTaskCfg()


def gear_mesh_task() -> FactoryTaskCfg:
    return FactoryTaskCfg(
        name="gear_mesh",
        held_diameter=0.03,
        held_height=0.03,
        hole_diameter=0.006,
        hole_depth=0.02,
        success_threshold=0.05,
        engage_threshold=0.9,
    )


def nut_thread_task() -> FactoryTaskCfg:
    return FactoryTaskCfg(
        name="nut_thread",
        held_diameter=0.016,
        held_height=0.01,
        hole_diameter=0.008,
        hole_depth=0.015,
        success_threshold=0.375,
        engage_threshold=0.9,
    )


@configclass
class FactoryEnvCfg(DirectRLEnvCfg):
    num_envs: int = 128
    episode_length_s: float = 10.0
    decimation: int = 8
    sim_dt: float = 1.0 / 120.0
    action_space: int = 6
    task: FactoryTaskCfg = None
    ema_factor: float = 0.2
    pos_action_bounds: tuple = (0.05, 0.05, 0.05)
    rot_action_bounds: tuple = (1.0, 1.0, 1.0)
    reset_joints: tuple = (1.5178e-3, -0.19651, -1.4364e-3, -1.9761, -2.7717e-4, 1.7796, 0.78556)
    camera_resolution: tuple = (32, 32)
    vision_obs_shape: tuple = (32, 32, 3)
    obs_noise_std: float = 0.0

    def __post_init__(self):
        if self.task is None:
            self.task = peg_insert_task()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FactoryState:
    arm: franka.ArmState
    fixed_pos: jax.Array  # (N, 3)
    fixed_quat: jax.Array  # (N, 4)
    held_grip_offset: jax.Array  # (N, 3) grasp offset noise (held in EE frame)
    ctrl_target: jax.Array  # (N, 3) persistent absolute task-space target
    ema_target: jax.Array  # (N, 6) smoothed action target
    actions: jax.Array
    prev_actions: jax.Array
    ep_succeeded: jax.Array  # (N,) bool
    episode_length: jax.Array
    key: jax.Array


class FactoryEnv(DirectRLEnv):
    cfg: FactoryEnvCfg

    def __init__(self, cfg: FactoryEnvCfg | None = None):
        super().__init__(cfg or FactoryEnvCfg())
        c = self.cfg
        res = tuple(c.camera_resolution)
        sensor_cfg = gelsight_mini_cfg(with_markers=False, camera_resolution=res, tactile_img_res=res)
        # one batched sensor evaluates both fingers: envs axis = 2N
        self.sensor = GelSightSensor(sensor_cfg, num_envs=2 * c.num_envs)
        self._q0 = jnp.asarray(c.reset_joints, jnp.float32)
        self._ee_off = jnp.asarray([0.0, 0.0, 0.107], jnp.float32)  # hand tcp
        t = c.task
        # keypoints along the held asset axis (factory_env.py:153-158)
        ko = np.zeros((t.num_keypoints, 3), np.float32)
        ko[:, 2] = (np.linspace(0.0, 1.0, t.num_keypoints) - 0.5) * t.keypoint_scale
        self._keypoint_offsets = jnp.asarray(ko)

    # ---------------------------------------------------------------- helpers
    def _tool_pose(self, q):
        pos, quat, _, _ = franka.forward_kinematics(q, ee_offset_pos=self._ee_off)
        return pos, quat

    def _held_pose(self, tool_pos, tool_quat, grip_offset):
        """Held asset base (bottom tip) pose: hangs below the tool."""
        t = self.cfg.task
        off = jnp.array([0.0, 0.0, 0.02], jnp.float32) + grip_offset  # grip depth
        base = tool_pos + maths.quat_apply(tool_quat, off + jnp.array([0.0, 0.0, t.held_height]))
        return base, tool_quat

    def _fixed_target(self, state):
        """Insertion target on the fixed asset (top center of the hole)."""
        top = state.fixed_pos + maths.quat_apply(
            state.fixed_quat, jnp.array([0.0, 0.0, self.cfg.task.fixed_size[2] / 2])
        )
        return top

    # ------------------------------------------------------------------ state
    def init_state(self, key: jax.Array) -> FactoryState:
        n = self.cfg.num_envs
        t = self.cfg.task
        return FactoryState(
            arm=franka.ArmState.init(n, self._q0),
            fixed_pos=jnp.tile(jnp.asarray(t.fixed_init_pos, jnp.float32), (n, 1)),
            fixed_quat=maths.quat_identity((n,)),
            held_grip_offset=jnp.zeros((n, 3)),
            ctrl_target=jnp.zeros((n, 3)),
            ema_target=jnp.zeros((n, 6)),
            actions=jnp.zeros((n, 6)),
            prev_actions=jnp.zeros((n, 6)),
            ep_succeeded=jnp.zeros((n,), bool),
            episode_length=jnp.zeros((n,), jnp.int32),
            key=key,
        )

    def _reset_where(self, state: FactoryState, mask: jax.Array) -> FactoryState:
        c, t = self.cfg, self.cfg.task
        n = c.num_envs
        key, k1, k2, k3 = jax.random.split(state.key, 4)
        m1 = mask[:, None]
        fixed0 = jnp.asarray(t.fixed_init_pos, jnp.float32)
        noise = jnp.asarray(t.fixed_asset_init_pos_noise, jnp.float32)
        new_fixed = fixed0 + jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0) * noise
        grip_noise = jnp.asarray(t.held_asset_pos_noise, jnp.float32)
        new_grip = jax.random.uniform(k2, (n, 3), minval=-1.0, maxval=1.0) * grip_noise
        q0 = jnp.broadcast_to(self._q0, (n, 7))
        # arm starts above the (randomized) fixed asset: solve a few IK steps
        # toward hand_init_pos over the fixed top
        arm_q = jnp.where(m1, q0, state.arm.q)
        target = new_fixed + jnp.asarray([0.0, 0.0, t.fixed_size[2] / 2], jnp.float32)
        target = target + jnp.asarray(t.hand_init_pos, jnp.float32) + jnp.array(
            [0.0, 0.0, t.held_height + 0.02]
        )
        down_quat = maths.quat_from_angle_axis(jnp.asarray(math.pi), jnp.array([1.0, 0.0, 0.0]))
        for _ in range(12):
            pos, quat, orig, ax = franka.forward_kinematics(arm_q, ee_offset_pos=self._ee_off)
            jac = franka.geometric_jacobian(pos, orig, ax)
            rot_err = maths.axis_angle_from_quat(
                maths.quat_mul(jnp.broadcast_to(down_quat, quat.shape), maths.quat_conjugate(quat))
            )
            arm_q_new = franka.dls_ik_step(arm_q, target - pos, rot_err, jac)
            arm_q = jnp.where(m1, jnp.clip(arm_q_new, franka.Q_LOWER, franka.Q_UPPER), arm_q)
        return FactoryState(
            arm=franka.ArmState(
                q=arm_q,
                qd=jnp.where(m1, 0.0, state.arm.qd),
                q_target=jnp.where(m1, arm_q, state.arm.q_target),
            ),
            fixed_pos=jnp.where(m1, new_fixed, state.fixed_pos),
            fixed_quat=jnp.where(m1, maths.quat_identity((n,)), state.fixed_quat),
            held_grip_offset=jnp.where(m1, new_grip, state.held_grip_offset),
            ctrl_target=jnp.where(
                m1, franka.forward_kinematics(arm_q, ee_offset_pos=self._ee_off)[0], state.ctrl_target
            ),
            ema_target=jnp.where(m1, 0.0, state.ema_target),
            actions=jnp.where(m1, 0.0, state.actions),
            prev_actions=jnp.where(m1, 0.0, state.prev_actions),
            ep_succeeded=jnp.where(mask, False, state.ep_succeeded),
            episode_length=jnp.where(mask, 0, state.episode_length),
            key=key,
        )

    def reset_all(self, state):
        state = self._reset_where(state, jnp.ones((self.cfg.num_envs,), bool))
        obs, _ = self._observations(state, None)
        return state, obs

    # ------------------------------------------------------------------- step
    def step(self, state: FactoryState, action: jax.Array):
        c, t = self.cfg, self.cfg.task
        n = c.num_envs
        key, k_obs = jax.random.split(state.key)

        prev_actions = state.actions
        actions = jnp.clip(jnp.nan_to_num(action), -1.0, 1.0)
        # EMA action smoothing (factory ctrl.ema_factor)
        ema = c.ema_factor * actions + (1 - c.ema_factor) * state.ema_target
        delta_pos = ema[:, :3] * jnp.asarray(c.pos_action_bounds)
        delta_rot = ema[:, 3:6] * jnp.asarray(c.rot_action_bounds) * 0.1

        # Closed-loop task-space tracking toward a PERSISTENT absolute target
        # (the reference's ctrl-target scheme): the target integrates the
        # bounded action deltas and stays put otherwise, so joint-space
        # tracking error cannot accumulate into lateral drift.
        target_pos = state.ctrl_target + delta_pos * 0.25
        # keep the target within the workspace box around the fixed asset
        lo = state.fixed_pos + jnp.array([-0.15, -0.15, -0.02])
        hi = state.fixed_pos + jnp.array([0.15, 0.15, 0.30])
        target_pos = jnp.clip(target_pos, lo, hi)
        down_quat = maths.quat_from_angle_axis(
            jnp.asarray(jnp.pi), jnp.array([1.0, 0.0, 0.0])
        )
        arm = state.arm
        for _ in range(c.decimation):
            pos, quat, orig, ax = franka.forward_kinematics(arm.q, ee_offset_pos=self._ee_off)
            jac = franka.geometric_jacobian(pos, orig, ax)
            rot_err = maths.axis_angle_from_quat(
                maths.quat_mul(jnp.broadcast_to(down_quat, quat.shape), maths.quat_conjugate(quat))
            )
            q_t = franka.dls_ik_step(arm.q, target_pos - pos, 0.5 * rot_err + delta_rot / c.decimation, jac)
            arm = franka.ArmState(
                q=arm.q, qd=arm.qd, q_target=jnp.clip(q_t, franka.Q_LOWER, franka.Q_UPPER)
            )
            arm = franka.servo_step(arm, c.sim_dt, stiffness=20.0)

        # penetration projection: the held asset cannot enter the fixed block
        # (unless aligned with the hole) nor the table under it
        tool_pos, tool_quat = self._tool_pose(arm.q)
        held_base, _ = self._held_pose(tool_pos, tool_quat, state.held_grip_offset)
        hole_top = self._fixed_target(state)
        xy_dist = jnp.linalg.norm(held_base[:, :2] - hole_top[:, :2], axis=-1)
        block_top_z = hole_top[:, 2]
        # once the tip is inside the hole it stays captured (the hole wall
        # would block lateral escape; without this, micro-drift after
        # insertion would flip `aligned` and eject the peg upward)
        inside_hole = held_base[:, 2] < block_top_z - 0.001
        aligned = (xy_dist < (t.hole_diameter - t.held_diameter) / 2 + 0.0015) | (
            inside_hole & (xy_dist < t.hole_diameter)
        )
        over_block = (
            (jnp.abs(held_base[:, 0] - state.fixed_pos[:, 0]) < t.fixed_size[0] / 2 + t.held_diameter / 2)
            & (jnp.abs(held_base[:, 1] - state.fixed_pos[:, 1]) < t.fixed_size[1] / 2 + t.held_diameter / 2)
        )
        table_z = state.fixed_pos[:, 2] - t.fixed_size[2] / 2
        min_z = jnp.where(
            over_block,
            jnp.where(aligned, block_top_z - t.hole_depth, block_top_z),
            table_z,
        )
        pen = jnp.maximum(min_z - held_base[:, 2], 0.0)
        # project the arm up by the violation (kinematic contact constraint)
        q_fix = franka.apply_delta_pose_ik(
            arm, jnp.stack([jnp.zeros(n), jnp.zeros(n), pen], -1), jnp.zeros((n, 3)),
            ee_offset_pos=self._ee_off,
        )
        corrected = jnp.where((pen > 0)[:, None], q_fix.q_target, arm.q)
        arm = franka.ArmState(q=corrected, qd=arm.qd, q_target=q_fix.q_target)
        tool_pos, tool_quat = self._tool_pose(arm.q)
        held_base, held_quat = self._held_pose(tool_pos, tool_quat, state.held_grip_offset)

        # --------------- tactile: both fingers press the held cylinder
        depth_two = self._finger_depths(tool_quat, state.held_grip_offset, pen)
        _, sensor_out = self.sensor.update(self.sensor.init_state(), depth_two)
        tactile = sensor_out["tactile_rgb"].reshape(n, 2, *sensor_out["tactile_rgb"].shape[1:])

        state = FactoryState(
            arm=arm, fixed_pos=state.fixed_pos, fixed_quat=state.fixed_quat,
            held_grip_offset=state.held_grip_offset, ctrl_target=target_pos, ema_target=ema,
            actions=actions, prev_actions=prev_actions,
            ep_succeeded=state.ep_succeeded,
            episode_length=state.episode_length + 1, key=key,
        )

        # --------------- keypoints / success (factory_env.py:245-263, 440-465)
        held_tip = held_base  # bottom of held asset
        # keypoints along the world-up axis for both assets (the peg hangs
        # upright; the tool quat itself is flipped 180deg, so using it would
        # reverse the keypoint line)
        kp_held = held_tip[:, None, :] + self._keypoint_offsets[None]
        hole_target = hole_top - jnp.array([0.0, 0.0, t.hole_depth])
        kp_fixed = hole_target[:, None, :] + self._keypoint_offsets[None]
        keypoint_dist = jnp.linalg.norm(kp_held - kp_fixed, axis=-1).mean(-1)

        z_disp = held_tip[:, 2] - hole_target[:, 2]
        is_centered = xy_dist < 0.0025
        success = is_centered & (z_disp < t.hole_depth * t.success_threshold)
        engaged = is_centered & (z_disp < t.hole_depth * t.engage_threshold)

        def squash(x, a, b):
            return 1.0 / (jnp.exp(a * x) + b + jnp.exp(-a * x))

        rew = (
            squash(keypoint_dist, *t.keypoint_coef_baseline)
            + squash(keypoint_dist, *t.keypoint_coef_coarse)
            + squash(keypoint_dist, *t.keypoint_coef_fine)
            + engaged.astype(jnp.float32)
            + success.astype(jnp.float32)
            - t.action_penalty_scale * jnp.linalg.norm(actions, axis=-1)
            - t.action_grad_penalty_scale * jnp.linalg.norm(actions - prev_actions, axis=-1)
        )

        state = dataclasses.replace(state, ep_succeeded=state.ep_succeeded | success)
        terminated = jnp.zeros((n,), bool)
        truncated = state.episode_length >= c.max_episode_length - 1

        done = terminated | truncated
        info = {
            "log": {
                "keypoint_dist": keypoint_dist.mean(),
                "successes": success.mean(),
                "engaged": engaged.mean(),
            },
            "tactile_rgb_fingers": tactile,
        }
        state = self._reset_where(state, done)
        obs, _ = self._observations(state, tactile, k_obs)
        return state, obs, rew, terminated, truncated, info

    # ----------------------------------------------------------------- vision
    def _finger_depths(self, tool_quat, grip_offset, pen) -> jax.Array:
        """Synthesize both finger-sensor depth maps of the gripped cylinder.

        The cylinder (radius r) presses into each finger gel by the grasp
        depth plus a shear-proportional extra when insertion force builds
        (pen > 0) — giving the tactile observation its contact signal.
        (2N, h, w) depth in meters, fingers stacked [left, right].
        """
        c, t = self.cfg, self.cfg.task
        n = c.num_envs
        w, h = c.camera_resolution
        far = self.sensor.cfg.sensor_camera_cfg.clipping_range[1]
        gel_top = 0.0285
        r = t.held_diameter / 2
        yy, xx = jnp.meshgrid(
            (jnp.arange(h) + 0.5) / h - 0.5, (jnp.arange(w) + 0.5) / w - 0.5, indexing="ij"
        )
        x_m = xx * 0.0189  # camera window width (m)
        y_m = yy * 0.0142
        press0 = 0.0008  # base grasp indentation
        press = press0 + jnp.minimum(pen, 0.002)  # force -> deeper press
        # cylinder axis runs along the image y axis; lateral offset = grip noise
        off = grip_offset[:, 1]
        dx = x_m[None] - off[:, None, None]
        inside = jnp.abs(dx) < r
        z_surf = jnp.where(
            inside, r - jnp.sqrt(jnp.maximum(r * r - dx * dx, 0.0)), r
        )  # height above the touching line
        depth = gel_top - press[:, None, None] + z_surf
        depth = jnp.clip(depth, 0.0, far)
        return jnp.concatenate([depth, depth], axis=0)  # both fingers alike

    # -------------------------------------------------------------------- obs
    def _observations(self, state, tactile, obs_key=None):
        c = self.cfg
        n = c.num_envs
        tool_pos, tool_quat = self._tool_pose(state.arm.q)
        hole_top = self._fixed_target(state)
        # EE velocity from the servo joint rates through the Jacobian
        _, _, orig, ax = franka.forward_kinematics(state.arm.q, ee_offset_pos=self._ee_off)
        jac = franka.geometric_jacobian(tool_pos, orig, ax)
        ee_vel = jnp.einsum("nij,nj->ni", jac, state.arm.qd)
        proprio = jnp.concatenate(
            [
                tool_pos - hole_top,  # fingertip_pos_rel_fixed
                tool_quat,  # fingertip_quat
                ee_vel[:, :3],  # ee_linvel
                ee_vel[:, 3:6],  # ee_angvel
                state.prev_actions,
            ],
            axis=-1,
        )
        if tactile is None:
            vision = jnp.zeros((n,) + tuple(c.vision_obs_shape[:2]) + (6,))
        else:
            # both finger sensors, stacked along channels: (N, 32, 32, 6)
            # (the reference exposes two separate 32x32 tactile images,
            # factory_env_cfg.py:192-213)
            vision = jnp.concatenate([tactile[:, 0], tactile[:, 1]], axis=-1)
        return {"proprio_obs": proprio, "vision_obs": vision}, None
