"""Grasp-and-lift RL task on the unified FEM<->ABD contact world.

The round-3 coupled solver (physics/soft/coupled.py) exists so that the
core GelSight-gripper manipulation scenario — two FEM gel pads grasping
and lifting a FREE rigid object by friction — runs as one Newton solve
(libuipc's single contact world over its FiniteElementMethod /
AffineBodyDynamics subsystems, reference
source/tacex_uipc/tacex_uipc/sim/uipc_sim.py:204-208). This env turns the
showcase (examples/grasp_lift.py) into a *batched RL task*: N grasping
scenes solve in one compiled program, auto-reset in-graph, with real
gel-deformation tactile observations — a capability the reference cannot
offer (its libuipc scenes are single-env, reference
direct_uipc_rl_env.py limitations noted in SURVEY §2.6).

Action (2): [squeeze_rate, lift_rate] in [-1, 1] — the pads are mounted
on a kinematic parallel gripper; actions drive the mount positions
(attachment aims), everything else is physics: the cube rises only if the
gel friction carries it.

Observations:
  * privileged: cube pose/velocity + gripper state + per-pad mean gel
    compression (the grip-force observable).
  * depth: the same proprio plus a (gh, gw, 2) per-pad inner-face normal
    COMPRESSION image — the cheap tactile signal, straight from the FEM
    state (positive = gel pressed in by the cube).
  * tactile: the FULL GelSight stack (reference sensor contract,
    source/tacex/tacex/gelsight_sensor.py:265-319): each pad carries a
    sensor camera that rides the pad mount and images the embedded dense
    inner-face surface (physics/soft/embed.py); the per-pad depth map
    feeds the shared ``GelSightSensor`` facade, so the env emits real
    Taxim ``tactile_rgb`` and FOTS ``marker_motion`` from the coupled
    FEM solve. Because the camera moves rigidly with the mount, the
    camera-frame depth is exactly ``cam_to_contact − compression``, so
    the cheap compression image and the sensor path share one gather.

Rewards: lift progress toward ``lift_target``, grip shaping while not yet
lifted, drop penalty, action-rate penalty, success bonus (cube carried to
>=90% of the target and still gripped).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import configclass
from ...physics.soft.abd import AbdModel, AbdSolverCfg, AbdState
from ...physics.soft.coupled import CoupledModel
from ...physics.soft.ipc import (
    IpcSolverCfg,
    RigidSdfScene,
    SoftBodyModel,
    SoftBodyState,
)
from ...physics.soft.mesh import box_tet_mesh, union_meshes
from ...sensors.gelsight.fots import marker_motion as fots
from ...sensors.gelsight.sensor import GelSightSensor, GelSightSensorState
from ...sensors.gelsight.sensor_cfg import gelsight_mini_cfg
from ..base import DirectRLEnv, DirectRLEnvCfg

PAD_SIZE = (0.01, 0.03, 0.03)  # per-pad box (m); GelSight-Mini-ish gel slab
PAD_CENTER_X = 0.0135  # pad centers at +-13.5 mm -> 1 mm gap per side
CUBE_HALF = 0.0075


def _cube_surface(s: float = CUBE_HALF) -> tuple[np.ndarray, np.ndarray]:
    pts = np.array(
        [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)], np.float64
    )
    tris = np.array(
        [
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        ],
        np.int64,
    )
    return pts, tris


@configclass
class GraspLiftEnvCfg(DirectRLEnvCfg):
    num_envs: int = 16
    episode_length_s: float = 2.0
    sim_dt: float = 1.0 / 100.0
    decimation: int = 2
    action_space: int = 2  # squeeze rate, lift rate
    obs_mode: str = "privileged"  # privileged | depth | tactile

    # tactile mode (full GelSight stack): per-pad sensor camera resolution
    # (w, h) — the optical path runs at this res like the flagship task
    # (reference gsmini_taxim_fots pairs 32x24 optics with 320x240 FOTS
    # marker coordinates); composite vision obs is (vh, vw, 6) = two pads
    # channel-stacked, the factory-env two-finger layout.
    camera_resolution: tuple = (32, 32)
    vision_obs_shape: tuple = (32, 32, 3)

    # scene
    pad_resolution: tuple = (2, 4, 4)
    # dense tactile: embed an (eh, ew) surface grid on each pad's inner
    # face (one-time barycentric binding, physics/soft/embed.py) so the
    # depth obs is a real sensor-resolution image at coarse-solve cost.
    # None keeps the raw coarse-grid image.
    tactile_embed: tuple | None = None
    gel_youngs_modulus_mpa: float = 0.1
    gel_poisson_ratio: float = 0.45
    gel_density: float = 1000.0
    cube_density: float = 2000.0
    friction_mu: float = 0.5
    ground_z: float = -0.02  # dropped cubes land here (visible failure)

    # gripper kinematics (rates are per action unit, in m/s)
    squeeze_rate: float = 5.0e-3
    lift_rate: float = 2.0e-2
    max_squeeze: float = 1.5e-3  # m of inward travel per pad (0.5 mm compression)
    max_lift: float = 0.03

    # task. drop_z must sit ABOVE the ground-rest height (ground_z + d_hat
    # + CUBE_HALF = -0.0115): a cube that slides out lands on the ground
    # and parks there, so a lower threshold would never fire.
    lift_target: float = 0.015
    drop_z: float = -0.008  # cube center below this = dropped (lost the grip)
    reset_xy_noise: float = 1.0e-3
    # Stagger initial episode phases: grasp-lift episodes almost never
    # terminate early (success is a held state; drops are rare once trained),
    # so without staggering all envs truncate on the SAME step forever and
    # every rollout window sits at one episode phase. Measured on the 64-env
    # PPO run (logs/grasp_lift_ppo_r04b): with episode = 2 rollout windows the
    # per-iteration reward alternates ~1 <-> ~12 (window A = post-reset
    # re-grasp, window B = holding) and the advantage signal oscillates with
    # it. Randomizing the initial counters de-synchronizes truncations, making
    # every window a stationary mix of phases.
    stagger_initial_episodes: bool = True
    # Default-on broad-phase observability (round-4 verdict item 5): every
    # step logs CoupledModel.missed_barriers — cross-family pairs within
    # TRUE barrier distance (< d_hat) in excess of the top-K candidate
    # capacity, summed over envs. Jitted into the step (two tiny exact
    # distance matrices over ~150 verts x 12 tris), <1% of the coupled
    # solve; nonzero means an ACTIVE barrier pair got dropped — raise
    # coupling_k. (The conservative candidate-cut counters in
    # UipcSim.broad_phase_overflow chronically read nonzero in tight
    # grasps and stay an opt-in diagnostic there.)
    log_broad_phase_overflow: bool = True

    # solver. d_hat = 1 mm spans the initial pad-cube gaps, so the barrier
    # (and its friction) engages from the first squeeze step — the cube
    # must be CAUGHT, not teleported into contact (tests/test_coupled.py
    # uses the same geometry + d_hat)
    newton_iters: int = 6
    cg_iters: int = 24
    coupling_k: int = 4
    d_hat: float = 1.0e-3
    kappa: float = 1.0e4

    # rewards
    w_lift: float = 2.0
    w_grip: float = 0.5
    w_drop: float = 10.0
    w_action_rate: float = 0.01
    w_success: float = 10.0
    grip_target_mm: float = 0.4  # per-pad mean compression that saturates r_grip


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraspLiftState:
    gel: SoftBodyState  # union of both pads
    cube: AbdState  # B = 1
    squeeze: jax.Array  # (N,) current inward travel per pad (m)
    lift: jax.Array  # (N,) current mount height offset (m)
    actions: jax.Array  # (N, 2)
    prev_actions: jax.Array  # (N, 2)
    episode_length: jax.Array  # (N,) int32
    ep_succeeded: jax.Array  # (N,) bool
    # FOTS trajectory state for both pad sensors, pad-major (2N rows:
    # [pad0 envs; pad1 envs]). Tiny; carried in every obs_mode so the
    # state pytree structure is mode-independent.
    sensor: GelSightSensorState
    key: jax.Array


class GraspLiftEnv(DirectRLEnv):
    """Two FEM gel pads + one free affine cube in one contact world."""

    def __init__(self, cfg: GraspLiftEnvCfg | None = None):
        cfg = cfg or GraspLiftEnvCfg()
        super().__init__(cfg)
        c = cfg

        # ---- pads: one union FEM model (matches UipcSim._setup_union layout)
        meshes, mounts, inner_grids = [], [], []
        for sgn in (-1.0, +1.0):
            mesh = box_tet_mesh(
                PAD_SIZE, c.pad_resolution, center=(sgn * PAD_CENTER_X, 0.0, 0.0)
            )
            meshes.append(mesh)
            # mount = outer x face (driven); inner face = contact face
            xo = sgn * (PAD_CENTER_X + PAD_SIZE[0] / 2)
            xi = sgn * (PAD_CENTER_X - PAD_SIZE[0] / 2)
            mounts.append(np.where(np.abs(mesh.points[:, 0] - xo) < 1e-9)[0])
            inner = np.where(np.abs(mesh.points[:, 0] - xi) < 1e-9)[0]
            # inner-face verts form a regular (ny+1, nz+1) grid -> tactile img
            p = mesh.points[inner]
            order = np.lexsort((p[:, 1], p[:, 2]))  # rows = z, cols = y
            _, ny, nz = c.pad_resolution
            inner_grids.append(inner[order].reshape(nz + 1, ny + 1))
        union, offsets = union_meshes(meshes)
        att = np.concatenate(
            [m + offsets[i] for i, m in enumerate(mounts)]
        ).astype(np.int32)
        self._mount_rest = jnp.asarray(union.points[att], jnp.float32)  # (Va, 3)
        self._mount_sgn = jnp.sign(self._mount_rest[:, 0])  # (Va,)
        self._inner_grids = jnp.asarray(
            np.stack([g + offsets[i] for i, g in enumerate(inner_grids)])
        )  # (2, gh, gw) union vertex ids
        self._pad_sgn = jnp.asarray([-1.0, 1.0])  # sign of each pad's center x
        self._rest_points = jnp.asarray(union.points, jnp.float32)

        # dense embedded tactile surfaces (one per pad, bound once).
        # EmbeddedFaceGrid binds in grid-index space, so the x-normal inner
        # faces work exactly like the z-normal gel face in the ball env.
        if c.tactile_embed is not None:
            from ...physics.soft.embed import EmbeddedFaceGrid

            self._embeds = [
                EmbeddedFaceGrid(
                    np.asarray(g + offsets[i]), union.points, c.tactile_embed
                )
                for i, g in enumerate(inner_grids)
            ]
            self._embed_rest_x = jnp.asarray(
                np.stack([e.rest_points[:, 0] for e in self._embeds])
            )  # (2, eh*ew)
        else:
            self._embeds = None

        fem_cfg = IpcSolverCfg(
            dt=c.sim_dt,
            newton_max_iter=c.newton_iters,
            cg_iters=c.cg_iters,
            d_hat=c.d_hat,
            kappa=c.kappa,
            friction_mu=c.friction_mu,
        )
        self.gel = SoftBodyModel(
            union,
            youngs_modulus=c.gel_youngs_modulus_mpa * 1e6,
            poisson_ratio=c.gel_poisson_ratio,
            mass_density=c.gel_density,
            cfg=fem_cfg,
            attachment_verts=att,
        )

        # ---- cube: one free affine body
        pts, tris = _cube_surface()
        abd_cfg = AbdSolverCfg(
            dt=c.sim_dt,
            d_hat=c.d_hat,
            kappa_contact=c.kappa,
            friction_mu=c.friction_mu,
            contact_k=0,  # a single body: no body-body pairs
            ee_contact_k=0,
            linear_solver="cg",  # batched RL-scale path
            newton_max_iter=c.newton_iters,
        )
        self.cube = AbdModel(
            [pts], [tris], mass_density=c.cube_density, kappa_ortho=1e7, cfg=abd_cfg
        )
        self.world = CoupledModel(self.gel, self.cube, cross_k=c.coupling_k)

        # ground plane for dropped cubes (RigidSdfScene is per-env pytree)
        sc = RigidSdfScene.empty(c.num_envs)
        self.scene = RigidSdfScene(
            sc.spheres,
            sc.boxes,
            sc.capsules,
            sc.planes.at[:, 0].set(jnp.array([0.0, 0.0, 1.0, c.ground_z])),
        )

        # full GelSight stack (obs_mode == "tactile"): ONE batched sensor
        # evaluates both pads, env axis = 2N pad-major (the factory-env
        # two-finger pattern, envs/factory/env.py). Markers stay on — the
        # sensor state is carried in GraspLiftState across steps.
        if c.obs_mode == "tactile":
            res = tuple(c.camera_resolution)
            self.sensor = GelSightSensor(
                gelsight_mini_cfg(
                    with_markers=True, camera_resolution=res, tactile_img_res=res
                ),
                num_envs=2 * c.num_envs,
            )
            ocfg = self.sensor.cfg.optical_sim_cfg
            # camera-to-rest-contact-face distance: undeformed gel images at
            # exactly zero indentation (sensor.compute_indentation_depth)
            self._cam_to_contact = (
                ocfg.gelpad_to_camera_min_distance + ocfg.gelpad_height
            )
        else:
            self.sensor = None

    # ------------------------------------------------------------------ state
    def init_state(self, key: jax.Array) -> GraspLiftState:
        n = self.cfg.num_envs
        return GraspLiftState(
            gel=SoftBodyState.init(n, np.asarray(self._rest_points)),
            cube=AbdState.identity(n, 1),
            squeeze=jnp.zeros((n,)),
            lift=jnp.zeros((n,)),
            actions=jnp.zeros((n, 2)),
            prev_actions=jnp.zeros((n, 2)),
            episode_length=jnp.zeros((n,), jnp.int32),
            ep_succeeded=jnp.zeros((n,), bool),
            sensor=GelSightSensorState.init(2 * n),
            key=key,
        )

    def reset_all(self, state: GraspLiftState):
        state = self._reset_where(state, jnp.ones((self.cfg.num_envs,), bool))
        if self.cfg.stagger_initial_episodes:
            key, k_stagger = jax.random.split(state.key)
            ep0 = jax.random.randint(
                k_stagger,
                (self.cfg.num_envs,),
                0,
                self.cfg.max_episode_length,
                jnp.int32,
            )
            state = dataclasses.replace(state, episode_length=ep0, key=key)
        obs, state, _ = self._observations(state)
        return state, obs

    def _reset_where(self, state: GraspLiftState, mask: jax.Array) -> GraspLiftState:
        n = self.cfg.num_envs
        key, k1 = jax.random.split(state.key)
        m1 = mask[:, None]
        # cube: identity pose + small xy offset (the grasp must be robust
        # to the object not being perfectly centered)
        xy = jax.random.uniform(
            k1, (n, 2), minval=-self.cfg.reset_xy_noise, maxval=self.cfg.reset_xy_noise
        )
        q0 = AbdState.identity(n, 1).q.at[:, 0, :2].add(xy)
        cube = AbdState(
            q=jnp.where(mask[:, None, None], q0, state.cube.q),
            qd=jnp.where(mask[:, None, None], 0.0, state.cube.qd),
        )
        gel0 = jnp.broadcast_to(self._rest_points, state.gel.x.shape)
        gel = SoftBodyState(
            x=jnp.where(mask[:, None, None], gel0, state.gel.x),
            v=jnp.where(mask[:, None, None], 0.0, state.gel.v),
        )
        # sensor traj rows are pad-major (2N): both pads reset together
        mask2 = jnp.concatenate([mask, mask])
        sensor = GelSightSensorState(
            traj_start=jnp.where(mask2[:, None], 0.0, state.sensor.traj_start),
            traj_curr=jnp.where(mask2[:, None], 0.0, state.sensor.traj_curr),
            traj_count=jnp.where(mask2, 0, state.sensor.traj_count),
        )
        return GraspLiftState(
            gel=gel,
            cube=cube,
            squeeze=jnp.where(mask, 0.0, state.squeeze),
            lift=jnp.where(mask, 0.0, state.lift),
            actions=jnp.where(m1, 0.0, state.actions),
            prev_actions=jnp.where(m1, 0.0, state.prev_actions),
            episode_length=jnp.where(mask, 0, state.episode_length),
            ep_succeeded=jnp.where(mask, False, state.ep_succeeded),
            sensor=sensor,
            key=key,
        )

    # ------------------------------------------------------------------- step
    def _aim_positions(self, squeeze: jax.Array, lift: jax.Array) -> jax.Array:
        """Mount aim rows (N, Va, 3): rest position moved inward by squeeze
        (toward x=0) and up by lift."""
        off = jnp.stack(
            [
                -self._mount_sgn[None, :] * squeeze[:, None],
                jnp.zeros((squeeze.shape[0], self._mount_sgn.shape[0])),
                jnp.broadcast_to(
                    lift[:, None], (lift.shape[0], self._mount_sgn.shape[0])
                ),
            ],
            axis=-1,
        )
        return self._mount_rest[None] + off

    def _pad_compression(self, gel_x: jax.Array, squeeze: jax.Array) -> jax.Array:
        """Per-pad inner-face compression images (N, 2, gh, gw) in mm.

        The tactile signal is the gel DEFORMATION, not the pad's rigid
        motion: if the gel were rigid, squeezing would put the inner face
        at rest - pad_sgn * squeeze along x; contact with the cube holds
        it back. Compression = (rigid-expected - actual) along the pad's
        inward normal (positive = indented by the cube)."""
        if self._embeds is not None:
            eh, ew = self._embeds[0].shape
            x = jnp.stack(
                [e.positions(gel_x)[..., 0] for e in self._embeds], axis=1
            )  # (N, 2, eh*ew)
            x = x.reshape(gel_x.shape[0], 2, eh, ew)
            rest = self._embed_rest_x.reshape(2, eh, ew)
        else:
            grids = self._inner_grids  # (2, gh, gw)
            x = gel_x[:, grids.reshape(-1), 0]  # (N, 2*gh*gw) current x coords
            x = x.reshape(gel_x.shape[0], *grids.shape)  # (N, 2, gh, gw)
            rest = self._rest_points[grids.reshape(-1), 0].reshape(grids.shape)
        sgn = self._pad_sgn[None, :, None, None]  # pad 0: -1, pad 1: +1
        expected = rest[None] - sgn * squeeze[:, None, None, None]
        # inward normal = -sgn (pad 0 presses toward +x)
        return (expected - x) * (-sgn) * 1e3

    def step(self, state: GraspLiftState, action: jax.Array):
        c = self.cfg
        action = jnp.clip(jnp.nan_to_num(action), -1.0, 1.0)
        prev_actions = state.actions

        dt_step = c.sim_dt
        squeeze = state.squeeze
        lift = state.lift
        gel, cube = state.gel, state.cube

        def decim_body(_, carry):
            gel, cube, squeeze, lift = carry
            squeeze = jnp.clip(
                squeeze + action[:, 0] * c.squeeze_rate * dt_step, 0.0, c.max_squeeze
            )
            lift = jnp.clip(
                lift + action[:, 1] * c.lift_rate * dt_step, 0.0, c.max_lift
            )
            aim = self._aim_positions(squeeze, lift)
            gel, cube = self.world.step(gel, cube, self.scene, aim_pos=aim)
            return gel, cube, squeeze, lift

        gel, cube, squeeze, lift = jax.lax.fori_loop(
            0, c.decimation, decim_body, (gel, cube, squeeze, lift)
        )

        cube_z = cube.q[:, 0, 2]  # translation of the (origin-centered) cube
        comp = self._pad_compression(gel.x, squeeze)  # (N, 2, gh, gw) mm
        grip = comp.mean(axis=(2, 3))  # (N, 2) mean compression per pad

        state = GraspLiftState(
            gel=gel,
            cube=cube,
            squeeze=squeeze,
            lift=lift,
            actions=action,
            prev_actions=prev_actions,
            episode_length=state.episode_length + 1,
            ep_succeeded=state.ep_succeeded,
            sensor=state.sensor,
            key=state.key,
        )

        # ---- rewards
        lift_frac = jnp.clip(cube_z / c.lift_target, 0.0, 1.2)
        r_lift = c.w_lift * lift_frac
        r_grip = c.w_grip * jnp.clip(
            grip.min(axis=-1) / (c.grip_target_mm), 0.0, 1.0
        )
        dropped = cube_z < c.drop_z
        success = (cube_z > 0.9 * c.lift_target) & (grip.min(axis=-1) > 0.05)
        r_drop = -c.w_drop * dropped.astype(jnp.float32)
        act_rate = -c.w_action_rate * jnp.sum(
            jnp.square(action - prev_actions), axis=-1
        )
        # success is a HELD state that keeps paying, not a termination: a
        # one-shot terminal bonus makes hovering just below the threshold
        # out-earn succeeding (the per-step holding rewards beat +w_success
        # once, measured in the first round-4 training run — the policy
        # plateaued at ~7 mm), so the episode runs on and the bonus accrues
        # every step the cube is held above 0.9*lift_target. This also makes
        # Metric/success_rate the fraction of time spent holding the lift —
        # a direct, undiluted learning signal.
        r_success = c.w_success * success.astype(jnp.float32)
        reward = r_lift + r_grip + r_drop + act_rate + r_success

        state = dataclasses.replace(
            state, ep_succeeded=state.ep_succeeded | success
        )
        terminated = dropped
        truncated = state.episode_length >= c.max_episode_length
        done = terminated | truncated

        info = {
            "log": {
                "lift_reward": r_lift.mean(),
                **(
                    {
                        "Metric/missed_barriers": jax.vmap(
                            self.world.missed_barriers
                        )(gel.x, cube.q).sum().astype(jnp.float32)
                    }
                    if c.log_broad_phase_overflow
                    else {}
                ),
                "grip_reward": r_grip.mean(),
                "drop_penalty": r_drop.mean(),
                "success_reward": r_success.mean(),
                "Metric/cube_z_mm": (cube_z * 1e3).mean(),
                "Metric/grip_mm": grip.min(axis=-1).mean(),
                "Metric/success_rate": success.astype(jnp.float32).mean(),
            },
            "cube_z": cube_z,
            "grip": grip,
        }

        state = self._reset_where(state, done)
        obs, state, sensor_out = self._observations(state)
        if sensor_out is not None:
            # pad-major (2N, ...) -> (N, 2, ...), the reference sensor
            # output contract per finger (gelsight_sensor.py:265-319)
            n = self.cfg.num_envs
            info["tactile_rgb"] = jnp.stack(
                [sensor_out["tactile_rgb"][:n], sensor_out["tactile_rgb"][n:]], 1
            )
            if "marker_motion" in sensor_out:
                mm = sensor_out["marker_motion"]
                info["marker_motion"] = jnp.stack([mm[:n], mm[n:]], 1)
        return state, obs, reward, terminated, truncated, info

    # ------------------------------------------------------------------- obs
    def _pad_sensor_depth(self, comp_mm: jax.Array) -> jax.Array:
        """Per-pad camera depth (2N, res_h, res_w) in meters, pad-major.

        The sensor camera rides the pad mount, so rigid squeeze/lift motion
        cancels and the camera-frame depth of the (embedded dense) inner
        face is exactly ``cam_to_contact − compression``: undeformed gel
        sits at the far clipping plane (zero indentation), gel pressed in
        by the cube moves toward the camera — the real GelSight geometry
        (reference gelsight_sensor.py:581-598 height-map semantics)."""
        n, _, gh, gw = comp_mm.shape
        depth = self._cam_to_contact - comp_mm * 1e-3  # (N, 2, gh, gw) m
        depth = jnp.concatenate([depth[:, 0], depth[:, 1]], axis=0)  # (2N, gh, gw)
        res_w, res_h = self.cfg.camera_resolution
        if (gh, gw) != (res_h, res_w):
            depth = jax.image.resize(depth, (2 * n, res_h, res_w), method="linear")
        return depth

    def _cube_pose_in_pads(self, state: GraspLiftState):
        """Cube pose in each pad's sensor frame, pad-major (2N,).

        Image axes per pad: x_img = −sgn·ŷ, y_img = ẑ (right-handed with
        the view direction −sgn·x̂). Yaw is the in-plane rotation of the
        cube about the view axis; AbdState.q stores A by rows
        (q[3+3i+j] = A[i,j])."""
        q = state.cube.q[:, 0]  # (N, 12)
        t = q[:, :3]
        pos, yaw = [], []
        for sgn in (-1.0, 1.0):
            pos.append(
                jnp.stack([-sgn * t[:, 1], t[:, 2] - state.lift], axis=-1) * 1e3
            )
            # body axis resting along x_img is b = −sgn·ŷ; w = A b = −sgn·A[:,1]
            w_y = -sgn * q[:, 7]   # A[1,1]
            w_z = -sgn * q[:, 10]  # A[2,1]
            yaw.append(jnp.arctan2(w_z, -sgn * w_y))
        return jnp.concatenate(pos, axis=0), jnp.concatenate(yaw, axis=0)

    def _observations(self, state: GraspLiftState):
        """Returns (obs, state, sensor_out) — the sensor path advances the
        FOTS trajectory state, so observation extraction threads state."""
        comp = self._pad_compression(state.gel.x, state.squeeze)  # (N, 2, gh, gw)
        grip = comp.mean(axis=(2, 3))
        # gripper-only proprio (6-dim): what a real gripper knows about
        # itself — squeeze/lift commands, the sensor-derived grip estimate,
        # last actions. The TACTILE variant sees ONLY this + the images:
        # the reference's tactile envs keep object state out of proprio
        # (ball_rolling_taxim_fots.py:391-394 — ee pose/goal/actions, never
        # the ball pose; the object-state split is what "Privileged" means
        # in the env family names). Until round 5 the tactile mode leaked
        # cube pose+velocity here, undercutting the RL-from-tactile claim.
        gripper_proprio = jnp.concatenate(
            [
                state.squeeze[:, None] * 1e3,
                state.lift[:, None] * 1e2,
                grip,
                state.actions,
            ],
            axis=-1,
        )
        proprio = jnp.concatenate(
            [
                state.cube.q[:, 0, :3],  # cube translation (privileged)
                state.cube.qd[:, 0, :3],  # cube velocity (privileged)
                gripper_proprio,
            ],
            axis=-1,
        )  # 12-dim
        if self.cfg.obs_mode == "privileged":
            return {"proprio_obs": proprio}, state, None
        if self.cfg.obs_mode == "depth":
            # cheap mode: per-pad compression images as channels
            # (N, gh, gw, 2) + gripper-only proprio — like the reference's
            # depth-tactile envs, no object state in proprio
            vision = jnp.moveaxis(comp, 1, -1)
            return {"proprio_obs": gripper_proprio, "vision_obs": vision}, state, None

        # ---- tactile: the full GelSight stack on both pads
        n = self.cfg.num_envs
        depth = self._pad_sensor_depth(comp)
        obj_pos_mm, obj_yaw = self._cube_pose_in_pads(state)
        sensor_state, sensor_out = self.sensor.update(
            state.sensor, depth, obj_yaw=obj_yaw, obj_pos_mm=obj_pos_mm
        )
        state = dataclasses.replace(state, sensor=sensor_state)

        vh, vw, _ = self.cfg.vision_obs_shape
        rgb = sensor_out["tactile_rgb"]  # (2N, th, tw, 3)
        if rgb.shape[1:3] != (vh, vw):
            rgb = jax.image.resize(rgb, (2 * n, vh, vw, 3), method="linear")
        if "marker_motion" in sensor_out:
            # flagship-env composite: multiply marker dots into the RGB
            mcfg = self.sensor.marker_cfg
            markers = sensor_out["marker_motion"][:, 1]  # (2N, M, 2)
            sx, sy = vw / mcfg.tactile_img_width, vh / mcfg.tactile_img_height
            dot_cfg = dataclasses.replace(
                mcfg, marker_dot_radius_px=max(mcfg.marker_dot_radius_px * sx, 0.45)
            )
            dots = fots.draw_marker_image(
                dot_cfg, markers * jnp.array([sx, sy]), hw=(vh, vw)
            )
            rgb = rgb * dots[..., None]
        # two pads channel-stacked: (N, vh, vw, 6) — the factory-env
        # two-finger layout (reference exposes two 32x32 tactile images).
        # Tactile mode is NON-privileged: gripper proprio + images only.
        vision = jnp.concatenate([rgb[:n], rgb[n:]], axis=-1)
        return {"proprio_obs": gripper_proprio, "vision_obs": vision}, state, sensor_out
