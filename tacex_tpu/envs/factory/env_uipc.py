"""Factory Peg-Insert on the unified FEM<->ABD contact world.

The reference ships a uipc-gripper asset (two soft gel pads on the Franka
gripper, /root/reference/source/tacex_assets/tacex_assets/robots/franka/
franka_gsmini_gripper_uipc.py) but its Factory envs never dare use it —
factory_env_cfg.py:192-213 mounts RIGID pads because libuipc is single-env
(docs/source/showcases/ball_rolling.md:23). This env is the round-4
verdict's stretch item: the Factory insertion station where the two
gripper gel pads are FEM bodies in the batched coupled Newton solve
(physics/soft/coupled.py) and the held peg is a FREE affine body carried
only by gel friction — the unified world as the default manipulation
substrate, not a bespoke grasp demo.

Scene (per env): a socket block (4 oriented boxes forming a square pocket,
RigidSdfScene primitives — contact for BOTH the gel and the peg) sits on
the ground at the origin; the kinematic parallel gripper starts above it
holding nothing — the square peg rests between the open pads and must be
squeezed, carried and inserted.

Action (4): [dx, dy, dz, squeeze] rates in [-1, 1] driving the gripper
mount; everything else is physics. Insertion succeeds only if friction
carries the peg down into the pocket.

Observations mirror the grasp-lift env family (privileged | depth), with
the same per-pad embedded-surface compression images available via
``tactile_embed`` (physics/soft/embed.py).

Rewards follow the Factory keypoint recipe (reference
factory/factory_env.py keypoint squash terms): distance from the peg tip
to the hole target through two squash kernels, plus an engagement bonus,
a held success bonus (same held-state design as grasp-lift) and an
action-rate penalty.
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
from ..base import DirectRLEnv, DirectRLEnvCfg
from ..grasp_lift.env import PAD_SIZE, _cube_surface

PAD_CENTER_X = 0.0135  # pad centers at +-13.5 mm (1 mm gap to the peg side)
# square peg, 15 mm x 15 mm x 60 mm, gripped at its CENTER: the tip then
# extends 15 mm below the pad bottoms (pads are 30 mm tall), so the peg can
# reach success_depth into the pocket while the pads clear the socket top
# by ~7 mm — with a 40 mm peg the pads foul the socket and the insertion
# stalls 0.5 mm past the rim (measured in the scripted probe).
PEG_HALF = (0.0075, 0.0075, 0.03)


@configclass
class FactoryUipcEnvCfg(DirectRLEnvCfg):
    num_envs: int = 16
    episode_length_s: float = 4.0
    sim_dt: float = 1.0 / 100.0
    decimation: int = 2
    action_space: int = 4  # dx, dy, dz, squeeze rates
    obs_mode: str = "privileged"  # privileged | depth

    # scene
    pad_resolution: tuple = (2, 4, 4)
    tactile_embed: tuple | None = None  # (eh, ew) dense embedded pad surface
    gel_youngs_modulus_mpa: float = 0.1
    gel_poisson_ratio: float = 0.45
    gel_density: float = 1000.0
    peg_density: float = 2000.0
    friction_mu: float = 0.5

    # socket: 4 walls forming a square pocket, open to the ground plane
    hole_half_width: float = 0.0095  # 2 mm clearance per side vs the peg
    socket_half_xy: float = 0.026
    socket_height: float = 0.025
    # gripper start: peg bottom this far above the socket top
    start_clearance: float = 0.01
    reset_xy_noise: float = 3.0e-3  # gripper start offset the policy must undo

    # gripper kinematics (m/s per action unit)
    move_rate: float = 2.0e-2
    squeeze_rate: float = 5.0e-3
    # 3 mm travel = ~1.7 mm gel compression on the peg (after the 1 mm
    # gap + barrier standoff): measured 95% carry-transfer at the default
    # newton/cg iterations — at 1.5 mm the margin over the 27 g peg is thin
    max_squeeze: float = 3.0e-3
    max_xy: float = 0.012  # mount travel box
    z_range: tuple = (-0.032, 0.015)  # mount z offset from the start pose

    # task
    success_depth: float = 0.008  # peg tip this far below the socket top
    success_xy_tol: float = 2.5e-3
    drop_dist: float = 0.05  # peg strayed this far from the mount = lost

    # solver (same rationale as GraspLiftEnvCfg: d_hat spans the 1 mm
    # pad-peg gaps so the squeeze engages friction from the first step)
    newton_iters: int = 6
    cg_iters: int = 24
    coupling_k: int = 4
    d_hat: float = 1.0e-3
    kappa: float = 1.0e4

    # rewards (Factory keypoint squash pair, factory_env.py _get_rewards)
    kp_coef: tuple = (100.0, 5.0)  # squash a-coefficients (coarse, fine)
    kp_scale: tuple = (1.0, 2.0)
    w_engage: float = 1.0
    w_success: float = 5.0
    w_action_rate: float = 0.01
    w_drop: float = 10.0
    stagger_initial_episodes: bool = True
    log_broad_phase_overflow: bool = True


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FactoryUipcState:
    gel: SoftBodyState
    peg: AbdState  # B = 1
    mount: jax.Array  # (N, 3) gripper translation from the build pose
    squeeze: jax.Array  # (N,)
    actions: jax.Array  # (N, 4)
    prev_actions: jax.Array
    episode_length: jax.Array  # (N,) int32
    ep_succeeded: jax.Array  # (N,) bool
    key: jax.Array


class FactoryUipcEnv(DirectRLEnv):
    """Two FEM gel pads + free affine peg + socket, one contact world."""

    def __init__(self, cfg: FactoryUipcEnvCfg | None = None):
        cfg = cfg or FactoryUipcEnvCfg()
        super().__init__(cfg)
        c = cfg

        # build pose: socket at the origin, gripper centered above it with
        # the peg hanging over the pocket
        self._z0 = c.socket_height + c.start_clearance + PEG_HALF[2]

        # ---- pads (the grasp-lift rig, translated up to the build pose)
        meshes, mounts, inner_grids = [], [], []
        for sgn in (-1.0, +1.0):
            mesh = box_tet_mesh(
                PAD_SIZE, c.pad_resolution,
                center=(sgn * PAD_CENTER_X, 0.0, self._z0),
            )
            meshes.append(mesh)
            xo = sgn * (PAD_CENTER_X + PAD_SIZE[0] / 2)
            xi = sgn * (PAD_CENTER_X - PAD_SIZE[0] / 2)
            mounts.append(np.where(np.abs(mesh.points[:, 0] - xo) < 1e-9)[0])
            inner = np.where(np.abs(mesh.points[:, 0] - xi) < 1e-9)[0]
            p = mesh.points[inner]
            order = np.lexsort((p[:, 1], p[:, 2]))
            _, ny, nz = c.pad_resolution
            inner_grids.append(inner[order].reshape(nz + 1, ny + 1))
        union, offsets = union_meshes(meshes)
        att = np.concatenate(
            [m + offsets[i] for i, m in enumerate(mounts)]
        ).astype(np.int32)
        self._mount_rest = jnp.asarray(union.points[att], jnp.float32)
        self._mount_sgn = jnp.sign(self._mount_rest[:, 0])
        self._inner_grids = jnp.asarray(
            np.stack([g + offsets[i] for i, g in enumerate(inner_grids)])
        )
        self._pad_sgn = jnp.asarray([-1.0, 1.0])
        self._rest_points = jnp.asarray(union.points, jnp.float32)

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
            )
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

        # ---- peg: free affine box. The body frame is centered at ITS OWN
        # origin (rotation DOFs then act about the peg center, like the
        # grasp-lift cube); the world placement under the gripper comes
        # from the affine translation set at reset.
        pts, tris = _cube_surface(1.0)
        pts = pts * np.asarray(PEG_HALF)  # anisotropic scale of the unit box
        abd_cfg = AbdSolverCfg(
            dt=c.sim_dt,
            d_hat=c.d_hat,
            kappa_contact=c.kappa,
            friction_mu=c.friction_mu,
            contact_k=0,
            ee_contact_k=0,
            linear_solver="cg",
            newton_max_iter=c.newton_iters,
        )
        self.peg = AbdModel(
            [pts], [tris], mass_density=c.peg_density, kappa_ortho=1e7, cfg=abd_cfg
        )
        self.world = CoupledModel(self.gel, self.peg, cross_k=c.coupling_k)

        # ---- socket: 4 walls around a square through-pocket; the ground
        # plane closes the bottom. Walls overlap at the corners so the
        # outside is solid.
        hw, so, hz = c.hole_half_width, c.socket_half_xy, c.socket_height / 2
        tx = (so - hw) / 2  # x-wall half thickness
        wall_rows = [
            # (center xyz, half-extents) — identity orientation
            ((+(hw + tx), 0.0, hz), (tx, so, hz)),
            ((-(hw + tx), 0.0, hz), (tx, so, hz)),
            ((0.0, +(hw + tx), hz), (hw, tx, hz)),
            ((0.0, -(hw + tx), hz), (hw, tx, hz)),
        ]
        boxes = np.zeros((len(wall_rows), 10), np.float32)
        for i, (ctr, half) in enumerate(wall_rows):
            boxes[i, :3] = ctr
            boxes[i, 3:7] = (1.0, 0.0, 0.0, 0.0)
            boxes[i, 7:10] = half
        sc = RigidSdfScene.empty(c.num_envs, b=len(wall_rows))
        self.scene = RigidSdfScene(
            sc.spheres,
            jnp.broadcast_to(jnp.asarray(boxes), (c.num_envs, len(wall_rows), 10)),
            sc.capsules,
            sc.planes.at[:, 0].set(jnp.array([0.0, 0.0, 1.0, 0.0])),  # ground z=0
        )
        # insertion target: pocket bottom center, and the socket-top plane
        self._hole_top_z = c.socket_height
        self._tip_target = jnp.array([0.0, 0.0, c.socket_height - c.success_depth])

    # ------------------------------------------------------------------ state
    def init_state(self, key: jax.Array) -> FactoryUipcState:
        n = self.cfg.num_envs
        return FactoryUipcState(
            gel=SoftBodyState.init(n, np.asarray(self._rest_points)),
            peg=AbdState.identity(n, 1),
            mount=jnp.zeros((n, 3)),
            squeeze=jnp.zeros((n,)),
            actions=jnp.zeros((n, 4)),
            prev_actions=jnp.zeros((n, 4)),
            episode_length=jnp.zeros((n,), jnp.int32),
            ep_succeeded=jnp.zeros((n,), bool),
            key=key,
        )

    def reset_all(self, state: FactoryUipcState):
        state = self._reset_where(state, jnp.ones((self.cfg.num_envs,), bool))
        if self.cfg.stagger_initial_episodes:
            key, k_st = jax.random.split(state.key)
            ep0 = jax.random.randint(
                k_st, (self.cfg.num_envs,), 0, self.cfg.max_episode_length, jnp.int32
            )
            state = dataclasses.replace(state, episode_length=ep0, key=key)
        obs, state = self._observations(state)
        return state, obs

    def _reset_where(self, state: FactoryUipcState, mask: jax.Array):
        n = self.cfg.num_envs
        key, k1 = jax.random.split(state.key)
        # gripper (and peg) start offset the policy must undo to center
        # over the pocket — the per-env randomization axis (the socket
        # itself is shared geometry, so the OFFSET carries the noise)
        xy = jax.random.uniform(
            k1, (n, 2), minval=-self.cfg.reset_xy_noise, maxval=self.cfg.reset_xy_noise
        )
        mount0 = jnp.concatenate([xy, jnp.zeros((n, 1))], axis=-1)
        mount = jnp.where(mask[:, None], mount0, state.mount)
        q0 = AbdState.identity(n, 1).q.at[:, 0, :3].add(
            mount0 + jnp.array([0.0, 0.0, self._z0])
        )
        peg = AbdState(
            q=jnp.where(mask[:, None, None], q0, state.peg.q),
            qd=jnp.where(mask[:, None, None], 0.0, state.peg.qd),
        )
        gel0 = self._rest_points[None] + mount0[:, None, :]
        gel = SoftBodyState(
            x=jnp.where(mask[:, None, None], gel0, state.gel.x),
            v=jnp.where(mask[:, None, None], 0.0, state.gel.v),
        )
        m1 = mask[:, None]
        return FactoryUipcState(
            gel=gel,
            peg=peg,
            mount=mount,
            squeeze=jnp.where(mask, 0.0, state.squeeze),
            actions=jnp.where(m1, 0.0, state.actions),
            prev_actions=jnp.where(m1, 0.0, state.prev_actions),
            episode_length=jnp.where(mask, 0, state.episode_length),
            ep_succeeded=jnp.where(mask, False, state.ep_succeeded),
            key=key,
        )

    # ------------------------------------------------------------------- step
    def _aim_positions(self, mount: jax.Array, squeeze: jax.Array) -> jax.Array:
        """Mount aim rows (N, Va, 3): rest + gripper translation, pads moved
        inward by squeeze (same rig as GraspLiftEnv._aim_positions)."""
        inward = -self._mount_sgn[None, :, None] * squeeze[:, None, None]
        off = mount[:, None, :] + inward * jnp.array([1.0, 0.0, 0.0])
        return self._mount_rest[None] + off

    def _pad_compression(self, gel_x: jax.Array, state_mount, squeeze) -> jax.Array:
        """(N, 2, gh, gw) inner-face compression in mm (see
        GraspLiftEnv._pad_compression; here the rigid motion to subtract is
        mount translation + squeeze)."""
        if self._embeds is not None:
            eh, ew = self._embeds[0].shape
            x = jnp.stack([e.positions(gel_x)[..., 0] for e in self._embeds], axis=1)
            x = x.reshape(gel_x.shape[0], 2, eh, ew)
            rest = self._embed_rest_x.reshape(2, eh, ew)
        else:
            grids = self._inner_grids
            x = gel_x[:, grids.reshape(-1), 0]
            x = x.reshape(gel_x.shape[0], *grids.shape)
            rest = self._rest_points[grids.reshape(-1), 0].reshape(grids.shape)
        sgn = self._pad_sgn[None, :, None, None]
        expected = (
            rest[None]
            + state_mount[:, 0, None, None, None]
            - sgn * squeeze[:, None, None, None]
        )
        return (expected - x) * (-sgn) * 1e3

    def step(self, state: FactoryUipcState, action: jax.Array):
        c = self.cfg
        action = jnp.clip(jnp.nan_to_num(action), -1.0, 1.0)
        prev_actions = state.actions
        dt = c.sim_dt

        def decim_body(_, carry):
            gel, peg, mount, squeeze = carry
            move = action[:, :3] * c.move_rate * dt
            mount = mount + move
            mount = jnp.stack(
                [
                    jnp.clip(mount[:, 0], -c.max_xy, c.max_xy),
                    jnp.clip(mount[:, 1], -c.max_xy, c.max_xy),
                    jnp.clip(mount[:, 2], c.z_range[0], c.z_range[1]),
                ],
                axis=-1,
            )
            squeeze = jnp.clip(
                squeeze + action[:, 3] * c.squeeze_rate * dt, 0.0, c.max_squeeze
            )
            aim = self._aim_positions(mount, squeeze)
            gel, peg = self.world.step(gel, peg, self.scene, aim_pos=aim)
            return gel, peg, mount, squeeze

        gel, peg, mount, squeeze = jax.lax.fori_loop(
            0, c.decimation, decim_body,
            (state.gel, state.peg, state.mount, state.squeeze),
        )

        peg_pos = peg.q[:, 0, :3]  # world center (origin-centered body frame)
        peg_tip = peg_pos - jnp.array([0.0, 0.0, PEG_HALF[2]])
        comp = self._pad_compression(gel.x, mount, squeeze)
        grip = comp.mean(axis=(2, 3))  # (N, 2)

        state = FactoryUipcState(
            gel=gel, peg=peg, mount=mount, squeeze=squeeze,
            actions=action, prev_actions=prev_actions,
            episode_length=state.episode_length + 1,
            ep_succeeded=state.ep_succeeded,
            key=state.key,
        )

        # ---- rewards: Factory keypoint squash pair on tip-to-target
        # distance (reference factory_env.py squash(x,a,b) = 1/(e^(ax)+b+e^(-ax)))
        d = jnp.linalg.norm(peg_tip - self._tip_target[None], axis=-1)

        def squash(x, a, b):
            return 1.0 / (jnp.exp(a * x) + b + jnp.exp(-a * x))

        r_kp = c.kp_scale[0] * squash(d, c.kp_coef[0], 2.0) + c.kp_scale[1] * squash(
            d, c.kp_coef[1], 2.0
        )
        engaged = (peg_tip[:, 2] < self._hole_top_z) & (
            jnp.linalg.norm(peg_tip[:, :2], axis=-1) < c.hole_half_width
        )
        r_engage = c.w_engage * engaged.astype(jnp.float32)
        success = (
            (peg_tip[:, 2] < self._hole_top_z - c.success_depth)
            & (jnp.linalg.norm(peg_tip[:, :2], axis=-1) < c.success_xy_tol)
        )
        r_success = c.w_success * success.astype(jnp.float32)
        # lost the peg: it strayed from under the gripper
        mount_center = mount + jnp.array([0.0, 0.0, self._z0])
        dropped = (
            jnp.linalg.norm(peg_pos - mount_center, axis=-1) > c.drop_dist
        )
        r_drop = -c.w_drop * dropped.astype(jnp.float32)
        act_rate = -c.w_action_rate * jnp.sum(
            jnp.square(action - prev_actions), axis=-1
        )
        reward = r_kp + r_engage + r_success + r_drop + act_rate

        state = dataclasses.replace(state, ep_succeeded=state.ep_succeeded | success)
        terminated = dropped
        truncated = state.episode_length >= c.max_episode_length
        done = terminated | truncated

        info = {
            "log": {
                "kp_reward": r_kp.mean(),
                "engage_reward": r_engage.mean(),
                "success_reward": r_success.mean(),
                "drop_penalty": r_drop.mean(),
                "Metric/peg_tip_z_mm": (peg_tip[:, 2] * 1e3).mean(),
                "Metric/engaged_rate": engaged.astype(jnp.float32).mean(),
                "Metric/success_rate": success.astype(jnp.float32).mean(),
                "Metric/grip_mm": grip.min(axis=-1).mean(),
                **(
                    {
                        "Metric/missed_barriers": jax.vmap(
                            lambda x, q: self.world.missed_barriers(x, q)
                        )(gel.x, peg.q).sum().astype(jnp.float32)
                    }
                    if c.log_broad_phase_overflow
                    else {}
                ),
            },
            "peg_tip": peg_tip,
            "grip": grip,
        }

        state = self._reset_where(state, done)
        obs, state = self._observations(state)
        return state, obs, reward, terminated, truncated, info

    # ------------------------------------------------------------------- obs
    def _observations(self, state: FactoryUipcState):
        comp = self._pad_compression(state.gel.x, state.mount, state.squeeze)
        grip = comp.mean(axis=(2, 3))
        peg_tip = state.peg.q[:, 0, :3] - jnp.array([0.0, 0.0, PEG_HALF[2]])
        proprio = jnp.concatenate(
            [
                (peg_tip - self._tip_target[None]) * 1e2,
                state.peg.qd[:, 0, :3],
                state.mount * 1e2,
                state.squeeze[:, None] * 1e3,
                grip,
                state.actions,
            ],
            axis=-1,
        )  # 16-dim
        if self.cfg.obs_mode == "privileged":
            return {"proprio_obs": proprio}, state
        # depth: per-pad compression images as channels, like grasp-lift
        vision = jnp.moveaxis(comp, 1, -1)
        return {"proprio_obs": proprio, "vision_obs": vision}, state
