"""Kinematic-collider CCD envelope guard tests (docs/ccd_envelope.md).

The measured tunneling threshold for a collider vs a thin soft feature is
per-step displacement ~ (collider width + thickness + 2 d_hat); these tests
pin one config on each side of it, prove ccd_substeps rescues the outside
one, and exercise the UipcSim motion guard. Reference semantics being
replaced: libuipc's trajectory CCD (uipc_sim.py:63-66 ccd_tol).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu.physics.soft import (
    IpcSolverCfg,
    RigidSdfScene,
    SoftBodyModel,
    SoftBodyState,
    box_tet_mesh,
)
from tacex_tpu.physics.soft.ipc import scene_motion

THICK = 0.0045
R_SPH = 0.005
DT = 1.0 / 60.0


def _slab(substeps: int) -> SoftBodyModel:
    mesh = box_tet_mesh(size=(0.02, 0.025, THICK), resolution=(5, 6, 2), center=(0, 0, 0))
    p = mesh.points
    rim = np.where(
        (np.abs(p[:, 0]) > 0.01 - 1e-6) | (np.abs(p[:, 1]) > 0.0125 - 1e-6)
    )[0].astype(np.int32)
    cfg = IpcSolverCfg(
        dt=DT, newton_max_iter=6, cg_iters=16, d_hat=0.001,
        gravity=(0.0, 0.0, 0.0), ccd_substeps=substeps,
    )
    return SoftBodyModel(mesh, cfg=cfg, attachment_verts=rim)


def _sphere(z: float) -> RigidSdfScene:
    sc = RigidSdfScene.empty(1)
    return RigidSdfScene(
        spheres=jnp.asarray([[[0.0, 0.0, z, R_SPH]]], jnp.float32),
        boxes=sc.boxes, capsules=sc.capsules, planes=sc.planes,
    )


def _fly_through(vel: float, substeps: int) -> float:
    """Max slab deflection as a sphere passes straight through at vel m/s."""
    m = _slab(substeps)
    aim = jnp.asarray(m.mesh.points[np.asarray(m.attachment_verts)])[None]
    state = SoftBodyState.init(1, m.mesh.points)
    x0 = jnp.asarray(m.mesh.points)
    z0 = R_SPH + THICK / 2 + 0.004
    n_frames = int(np.ceil(2 * z0 / (vel * DT))) + 2
    step = jax.jit(lambda s, sc, scp: m.step(s, sc, aim, scene_prev=scp))
    max_defl, z_prev = 0.0, z0
    for i in range(1, n_frames + 1):
        z = z0 - vel * DT * i
        state = step(state, _sphere(z), _sphere(z_prev))
        z_prev = z
        max_defl = max(max_defl, float(jnp.abs(state.x[0] - x0).max()))
    return max_defl


class TestEnvelope:
    def test_inside_envelope_caught(self):
        # 0.8 m/s -> 13.3 mm/step, inside the 16.5 mm support window
        assert _fly_through(0.8, substeps=1) > 1e-3

    def test_outside_envelope_tunnels(self):
        # 1.6 m/s -> 26.7 mm/step: the slab never reacts (the documented
        # limitation — libuipc's trajectory CCD would catch this)
        assert _fly_through(1.6, substeps=1) < 2e-4

    def test_substeps_rescue(self):
        # same config, 4 substeps -> 6.7 mm per substep, back inside
        assert _fly_through(1.6, substeps=4) > 2e-4


class TestMotionGuard:
    def test_scene_motion_bound(self):
        a = _sphere(0.0)
        b = _sphere(0.02)
        m = np.asarray(scene_motion(a, b))
        np.testing.assert_allclose(m, [0.02], rtol=1e-5)
        # disabled primitives don't count
        np.testing.assert_allclose(np.asarray(scene_motion(a, a)), [0.0], atol=1e-9)

    def test_uipc_sim_guard_warns_and_raises(self):
        from tacex_tpu.uipc import (
            StableNeoHookeanCfg,
            UipcObject,
            UipcObjectCfg,
            UipcSim,
            UipcSimCfg,
        )
        from tacex_tpu.uipc.objects import TetMeshCfg

        cfg = UipcSimCfg(num_envs=1, dt=DT)
        cfg.newton.ccd_motion_limit = 0.005
        sim = UipcSim(cfg)
        UipcObject(
            UipcObjectCfg(
                mesh_cfg=TetMeshCfg(
                    size=(0.02, 0.025, THICK), resolution=(3, 3, 2), center=(0, 0, 0)
                ),
                constitution=StableNeoHookeanCfg(),
            ),
            sim,
        )
        sim.setup_sim()
        sim.step(_sphere(0.05))  # first frame: no prev, no warning
        with pytest.warns(UserWarning, match="CCD envelope exceeded"):
            sim.step(_sphere(0.02))  # 30 mm jump > 5 mm limit
        cfg.newton.strict_ccd = True
        with pytest.raises(RuntimeError, match="CCD envelope exceeded"):
            sim.step(_sphere(-0.02))
