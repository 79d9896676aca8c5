"""Tests for the UIPC-compatible API layer (UipcSim/UipcObject/Attachments)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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


def _build(num_envs=2):
    sim = UipcSim(UipcSimCfg(num_envs=num_envs, newton=UipcSimCfg.Newton(max_iter=4)))
    obj = UipcObject(
        UipcObjectCfg(
            mesh_cfg=TetMeshCfg(size=(0.02, 0.025, 0.0045), resolution=(4, 5, 2), center=(0, 0, -0.00225)),
            constitution=StableNeoHookeanCfg(youngs_modulus=0.145, poisson_rate=0.45),
        ),
        sim,
    )
    att = UipcIsaacAttachments(UipcIsaacAttachmentsCfg(attachment_points_radius=5e-4), obj)
    att.compute_attachment_data(np.zeros(3), np.array([1.0, 0, 0, 0]))
    return sim, obj, att


class TestUipcApi:
    def test_scene_lifecycle_and_step(self):
        sim, obj, att = _build()
        sim.setup_sim()
        n = sim.cfg.num_envs
        pose_p = jnp.zeros((n, 3))
        pose_q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
        obj._aim_provider = lambda: att.aim_positions(pose_p, pose_q)
        for _ in range(3):
            sim.step()
        assert bool(jnp.isfinite(obj.nodal_pos_w).all())
        assert obj.nodal_pos_w.shape[0] == n
        report = sim.get_sim_time_report(as_json=True)
        assert "step" in report and report["step"] > 0

    def test_attachment_selection(self):
        sim, obj, att = _build()
        # top face z=0 verts selected
        assert len(att.vertex_ids) == 5 * 6
        np.testing.assert_allclose(obj.mesh.points[att.vertex_ids][:, 2], 0.0, atol=1e-6)

    def test_save_replay_frame(self):
        sim, obj, att = _build(num_envs=1)
        sim.setup_sim()
        pose_p = jnp.zeros((1, 3))
        pose_q = jnp.array([[1.0, 0, 0, 0]])
        obj._aim_provider = lambda: att.aim_positions(pose_p, pose_q)
        sim.step()
        f = sim.save_frame()
        x_saved = np.asarray(obj.nodal_pos_w).copy()
        for _ in range(3):
            sim.step()
        sim.replay_frame(f)
        np.testing.assert_allclose(np.asarray(obj.nodal_pos_w), x_saved, atol=0)

    def test_reset_via_vertex_write(self):
        sim, obj, att = _build(num_envs=2)
        sim.setup_sim()
        pose_p = jnp.zeros((2, 3))
        pose_q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        obj._aim_provider = lambda: att.aim_positions(pose_p, pose_q)
        for _ in range(3):
            sim.step()
        obj.write_vertex_positions_to_sim(
            jnp.asarray(obj.init_vertex_pos), env_mask=jnp.array([True, False])
        )
        x = np.asarray(obj.nodal_pos_w)
        np.testing.assert_allclose(x[0], obj.init_vertex_pos, atol=0)
        assert np.abs(x[1] - obj.init_vertex_pos).max() > 0  # untouched env kept state

    def test_moving_attachment_drags_gel(self):
        sim, obj, att = _build(num_envs=1)
        sim.setup_sim()
        shift = jnp.array([[0.002, 0.0, 0.0]])
        pose_q = jnp.array([[1.0, 0, 0, 0]])
        obj._aim_provider = lambda: att.aim_positions(shift, pose_q)
        for _ in range(6):
            sim.step()
        x = np.asarray(obj.nodal_pos_w[0])
        top = att.vertex_ids
        moved = x[top, 0] - obj.mesh.points[top, 0]
        assert moved.mean() > 0.0015  # top face followed the +x aim


class TestSanityAndHealth:
    def test_sanity_check_flags_bad_dhat(self):
        sim = UipcSim(UipcSimCfg(num_envs=1, contact=UipcSimCfg.Contact(d_hat=0.5)))
        UipcObject(
            UipcObjectCfg(mesh_cfg=TetMeshCfg(size=(0.02, 0.02, 0.004), resolution=(2, 2, 1))),
            sim,
        )
        with pytest.raises(ValueError, match="d_hat"):
            sim.setup_sim()

    def test_health_check_passes_on_good_state(self):
        sim, obj, att = _build(num_envs=1)
        sim.setup_sim()
        pose_p = jnp.zeros((1, 3))
        pose_q = jnp.array([[1.0, 0, 0, 0]])
        obj._aim_provider = lambda: att.aim_positions(pose_p, pose_q)
        sim.step()
        sim.check_health()  # should not raise

    def test_health_check_catches_nan(self):
        sim, obj, att = _build(num_envs=2)
        sim.setup_sim()
        from tacex_tpu.physics.soft.ipc import SoftBodyState

        x = obj.state.x.at[1, 0, 0].set(jnp.nan)
        obj.state = SoftBodyState(x=x, v=obj.state.v)
        with pytest.raises(FloatingPointError, match=r"envs \[1\]"):
            sim.check_health()
