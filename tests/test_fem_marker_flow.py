"""Tests for the FEM-surface marker flow (ManiSkill-ViTac protocol)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu.physics.soft import box_tet_mesh
from tacex_tpu.sensors.gelsight.fem import FemMarkerFlow, ManiSkillSimulatorCfg, surface_to_camera_frame


@pytest.fixture(scope="module")
def setup():
    # gel pad as seen from the camera: contact face at z ~ 0.0285
    mesh = box_tet_mesh(size=(0.0189, 0.0142, 0.0045), resolution=(8, 6, 2), center=(0, 0, 0.02625))
    rest_cam = mesh.points[mesh.surface_verts]
    # surface tris reindexed into the surface-vertex array
    remap = -np.ones(mesh.num_vertices, np.int64)
    remap[mesh.surface_verts] = np.arange(len(mesh.surface_verts))
    tris = remap[mesh.surface_tris]
    cfg = ManiSkillSimulatorCfg()
    mf = FemMarkerFlow(cfg, rest_cam.astype(np.float32), tris.astype(np.int32), seed=0)
    return mesh, rest_cam, tris, mf


class TestBinding:
    def test_markers_bound(self, setup):
        _, _, _, mf = setup
        assert mf.num_bound > 20
        w = np.asarray(mf.weights)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
        assert (w > -1e-6).all()

    def test_init_points_on_surface(self, setup):
        mesh, rest_cam, _, mf = setup
        pts = np.asarray(mf.init_pts)
        np.testing.assert_allclose(pts[:, 2], rest_cam[:, 2].max(), atol=1e-6)


class TestFlow:
    def test_rest_flow_zero_motion(self, setup):
        _, rest_cam, _, mf = setup
        n = 3
        surf = jnp.broadcast_to(jnp.asarray(rest_cam), (n,) + rest_cam.shape)
        flow = mf.flow(surf, jax.random.PRNGKey(0))
        assert flow.shape == (n, 2, 128, 2)
        f = np.asarray(flow)
        np.testing.assert_allclose(f[:, 0], f[:, 1], atol=1e-4)

    def test_shifted_surface_shifts_uv(self, setup):
        _, rest_cam, _, mf = setup
        surf = jnp.asarray(rest_cam)[None] + jnp.array([0.001, 0.0, 0.0])  # 1 mm in x
        flow = np.asarray(mf.flow(surf, jax.random.PRNGKey(0)))
        # fx x/z: du = fx * dx / z = 340 * 0.001 / 0.0285 ~ 11.9 px
        du = flow[0, 1, :, 0] - flow[0, 0, :, 0]
        assert abs(du.mean() - 340 * 0.001 / 0.0285) < 1.5

    def test_noise_and_dropout(self, setup):
        mesh, rest_cam, tris, _ = setup
        cfg = ManiSkillSimulatorCfg(marker_random_noise=0.5, marker_lose_tracking_probability=0.2)
        mf = FemMarkerFlow(cfg, rest_cam.astype(np.float32), tris.astype(np.int32))
        surf = jnp.asarray(rest_cam)[None]
        f1 = np.asarray(mf.flow(surf, jax.random.PRNGKey(1)))
        f2 = np.asarray(mf.flow(surf, jax.random.PRNGKey(2)))
        assert np.abs(f1 - f2).max() > 0.1  # stochastic
        assert np.isfinite(f1).all()

    def test_normalize(self, setup):
        mesh, rest_cam, tris, _ = setup
        cfg = ManiSkillSimulatorCfg(normalize=True)
        mf = FemMarkerFlow(cfg, rest_cam.astype(np.float32), tris.astype(np.int32))
        f = np.asarray(mf.flow(jnp.asarray(rest_cam)[None], jax.random.PRNGKey(0)))
        assert np.abs(f).max() <= 1.5

    def test_world_to_camera(self, setup):
        mesh, rest_cam, _, mf = setup
        from tacex_tpu.core import maths

        cam_pos = jnp.array([[0.1, 0.2, 0.3]])
        cam_quat = maths.quat_from_angle_axis(jnp.asarray(0.4), jnp.array([0.0, 0.0, 1.0]))[None]
        world = maths.quat_apply(cam_quat[:, None], jnp.asarray(rest_cam)[None]) + cam_pos[:, None]
        back = surface_to_camera_frame(world, cam_pos, cam_quat)
        np.testing.assert_allclose(np.asarray(back[0]), rest_cam, atol=1e-5)

    def test_jit(self, setup):
        _, rest_cam, _, mf = setup
        f = jax.jit(mf.flow)
        out = f(jnp.asarray(rest_cam)[None], jax.random.PRNGKey(0))
        assert bool(jnp.isfinite(out).all())
