"""Parity and property tests for the FOTS marker-motion simulation.

Oracle: the reference's unvectorized numpy MarkerMotion
(reference source/tacex/.../fots/sim/marker_motion.py) executed directly.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from tacex_tpu.sensors.gelsight.fots import marker_motion as fots

REF_FOTS = Path("/root/reference/source/tacex/tacex/simulation_approaches/fots/sim/marker_motion.py")


@pytest.fixture(scope="module")
def ref_marker_motion_cls():
    if not REF_FOTS.exists():
        pytest.skip("reference not available")
    spec = importlib.util.spec_from_file_location("ref_fots_marker_motion", REF_FOTS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_fots_marker_motion"] = mod
    spec.loader.exec_module(mod)
    return mod.MarkerMotion


H, W = 240, 320


def _cfg():
    return fots.FOTSMarkerCfg(
        num_markers_row=9,
        num_markers_col=11,
        x0=15,
        y0=26,
        tactile_img_width=W,
        tactile_img_height=H,
    )


def _make_ref(cls, cfg):
    return cls(
        frame0_blur=np.zeros((H, W, 3), np.float32),
        lamb=cfg.lamb,
        mm2pix=cfg.mm_to_pixel,
        num_markers_col=cfg.num_markers_col,
        num_markers_row=cfg.num_markers_row,
        tactile_img_width=W,
        tactile_img_height=H,
        x0=cfg.x0,
        y0=cfg.y0,
    )


def _press_scene(cx=160.0, cy=120.0, r_px=40.0, depth_mm=1.0):
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij")
    d2 = (yy - cy) ** 2 + (xx - cx) ** 2
    contact = d2 < r_px**2
    depth = np.where(contact, depth_mm * (1.0 - d2 / r_px**2), 0.0).astype(np.float32)
    return depth, contact


class TestParityVsReference:
    def _run_both(self, ref_cls, traj):
        cfg = _cfg()
        ref = _make_ref(ref_cls, cfg)
        depth, contact = _press_scene()

        rx, ry = ref.marker_sim(depth.copy(), contact.astype(np.float32), traj)
        ref_markers = np.stack([rx.reshape(-1), ry.reshape(-1)], axis=-1)

        init_m = fots.init_marker_grid(cfg)
        t0 = np.asarray(traj[0] if traj else [0, 0, 0], np.float32)
        t1 = np.asarray(traj[-1] if traj else [0, 0, 0], np.float32)
        ours = fots.marker_motion(
            cfg,
            jnp.asarray(depth[None]),
            jnp.asarray(contact[None]),
            jnp.asarray(t0[None]),
            jnp.asarray(t1[None]),
            jnp.asarray([len(traj) >= 2]),
            init_m,
        )
        return np.asarray(ours[0]), ref_markers, np.asarray(init_m)

    def test_init_grid_matches(self, ref_marker_motion_cls):
        cfg = _cfg()
        ref = _make_ref(ref_marker_motion_cls, cfg)
        init = np.asarray(fots.init_marker_grid(cfg))
        ref_init = np.stack(
            [ref.init_marker_x_pos.reshape(-1), ref.init_marker_y_pos.reshape(-1)], axis=-1
        )
        np.testing.assert_allclose(init, ref_init, atol=0)

    def test_normal_press_only(self, ref_marker_motion_cls):
        ours, theirs, _ = self._run_both(ref_marker_motion_cls, traj=[[0.0, 0.0, 0.0]])
        np.testing.assert_allclose(ours, theirs, atol=1e-3)

    def test_press_and_shear(self, ref_marker_motion_cls):
        traj = [[0.0, 0.0, 0.0], [0.35, -0.2, 0.0], [0.8, -0.55, 0.0]]
        ours, theirs, _ = self._run_both(ref_marker_motion_cls, traj)
        np.testing.assert_allclose(ours, theirs, atol=1e-2)

    def test_press_shear_twist(self, ref_marker_motion_cls):
        traj = [[0.1, 0.05, 0.0], [0.4, -0.3, 0.3]]
        ours, theirs, _ = self._run_both(ref_marker_motion_cls, traj)
        np.testing.assert_allclose(ours, theirs, atol=1e-2)

    def test_no_contact_returns_init(self, ref_marker_motion_cls):
        cfg = _cfg()
        init_m = fots.init_marker_grid(cfg)
        depth = np.zeros((H, W), np.float32)
        contact = np.zeros((H, W), bool)
        ours = fots.marker_motion(
            cfg,
            jnp.asarray(depth[None]),
            jnp.asarray(contact[None]),
            jnp.zeros((1, 3)),
            jnp.zeros((1, 3)),
            jnp.asarray([False]),
            init_m,
        )
        np.testing.assert_allclose(np.asarray(ours[0]), np.asarray(init_m), atol=0)


class TestProperties:
    def test_batched_envs_independent(self):
        cfg = _cfg()
        init_m = fots.init_marker_grid(cfg)
        d1, c1 = _press_scene(cx=140.0)
        d2, c2 = _press_scene(cx=200.0, depth_mm=0.5)
        depth = jnp.asarray(np.stack([d1, d2]))
        contact = jnp.asarray(np.stack([c1, c2]))
        ts = jnp.zeros((2, 3))
        out = fots.marker_motion(cfg, depth, contact, ts, ts, jnp.asarray([False, False]), init_m)
        single0 = fots.marker_motion(
            cfg, depth[:1], contact[:1], ts[:1], ts[:1], jnp.asarray([False]), init_m
        )
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single0[0]), atol=1e-6)
        assert np.abs(np.asarray(out[0]) - np.asarray(out[1])).max() > 0.01  # different scenes differ

    def test_marker_flow_shape(self):
        cfg = _cfg()
        init_m = fots.init_marker_grid(cfg)
        markers = jnp.broadcast_to(init_m, (4,) + init_m.shape)
        flow = fots.marker_flow(init_m, markers)
        assert flow.shape == (4, 2, cfg.num_markers, 2)

    def test_draw_marker_image(self):
        cfg = _cfg()
        init_m = fots.init_marker_grid(cfg)
        img = fots.draw_marker_image(cfg, jnp.broadcast_to(init_m, (2,) + init_m.shape))
        assert img.shape == (2, H, W)
        a = np.asarray(img)
        assert a.min() >= 0.0 and a.max() <= 1.0
        # dots are dark
        m0 = np.asarray(init_m).astype(int)
        assert a[0, m0[0, 1], m0[0, 0]] < 0.1
