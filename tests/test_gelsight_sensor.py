"""Integration tests for the GelSightSensor facade (batched, jitted)."""

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu.sensors.gelsight.sensor import GelSightSensor
from tacex_tpu.sensors.gelsight.sensor_cfg import gelsight_mini_cfg

from _reference_oracle import sphere_height_map

N = 4
CAM_W, CAM_H = 64, 48


def _make_sensor(**kwargs):
    cfg = gelsight_mini_cfg(camera_resolution=(CAM_W, CAM_H), tactile_img_res=(64, 48), **kwargs)
    return GelSightSensor(cfg, num_envs=N)


def _depth_frames(press_mm=(1.0, 0.5, 0.0, 2.0)):
    """Camera depth in meters: sphere pressed into gel at various depths."""
    frames = []
    for p in press_mm:
        hm = sphere_height_map(CAM_H, CAM_W, radius_mm=4.0, pixmm=0.1)
        # gel top plane sits at cam_min_dist + gelpad_height = 0.0285 m from
        # the camera; pressing by p mm moves the object p mm closer.
        depth_m = 0.0285 + (hm - hm.min()) / 1000.0 - p / 1000.0
        frames.append(depth_m)
    return jnp.asarray(np.stack(frames), jnp.float32)


class TestSensorUpdate:
    def test_outputs_contract(self):
        sensor = _make_sensor()
        state = sensor.init_state()
        depth = _depth_frames()
        state, out = jax.jit(sensor.update)(state, depth)
        assert out["height_map"].shape == (N, CAM_H, CAM_W)
        assert out["camera_depth"].shape == (N, CAM_H, CAM_W, 1)
        assert out["tactile_rgb"].shape == (N, 48, 64, 3)
        m = sensor.marker_cfg.num_markers
        assert out["marker_motion"].shape == (N, 2, m, 2)
        for v in out.values():
            assert bool(jnp.isfinite(v).all())

    def test_indentation_depth(self):
        sensor = _make_sensor()
        state = sensor.init_state()
        depth = _depth_frames(press_mm=(1.0, 0.5, 0.0, 2.0))
        _, out = sensor.update(state, depth)
        ind = np.asarray(out["indentation_depth"])
        # indentation = gelpad_height - (min_cam_dist - cam_min_dist), clamped
        # to [0, gelpad_height] (reference taxim_sim.py:115-131)
        np.testing.assert_allclose(ind, [1.0, 0.5, 0.0, 2.0], atol=1e-3)

    def test_contact_markers_move(self):
        sensor = _make_sensor()
        state = sensor.init_state()
        depth = _depth_frames(press_mm=(2.0, 2.0, 2.0, 2.0))
        state, out = sensor.update(state, depth)
        init = np.asarray(out["marker_motion"][:, 0])
        curr = np.asarray(out["marker_motion"][:, 1])
        assert np.abs(curr - init).max() > 0.05  # markers displaced under press

    def test_traj_accumulates_and_resets(self):
        sensor = _make_sensor()
        state = sensor.init_state()
        pressed = _depth_frames(press_mm=(2.0,) * N)
        free = _depth_frames(press_mm=(-3.0,) * N)  # no contact
        state, _ = sensor.update(state, pressed)
        assert np.all(np.asarray(state.traj_count) == 1)
        state, _ = sensor.update(state, pressed)
        assert np.all(np.asarray(state.traj_count) == 2)
        state, _ = sensor.update(state, free)
        assert np.all(np.asarray(state.traj_count) == 0)
        state, _ = sensor.update(state, pressed)
        state = sensor.reset(state, jnp.asarray([True, False, True, False]))
        cnt = np.asarray(state.traj_count)
        assert cnt[0] == 0 and cnt[1] == 1 and cnt[2] == 0 and cnt[3] == 1

    def test_marker_resolution_decoupled_from_optical(self):
        """FOTS coordinates stay at their 320x240 calibration resolution even
        when the optical path runs at low res (the task envs use 32x24) —
        regression test for marker-grid collapse."""
        sensor = _make_sensor()
        mcfg = sensor.marker_cfg
        assert (mcfg.tactile_img_width, mcfg.tactile_img_height) == (320, 240)
        init = np.asarray(sensor.init_markers)
        assert init[:, 0].max() > 250 and init[:, 1].max() > 180
        state = sensor.init_state()
        _, out = sensor.update(state, _depth_frames((2.0,) * N))
        mm = np.asarray(out["marker_motion"])
        assert mm[:, 1, :, 0].max() > 250  # current markers still span 320-wide coords

    def test_no_marker_cfg(self):
        cfg = gelsight_mini_cfg(with_markers=False, camera_resolution=(CAM_W, CAM_H), tactile_img_res=(64, 48))
        sensor = GelSightSensor(cfg, num_envs=N)
        state = sensor.init_state()
        _, out = jax.jit(sensor.update)(state, _depth_frames())
        assert "marker_motion" not in out
        assert "tactile_rgb" in out

    def test_vmap_sharding_compatible(self):
        """update() composes with shard_map over the env axis."""
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        devs = jax.devices()
        if len(devs) < 2:
            return
        mesh = Mesh(np.array(devs[:2]), ("env",))
        sensor = _make_sensor()
        state = sensor.init_state()
        depth = _depth_frames(press_mm=(1.0, 1.5, 0.7, 2.0))

        fn = shard_map(
            lambda s, d: sensor.update(s, d),
            mesh=mesh,
            in_specs=(P("env"), P("env")),
            out_specs=(P("env"), P("env")),
        )
        state2, out = jax.jit(fn)(state, depth)
        _, ref_out = sensor.update(state, depth)
        # Conv reassociation differs between sharded/unsharded compilations;
        # isolated LUT-bin flips at bin boundaries are expected.
        err = np.abs(np.asarray(out["tactile_rgb"]) - np.asarray(ref_out["tactile_rgb"]))
        assert err.mean() < 1e-3 and err.max() < 0.05
        np.testing.assert_allclose(
            np.asarray(out["marker_motion"]), np.asarray(ref_out["marker_motion"]), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["indentation_depth"]), np.asarray(ref_out["indentation_depth"]), atol=1e-5
        )
