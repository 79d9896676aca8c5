"""Grasp-Lift full GelSight stack: the coupled world feeds the real sensor.

Round-3 verdict item: the flagship manipulation env emitted a raw
compression image and bypassed the framework's own Taxim optical + FOTS
marker pipeline. Now ``obs_mode="tactile"`` renders each pad's embedded
dense inner-face surface into a per-pad camera depth map and feeds the
shared ``GelSightSensor`` facade — these tests pin the output contract
(reference source/tacex/tacex/gelsight_sensor.py:265-319 shapes) and prove
the env path IS the facade path (bit-exact consistency), plus physical
sanity: contact shades the image, shear moves the markers.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu import envs


@pytest.fixture(scope="module")
def rollout():
    env = envs.make(
        "TacEx-Grasp-Lift-Uipc-Tactile-v0", num_envs=2, squeeze_rate=4e-3,
        stagger_initial_episodes=False,
    )
    st = env.init_state(jax.random.PRNGKey(0))
    st, obs0 = env.reset_all(st)
    step = jax.jit(env.step)
    a = jnp.tile(jnp.array([[1.0, 0.0]]), (2, 1))  # squeeze only
    states = [st]
    info_early = None
    for i in range(20):
        st, obs, rew, term, trunc, info = step(st, a)
        states.append(st)
        if i == 4:
            info_early = info
    assert not bool(np.asarray(term).any()), "squeeze-only must not terminate"
    # then a few lift steps (shear on the gel -> marker motion)
    info_squeezed = info
    a2 = jnp.tile(jnp.array([[0.3, 1.0]]), (2, 1))
    for _ in range(6):
        st, obs, rew, term, trunc, info = step(st, a2)
        states.append(st)
    return env, states, obs, info, info_early, info_squeezed


class TestGraspLiftTactile:
    def test_sensor_output_contract(self, rollout):
        """Shapes/dtypes follow the reference sensor contract per finger:
        tactile_rgb (N, 2, H, W, 3) float in [0, 1], marker_motion
        (N, 2, 2, M, 2) initial/current marker pixel coords."""
        env, states, obs, info, info_early, info_squeezed = rollout
        n = env.cfg.num_envs
        res_w, res_h = env.cfg.camera_resolution
        rgb = np.asarray(info["tactile_rgb"])
        assert rgb.shape == (n, 2, res_h, res_w, 3)
        assert np.isfinite(rgb).all() and rgb.min() >= 0.0 and rgb.max() <= 1.0
        m = env.sensor.marker_cfg.num_markers_row * env.sensor.marker_cfg.num_markers_col
        mm = np.asarray(info["marker_motion"])
        assert mm.shape == (n, 2, 2, m, 2)
        assert np.isfinite(mm).all()
        vh, vw, _ = env.cfg.vision_obs_shape
        assert obs["vision_obs"].shape == (n, vh, vw, 6)

    def test_env_path_is_facade_path(self, rollout):
        """Consistency: recomputing the per-pad depth from the post-step
        FEM state and calling GelSightSensor.update directly (with the
        pre-update trajectory state) reproduces the env's emitted
        tactile_rgb and marker_motion to float-fusion tolerance (the env
        path and the standalone facade are separately compiled programs,
        so XLA fusion reorders a few float ops — ~1e-5 px)."""
        env, states, obs, info, info_early, info_squeezed = rollout
        st_prev, st_next = states[-2], states[-1]
        comp = env._pad_compression(st_next.gel.x, st_next.squeeze)
        depth = env._pad_sensor_depth(comp)
        pos_mm, yaw = env._cube_pose_in_pads(st_next)
        sensor_state, out = jax.jit(env.sensor.update)(
            st_prev.sensor, depth, obj_yaw=yaw, obj_pos_mm=pos_mm
        )
        n = env.cfg.num_envs
        rgb_env = np.asarray(info["tactile_rgb"])
        rgb_fac = np.stack(
            [np.asarray(out["tactile_rgb"][:n]), np.asarray(out["tactile_rgb"][n:])], 1
        )
        np.testing.assert_allclose(rgb_env, rgb_fac, atol=1e-5)
        mm_env = np.asarray(info["marker_motion"])
        mm_fac = np.stack(
            [np.asarray(out["marker_motion"][:n]), np.asarray(out["marker_motion"][n:])], 1
        )
        np.testing.assert_allclose(mm_env, mm_fac, atol=1e-3)  # px
        # and the carried trajectory state matches what the env stored
        np.testing.assert_allclose(
            np.asarray(st_next.sensor.traj_curr),
            np.asarray(sensor_state.traj_curr),
            atol=1e-5,
        )

    def test_contact_shades_the_image(self, rollout):
        """Taxim shading responds to the CONTACT deformation: the
        full-squeeze image differs from a zero-action control rollout at
        the same step count (same gravity sag, no cube contact) by a real
        margin on both pads. The control isolates contact from the ~0.008
        shading floor the gel's own gravity sag contributes."""
        env, states, obs, info, info_early, info_squeezed = rollout
        st = env.init_state(jax.random.PRNGKey(0))
        st, _ = env.reset_all(st)
        step = jax.jit(env.step)
        zero = jnp.zeros((env.cfg.num_envs, 2))
        for _ in range(20):
            st, _, _, _, _, info0 = step(st, zero)
        ctrl = np.asarray(info0["tactile_rgb"])
        full = np.asarray(info_squeezed["tactile_rgb"])
        for pad in range(2):
            d = np.abs(full[0, pad] - ctrl[0, pad]).mean()
            assert d > 0.006, d

    def test_shear_moves_markers(self, rollout):
        """Lifting while gripping shears the gel along the image rows
        (z-axis): markers under the contact move from their rest grid."""
        env, states, obs, info, info_early, info_squeezed = rollout
        mm = np.asarray(info["marker_motion"])  # (n, 2, 2, M, 2)
        disp = np.linalg.norm(mm[:, :, 1] - mm[:, :, 0], axis=-1)  # (n, 2, M)
        assert disp.max() > 0.5, disp.max()  # at least half a pixel somewhere

    def test_indentation_depth_equals_compression(self, rollout):
        """The synthesized camera geometry preserves Taxim's indentation
        semantics: indentation_depth == max compression (mm) per pad."""
        env, states, obs, info, info_early, info_squeezed = rollout
        st = states[-1]
        comp = env._pad_compression(st.gel.x, st.squeeze)
        depth = env._pad_sensor_depth(comp)
        _, out = env.sensor.update(st.sensor, depth)
        indent = np.asarray(out["indentation_depth"])  # (2n,)
        n = env.cfg.num_envs
        res_w, res_h = env.cfg.camera_resolution
        comp_img = np.asarray(
            jax.image.resize(
                jnp.concatenate([comp[:, 0], comp[:, 1]], 0), (2 * n, res_h, res_w), "linear"
            )
        )
        np.testing.assert_allclose(indent, comp_img.max(axis=(1, 2)), atol=1e-3)
