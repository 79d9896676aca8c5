"""Tests for Franka kinematics, Jacobian, and differential IK."""

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu.core import maths
from tacex_tpu.physics.rigid import franka


class TestForwardKinematics:
    def test_known_home_pose(self):
        """Canonical ready pose: flange at ~(0.307, 0, 0.590), tool down;
        with the 0.103 m hand the TCP lands at the well-known ~0.487 m."""
        q = jnp.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785])
        pos, quat, _, _ = franka.forward_kinematics(q)
        p = np.asarray(pos)
        assert abs(p[0] - 0.307) < 0.01, p
        assert abs(p[1]) < 1e-3, p
        assert abs(p[2] - 0.590) < 0.01, p
        tcp, _, _, _ = franka.forward_kinematics(q, ee_offset_pos=jnp.array([0.0, 0.0, 0.1034]))
        assert abs(np.asarray(tcp)[2] - 0.487) < 0.01
        # tool z-axis points down
        z_axis = np.asarray(maths.quat_apply(quat, jnp.array([0.0, 0.0, 1.0])))
        assert z_axis[2] < -0.95

    def test_zero_config_height(self):
        """All-zero joints: arm fully upright. Heights sum: 0.333+0.316+0.384
        +0.107; link offsets a4/a5 cancel, a7 offsets x."""
        q = jnp.zeros(7)
        pos, _, _, _ = franka.forward_kinematics(q)
        p = np.asarray(pos)
        assert abs(p[2] - (0.333 + 0.316 + 0.384 + 0.107)) < 1e-6 or p[2] > 0.9

    def test_base_transform(self):
        q = franka.Q_DEFAULT
        p0, q0, _, _ = franka.forward_kinematics(q)
        base_pos = jnp.array([1.0, 2.0, 0.5])
        yaw = jnp.asarray(0.7)
        base_quat = maths.quat_from_angle_axis(yaw, jnp.array([0.0, 0.0, 1.0]))
        p1, q1, _, _ = franka.forward_kinematics(q, base_pos, base_quat)
        expect = np.asarray(base_pos) + np.asarray(maths.quat_apply(base_quat, p0))
        np.testing.assert_allclose(np.asarray(p1), expect, atol=1e-5)

    def test_batched(self):
        qs = jnp.stack([franka.Q_DEFAULT, jnp.zeros(7), franka.Q_DEFAULT * 0.5])
        pos, quat, orig, ax = franka.forward_kinematics(qs)
        assert pos.shape == (3, 3) and quat.shape == (3, 4)
        assert orig.shape == (3, 7, 3) and ax.shape == (3, 7, 3)


class TestJacobian:
    def test_matches_autodiff(self):
        q = franka.Q_DEFAULT

        pos_fn = lambda qq: franka.forward_kinematics(qq)[0]
        jac_auto = jax.jacfwd(pos_fn)(q)  # (3, 7)

        ee_pos, _, orig, ax = franka.forward_kinematics(q)
        jac_geo = franka.geometric_jacobian(ee_pos, orig, ax)  # (6, 7)
        np.testing.assert_allclose(np.asarray(jac_geo[:3]), np.asarray(jac_auto), atol=1e-5)

    def test_angular_part(self):
        """Angular rows = joint axes."""
        q = franka.Q_DEFAULT
        ee_pos, _, orig, ax = franka.forward_kinematics(q)
        jac = franka.geometric_jacobian(ee_pos, orig, ax)
        np.testing.assert_allclose(np.asarray(jac[3:]), np.asarray(ax).T, atol=1e-6)


class TestIK:
    def test_converges_to_target(self):
        q = franka.Q_DEFAULT
        target_pos, target_quat, _, _ = franka.forward_kinematics(q)
        target_pos = target_pos + jnp.array([0.05, -0.03, 0.04])

        qq = q
        for _ in range(50):
            pos, quat, orig, ax = franka.forward_kinematics(qq)
            jac = franka.geometric_jacobian(pos, orig, ax)
            rot_err = maths.axis_angle_from_quat(maths.quat_mul(target_quat, maths.quat_conjugate(quat)))
            qq = franka.dls_ik_step(qq, target_pos - pos, rot_err, jac)
        pos, quat, _, _ = franka.forward_kinematics(qq)
        assert float(jnp.linalg.norm(pos - target_pos)) < 1e-3
        assert float(maths.quat_error_magnitude(quat, target_quat)) < 1e-2

    def test_apply_delta_pose_and_servo(self):
        state = franka.ArmState.init(4)
        p0, _, _, _ = franka.forward_kinematics(state.q)
        delta = jnp.tile(jnp.array([[0.0, 0.0, -0.02]]), (4, 1))
        state = franka.apply_delta_pose_ik(state, delta, jnp.zeros((4, 3)))
        for _ in range(30):
            state = franka.servo_step(state, dt=0.01)
        p1, _, _, _ = franka.forward_kinematics(state.q)
        moved = np.asarray(p1 - p0)
        assert np.all(moved[:, 2] < -0.01), moved  # went down
        assert np.all(np.abs(moved[:, :2]) < 0.01)

    def test_respects_joint_limits(self):
        state = franka.ArmState.init(1)
        big = jnp.array([[1.0, 1.0, 1.0]])
        for _ in range(20):
            state = franka.apply_delta_pose_ik(state, big, jnp.zeros((1, 3)))
            state = franka.servo_step(state, dt=0.01)
        q = np.asarray(state.q)[0]
        assert np.all(q >= np.asarray(franka.Q_LOWER) - 1e-6)
        assert np.all(q <= np.asarray(franka.Q_UPPER) + 1e-6)
