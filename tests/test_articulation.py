"""Second-order arm+gripper dynamics tests (physics/rigid/articulation.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu.physics.rigid import articulation as art
from tacex_tpu.physics.rigid import franka


def _rand_q(key, n):
    lo, hi = np.asarray(art.Q_LOWER), np.asarray(art.Q_UPPER)
    u = jax.random.uniform(key, (n, art.NUM_DOF))
    return jnp.asarray(lo * 0.7) + u * jnp.asarray((hi - lo) * 0.3 + 0.2 * (hi - lo))


class TestMassMatrix:
    def test_symmetric_positive_definite(self):
        q = _rand_q(jax.random.PRNGKey(0), 8)
        M = np.asarray(art.mass_matrix(q))
        np.testing.assert_allclose(M, np.swapaxes(M, -1, -2), atol=1e-5)
        for m in M:
            eig = np.linalg.eigvalsh(m)
            assert eig.min() > 0, eig

    def test_shoulder_heavier_than_wrist(self):
        q = jnp.broadcast_to(
            jnp.concatenate([franka.Q_DEFAULT, jnp.array([0.02, 0.02])]), (1, 9)
        )
        M = np.asarray(art.mass_matrix(q))[0]
        assert M[0, 0] > M[6, 6]
        assert M[1, 1] > M[5, 5]


class TestGravity:
    def test_gravity_pulls_shoulder_down(self):
        """At a stretched-out pose, gravity torque on joint 2 (pitch) is large."""
        q = jnp.zeros((1, 9)).at[0, 1].set(-1.2)
        tau_g = np.asarray(art.gravity_torque(q))[0]
        assert abs(tau_g[1]) > 5.0  # several kg at lever arm ~0.3-0.6 m
        assert abs(tau_g[0]) < 1e-4  # joint 1 rotates about gravity axis

    def test_gravity_comp_holds_pose(self):
        st = art.GripperArmState.init(4)
        step = jax.jit(lambda s: art.step(s, 1.0 / 120.0))
        for _ in range(60):
            st = step(st)
        err = np.abs(np.asarray(st.q - st.q_target))
        assert err.max() < 5e-3, err.max()

    def test_arm_falls_without_compensation(self):
        st = art.GripperArmState.init(2)
        step = jax.jit(
            lambda s: art.step(s, 1.0 / 120.0, kp=jnp.zeros(9), kd=jnp.zeros(9), gravity_comp=False)
        )
        for _ in range(30):
            st = step(st)
        assert float(jnp.abs(st.q[:, 1] - art.GripperArmState.init(2).q[:, 1]).max()) > 0.01

    def test_energy_conservation_free_fall(self):
        """tau = 0, no limits hit: E = T + U drifts < 5% of initial kinetic scale."""
        q0 = jnp.broadcast_to(
            jnp.concatenate([franka.Q_DEFAULT, jnp.array([0.02, 0.02])]), (1, 9)
        )
        st = art.GripperArmState(q=q0, qd=jnp.zeros((1, 9)), q_target=q0)

        def energy(s):
            M = art.mass_matrix(s.q)
            T = 0.5 * jnp.einsum("ni,nij,nj->n", s.qd, M, s.qd)
            U = jax.vmap(art.potential_energy)(s.q)
            return float((T + U)[0])

        e0 = energy(st)
        step = jax.jit(lambda s: art.dynamics_step(s, jnp.zeros((1, 9)), 1.0 / 480.0, substeps=1))
        for _ in range(48):  # 0.1 s of free fall (before any joint-limit hit,
            st = step(st)  # which dissipates energy by design)
        assert not bool(
            ((st.q <= art.Q_LOWER + 1e-6) | (st.q >= art.Q_UPPER - 1e-6)).any()
        ), "test premise broken: a joint-limit was hit"
        e1 = energy(st)
        T1 = e1 - float(jax.vmap(art.potential_energy)(st.q)[0])
        assert T1 > 0.5  # it actually fell and gained kinetic energy
        assert abs(e1 - e0) < 0.2 * T1, (e0, e1, T1)


class TestFingers:
    def test_fingers_track_width_command(self):
        st = art.GripperArmState.init(2, finger_width=0.08)
        st = art.GripperArmState(
            q=st.q, qd=st.qd, q_target=st.q_target.at[:, 7:].set(0.005)
        )
        step = jax.jit(lambda s: art.step(s, 1.0 / 120.0))
        for _ in range(120):
            st = step(st)
        w = np.asarray(st.q[:, 7:])
        np.testing.assert_allclose(w, 0.005, atol=1e-3)

    def test_finger_force_limited(self):
        st = art.GripperArmState.init(1)
        st = art.GripperArmState(q=st.q, qd=st.qd, q_target=st.q_target.at[:, 7:].set(-1.0))
        tau = np.asarray(art.pd_torque(st))
        assert np.abs(tau[:, 7:]).max() <= art.FINGER_FORCE_LIMIT + 1e-5


class TestOperationalSpace:
    def test_osc_converges_to_nearby_target(self):
        n = 2
        st = art.GripperArmState.init(n)
        off = jnp.array([0.0, 0.0, art.HAND_TCP_OFFSET])
        pos0, quat0, _, _ = franka.forward_kinematics(st.q[:, :7], ee_offset_pos=off)
        target = pos0 + jnp.array([0.03, -0.02, 0.02])
        kp = jnp.array([200.0, 200.0, 200.0, 30.0, 30.0, 30.0])
        kd = 2.0 * jnp.sqrt(kp)

        stp = jax.jit(
            lambda s: art.osc_step(s, target, quat0, kp, kd, 1.0 / 120.0, ee_offset_pos=off)
        )

        for _ in range(240):
            st = stp(st)
        pos1, _, _, _ = franka.forward_kinematics(st.q[:, :7], ee_offset_pos=off)
        err = float(jnp.linalg.norm(pos1 - target, axis=-1).max())
        assert err < 0.005, err

    def test_ee_wrench_maps_down_force_to_shoulder_torque(self):
        st = art.GripperArmState.init(1)
        wrench = jnp.array([[0.0, 0.0, -10.0, 0.0, 0.0, 0.0]])
        tau = np.asarray(art.ee_wrench_to_tau(st.q, wrench))
        assert tau.shape == (1, 9)
        assert np.abs(tau[0, :7]).max() > 0.5
        np.testing.assert_allclose(tau[0, 7:], 0.0)
