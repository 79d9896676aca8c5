"""Tests for rigid-body integration and contact resolution."""

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu.core import maths
from tacex_tpu.physics.rigid import bodies, contact


PARAMS = contact.SphereParams(radius=0.005, mass=0.01, friction=0.8)


def _sim_ball_on_plane(steps=200, dt=1e-3, v0=(0.0, 0.0, 0.0), z0=0.005):
    pos = jnp.array([[0.0, 0.0, z0]])
    lin = jnp.array([list(v0)])
    ang = jnp.zeros((1, 3))

    def step(carry, _):
        pos, lin, ang = carry
        lin = lin + jnp.array([0.0, 0.0, -9.81]) * dt
        dl, da = contact.sphere_plane_contact(pos, lin, ang, (0.0, 0.0, 1.0), 0.0, PARAMS, dt)
        lin, ang = lin + dl, ang + da
        pos = pos + lin * dt
        return (pos, lin, ang), pos

    (pos, lin, ang), traj = jax.lax.scan(step, (pos, lin, ang), None, length=steps)
    return pos, lin, ang, traj


class TestSpherePlane:
    def test_resting_ball_stays(self):
        pos, lin, ang, _ = _sim_ball_on_plane()
        assert abs(float(pos[0, 2]) - 0.005) < 5e-4
        assert float(jnp.linalg.norm(lin)) < 0.05

    def test_falling_ball_lands(self):
        pos, lin, ang, _ = _sim_ball_on_plane(steps=400, z0=0.02)
        assert abs(float(pos[0, 2]) - 0.005) < 1e-3

    def test_rolling_friction_couples_spin(self):
        """A sliding ball picks up backspin-free rolling: w ~= v / r."""
        pos, lin, ang, _ = _sim_ball_on_plane(steps=500, v0=(0.2, 0.0, 0.0))
        v = float(lin[0, 0])
        w = float(ang[0, 1])
        assert v > 0.01
        assert abs(w - v / PARAMS.radius) / (v / PARAMS.radius) < 0.1

    def test_no_contact_no_impulse(self):
        pos = jnp.array([[0.0, 0.0, 1.0]])
        dl, da = contact.sphere_plane_contact(
            pos, jnp.zeros((1, 3)), jnp.zeros((1, 3)), (0, 0, 1.0), 0.0, PARAMS, 1e-3
        )
        assert float(jnp.abs(dl).max()) == 0.0 and float(jnp.abs(da).max()) == 0.0


class TestSphereBox:
    def test_pushed_by_kinematic_box(self):
        """A descending gelpad box presses the ball: ball gains downward
        velocity / is pushed out."""
        pos = jnp.array([[0.0, 0.0, 0.005]])
        lin = jnp.zeros((1, 3))
        ang = jnp.zeros((1, 3))
        box_pos = jnp.array([[0.0, 0.0, 0.016]])  # bottom at 0.011, ball top at 0.010 -> 1mm gap
        box_quat = maths.quat_identity((1,))
        box_vel = jnp.array([[0.0, 0.0, -0.05]])
        dt = 1e-3
        depth0 = contact.sphere_box_penetration(pos, box_pos, box_quat, jnp.array([0.01, 0.01, 0.005]), 0.005)
        assert float(depth0[0]) < 0  # not touching yet
        # move box down until contact
        for _ in range(100):
            box_pos = box_pos + box_vel * dt
            dl, da = contact.sphere_box_contact(
                pos, lin, ang, box_pos, box_quat, box_vel, jnp.array([0.01, 0.01, 0.005]), PARAMS, dt
            )
            lin, ang = lin + dl, ang + da
            dlp, dap = contact.sphere_plane_contact(pos, lin, ang, (0, 0, 1.0), 0.0, PARAMS, dt)
            lin, ang = lin + dlp, ang + dap
            pos = pos + lin * dt
        # squeezed between plane and box: ball stays near plane, box passes into it
        pen = contact.sphere_box_penetration(pos, box_pos, box_quat, jnp.array([0.01, 0.01, 0.005]), 0.005)
        assert float(pen[0]) > 0  # in contact with the gel face
        assert float(pos[0, 2]) > 0.004  # not pushed through the floor

    def test_lateral_drag(self):
        """A box sliding sideways while pressing drags the ball via friction."""
        pos = jnp.array([[0.0, 0.0, 0.005]])
        lin = jnp.zeros((1, 3))
        ang = jnp.zeros((1, 3))
        half = jnp.array([0.01, 0.01, 0.005])
        box_pos = jnp.array([[0.0, 0.0, 0.0145]])  # pressing 0.5mm into ball top
        box_quat = maths.quat_identity((1,))
        box_vel = jnp.array([[0.05, 0.0, 0.0]])
        dt = 1e-3
        for _ in range(200):
            box_pos = box_pos + box_vel * dt
            lin = lin + jnp.array([0.0, 0.0, -9.81]) * dt
            dl, da = contact.sphere_box_contact(pos, lin, ang, box_pos, box_quat, box_vel, half, PARAMS, dt)
            lin, ang = lin + dl, ang + da
            dlp, dap = contact.sphere_plane_contact(pos, lin, ang, (0, 0, 1.0), 0.0, PARAMS, dt)
            lin, ang = lin + dlp, ang + dap
            pos = pos + lin * dt
        assert float(pos[0, 0]) > 0.001  # dragged along +x


class TestIntegrator:
    def test_quat_integration_preserves_norm(self):
        st = bodies.RigidState.init(2, 3)
        st = bodies.RigidState(st.pos, st.quat, st.lin_vel, jnp.ones_like(st.ang_vel) * 5.0)
        for _ in range(100):
            st = bodies.integrate(st, 1e-2, inv_mass=jnp.zeros((3,)))
        norms = np.asarray(jnp.linalg.norm(st.quat, axis=-1))
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_static_bodies_ignore_gravity(self):
        st = bodies.RigidState.init(1, 2)
        inv_mass = jnp.array([0.0, 1.0])
        st = bodies.integrate(st, 0.1, inv_mass=inv_mass)
        assert float(st.lin_vel[0, 0, 2]) == 0.0
        assert float(st.lin_vel[0, 1, 2]) < 0.0


class TestLockRotation:
    """Torsional-lock mode for opposing-pinch grasps (contact.py)."""

    def test_pinched_ball_follows_moving_pads(self):
        """Two opposing pads squeezing a ball and moving up must carry it:
        with free rotation each independent contact under-applies friction
        and the ball creeps out; lock_rotation models the pinch."""
        import jax.numpy as jnp
        from tacex_tpu.physics.rigid import contact

        params = contact.SphereParams(radius=0.01, mass=0.02, friction=0.9)
        half = jnp.array([0.01, 0.004, 0.012])
        dt = 1 / 120
        quat = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        pad_vel = jnp.array([[0.0, 0.0, 0.05]])  # pads moving up

        def run(lock):
            pos = jnp.zeros((1, 3))
            lin = jnp.zeros((1, 3))
            ang = jnp.zeros((1, 3))
            pad_y = 0.012  # 2 mm squeeze
            for k in range(60):
                z = 0.05 * dt * k
                lin = lin + jnp.array([0.0, 0.0, -9.81]) * dt
                dls = []
                for s in (1.0, -1.0):
                    c = jnp.array([[0.0, s * pad_y, z]])
                    dl, da = contact.sphere_box_contact(
                        pos, lin, ang, c, quat, pad_vel, half, params, dt,
                        lock_rotation=lock,
                    )
                    dls.append((dl, da))
                lin = lin + dls[0][0] + dls[1][0]
                ang = ang + dls[0][1] + dls[1][1]
                pos = pos + lin * dt
            return float(pos[0, 2])

        z_locked = run(True)
        z_free = run(False)
        assert z_locked > 0.015, f"locked pinch failed to carry the ball: {z_locked}"
        assert z_locked > z_free + 0.005, (z_locked, z_free)
