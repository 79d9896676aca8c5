"""Affine Body Dynamics solver tests (physics/soft/abd.py).

Covers the libuipc AffineBodyConstitution scope the reference exercises in
its sample scenes (falling/stacking bodies, soft transform constraints,
rotating motors — reference examples/libuipc-samples/*.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu.physics.soft.abd import AbdModel, AbdSolverCfg, AbdState, rotate_target
from tacex_tpu.physics.soft.ipc import RigidSdfScene


def _cube(half=0.05):
    P = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half) for z in (-half, half)],
        np.float64,
    )
    # 12 outward-oriented triangles of the cube surface
    faces = [
        (0, 1, 3, 2, [-1, 0, 0]),
        (4, 6, 7, 5, [1, 0, 0]),
        (0, 4, 5, 1, [0, -1, 0]),
        (2, 3, 7, 6, [0, 1, 0]),
        (0, 2, 6, 4, [0, 0, -1]),
        (1, 5, 7, 3, [0, 0, 1]),
    ]
    T = []
    for a, b, c, d, n in faces:
        for tri in ((a, b, c), (a, c, d)):
            p0, p1, p2 = P[list(tri)]
            if np.dot(np.cross(p1 - p0, p2 - p0), n) < 0:
                tri = (tri[0], tri[2], tri[1])
            T.append(tri)
    return P, np.asarray(T, np.int64)


def _ground_scene(n=1):
    sc = RigidSdfScene.empty(n)
    return RigidSdfScene(
        sc.spheres, sc.boxes, sc.capsules,
        sc.planes.at[:, 0].set(jnp.array([0.0, 0.0, 1.0, 0.0])),
    )


class TestAbd:
    def test_cube_falls_and_rests(self):
        P, T = _cube()
        model = AbdModel([P], [T], cfg=AbdSolverCfg(contact_k=0))
        st = AbdState.identity(1, 1, offsets=np.array([[0.0, 0.0, 0.08]]))
        step = jax.jit(model.step)
        scene = _ground_scene()
        for _ in range(80):
            st = step(st, scene)
        z = float(st.q[0, 0, 2])
        assert not np.isnan(np.asarray(st.q)).any()
        # rests at half-extent + O(d_hat) gap, penetration-free
        assert 0.0499 < z < 0.053, z
        A = np.asarray(st.q[0, 0, 3:]).reshape(3, 3)
        assert np.abs(A - np.eye(3)).max() < 5e-2  # stays rigid

    def test_two_cubes_stack(self):
        P, T = _cube()
        model = AbdModel([P, P], [T, T], cfg=AbdSolverCfg(contact_k=8))
        st = AbdState.identity(1, 2, offsets=np.array([[0.0, 0.0, 0.06], [0.0, 0.0, 0.18]]))
        step = jax.jit(model.step)
        scene = _ground_scene()
        for _ in range(100):
            st = step(st, scene)
        z = np.asarray(st.q[0, :, 2])
        assert not np.isnan(z).any()
        assert 0.0499 < z[0] < 0.053, z
        # upper cube rests ON the lower one (z ~ 0.05 + 0.1 + gaps), not
        # fallen through and not bounced away
        assert 0.149 < z[1] < 0.158, z

    def test_friction_holds_on_slope(self):
        """High-friction cube sticks on a tilted plane; frictionless slides
        downhill (reference 10_ramp_sliding.py behavior)."""
        P, T = _cube(half=0.02)
        tilt = 0.3  # ~17 deg; tan = 0.31: mu=0 slides, mu=0.9 sticks
        n = np.array([-np.sin(tilt), 0.0, np.cos(tilt)])
        # cube oriented flush with the slope, resting d_hat above it
        R = np.array(
            [
                [np.cos(-tilt), 0.0, np.sin(-tilt)],
                [0.0, 1.0, 0.0],
                [-np.sin(-tilt), 0.0, np.cos(-tilt)],
            ]
        )
        center = (-0.0203 + 0.0205) * n

        def run(mu):
            model = AbdModel(
                [P], [T], cfg=AbdSolverCfg(contact_k=0, friction_mu=mu)
            )
            sc = RigidSdfScene.empty(1)
            scene = RigidSdfScene(
                sc.spheres, sc.boxes, sc.capsules,
                sc.planes.at[:, 0].set(jnp.asarray([*n, -0.0203], jnp.float32)),
            )
            st = AbdState.identity(1, 1, offsets=center[None])
            q = st.q.at[0, 0, 3:].set(jnp.asarray(R.reshape(-1), jnp.float32))
            st = AbdState(q=q, qd=st.qd)
            step = jax.jit(model.step)
            for _ in range(60):
                st = step(st, scene)
            return float(st.q[0, 0, 0])

        x_stick = run(0.9)
        x_slide = run(0.0)
        # downhill is -x: the frictionless cube must slide well past the
        # sticking one, which stays near its start
        assert abs(x_stick - center[0]) < 0.01, (x_stick, center[0])
        assert x_slide < x_stick - 0.01, (x_slide, x_stick)

    def test_soft_transform_constraint_pulls_body(self):
        """SoftTransformConstraint semantics: strong aim drags the body."""
        P, T = _cube(half=0.02)
        model = AbdModel([P], [T], cfg=AbdSolverCfg(contact_k=0, friction_mu=0.0))
        st = AbdState.identity(1, 1, offsets=np.array([[0.0, 0.0, 0.1]]))
        target = AbdState.identity(1, 1, offsets=np.array([[0.05, 0.02, 0.1]])).q
        step = jax.jit(model.step)
        scene = _ground_scene()
        strength = jnp.full((1, 1), 100.0)
        for _ in range(60):
            st = step(st, scene, aim_q=target, aim_strength=strength)
        pos = np.asarray(st.q[0, 0, :3])
        assert np.linalg.norm(pos - np.array([0.05, 0.02, 0.1])) < 0.01, pos

    def test_rotating_motor_target(self):
        """rotate_target advances an affine target like libuipc RotatingMotor."""
        q0 = AbdState.identity(1, 1).q[0, 0]
        q1 = rotate_target(q0, jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
        A = np.asarray(q1[3:]).reshape(3, 3)
        expect = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        assert np.abs(A - expect).max() < 1e-5

    def test_motor_spins_constrained_body(self):
        P, T = _cube(half=0.02)
        model = AbdModel([P], [T], cfg=AbdSolverCfg(contact_k=0, friction_mu=0.0))
        st = AbdState.identity(1, 1, offsets=np.array([[0.0, 0.0, 0.1]]))
        target = st.q
        step = jax.jit(model.step)
        rot = jax.jit(
            lambda q: jax.vmap(jax.vmap(lambda qq: rotate_target(qq, jnp.array([0.0, 0.0, 1.0]), 0.05)))(q)
        )
        scene = _ground_scene()
        strength = jnp.full((1, 1), 100.0)
        for _ in range(40):
            target = rot(target)
            st = step(st, scene, aim_q=target, aim_strength=strength)
        A = np.asarray(st.q[0, 0, 3:]).reshape(3, 3)
        ang = np.arctan2(A[1, 0], A[0, 0])
        assert ang > 0.8, ang  # followed ~2 rad of commanded rotation

    def test_batched_envs_independent(self):
        P, T = _cube()
        model = AbdModel([P], [T], cfg=AbdSolverCfg(contact_k=0))
        st = AbdState.identity(2, 1, offsets=np.array([[0.0, 0.0, 0.08]]))
        # env 1 starts higher
        st = AbdState(q=st.q.at[1, 0, 2].set(0.3), qd=st.qd)
        step = jax.jit(model.step)
        scene = _ground_scene(2)
        for _ in range(20):
            st = step(st, scene)
        z = np.asarray(st.q[:, 0, 2])
        assert z[0] < 0.06  # already landed
        assert z[1] > z[0] + 0.01  # still falling — envs independent


class TestAnalyticHessian:
    """The scatter-free J^T G J Hessian assembly must equal jax.hessian."""

    def test_matches_autodiff(self):
        from tacex_tpu.assets.meshes import box_mesh, icosphere, weld_soup
        from tacex_tpu.physics.soft.abd import q_to_affine
        from tacex_tpu.ops import sdf as sdf_ops

        p1, t1 = weld_soup(box_mesh(0.05, 0.05, 0.05))
        p2, t2 = weld_soup(icosphere(0.05, 1))
        model = AbdModel(
            [p1 + np.array([0, 0, 0.0502]), p2 + np.array([0.01, 0.005, 0.152])],
            [t1, t2],
            cfg=AbdSolverCfg(contact_k=8, friction_mu=0.5, d_hat=0.002),
        )
        sc = RigidSdfScene.empty(1)
        scene1 = RigidSdfScene(
            sc.spheres[0], sc.boxes[0], sc.capsules[0],
            sc.planes[0].at[0].set(jnp.array([0.0, 0, 1, 0])),
        )
        rng = np.random.default_rng(0)
        q = AbdState.identity(1, 2).q[0] + jnp.asarray(
            rng.normal(scale=1e-3, size=(2, 12)).astype(np.float32)
        )
        c = model.cfg
        x0 = model.world_points(q)
        sdf_fn = lambda p: sdf_ops.scene_sdf(
            p, scene1.spheres, scene1.boxes, scene1.capsules, scene1.planes
        )
        d0 = sdf_fn(x0)
        n_dir = jax.vmap(jax.grad(lambda p: sdf_fn(p[None])[0]))(x0)
        n_dir = n_dir / jnp.maximum(jnp.linalg.norm(n_dir, axis=-1, keepdims=True), 1e-9)
        dh = c.d_hat
        d0s = jnp.clip(d0, 1e-9, dh)
        lam = jnp.where(
            d0 < dh,
            c.kappa_contact
            * jnp.abs(2 * (d0s - dh) * jnp.log(d0s / dh) + (d0s - dh) ** 2 / d0s),
            0.0,
        )
        cand = model._select_candidates(x0)
        ci, valid = cand
        d_p, q_p = model._pair_closest(x0, ci)
        d_ps = jnp.clip(d_p, 1e-9, dh)
        lam_p = jnp.where(
            valid & (d_p < dh),
            c.kappa_contact
            * jnp.abs(2 * (d_ps - dh) * jnp.log(d_ps / dh) + (d_ps - dh) ** 2 / d_ps),
            0.0,
        )
        n_p = (x0[:, None, :] - q_p) / jnp.maximum(d_p, 1e-9)[..., None]
        A0, t0 = q_to_affine(q)
        tb = model.tri_body[ci]
        p_local = jnp.einsum(
            "vkij,vkj->vki", jnp.linalg.inv(A0)[tb], q_p - t0[tb]
        )
        pf = (lam_p, n_p, q_p, p_local, tb, valid)
        fb = (lam, n_dir)
        aimw = jnp.full((2, 12), 0.7)

        ef = lambda qf: model._energy(
            qf.reshape(2, 12), q, scene1, q, aimw, x0, fb, cand, pf
        )
        H_ref = jax.hessian(ef)(q.reshape(-1))
        H_ana = model._assemble_hessian(q, q, scene1, aimw, x0, fb, cand, pf)
        rel = float(jnp.abs(H_ref - H_ana).max() / jnp.abs(H_ref).max())
        assert rel < 1e-3, rel


class TestCgSolver:
    """linear_solver="cg" (block-preconditioned, matrix-free) must reproduce
    the dense-Newton trajectories at pile scale — it's the batched-RL path
    (the dense (12B)^2 solve saturates the chip at N=1, AbdSolverCfg note)."""

    def _pile(self, solver, n_envs=1, n_bodies=4, steps=60):
        P, T = _cube(half=0.03)
        rng = np.random.default_rng(3)
        offs = np.stack(
            [
                rng.uniform(-0.01, 0.01, n_bodies),
                rng.uniform(-0.01, 0.01, n_bodies),
                0.05 + 0.08 * np.arange(n_bodies),
            ],
            axis=-1,
        )
        model = AbdModel(
            [P] * n_bodies, [T] * n_bodies,
            cfg=AbdSolverCfg(contact_k=8, friction_mu=0.3, linear_solver=solver),
        )
        st = AbdState.identity(n_envs, n_bodies, offsets=offs)
        step = jax.jit(model.step)
        scene = _ground_scene(n_envs)
        for _ in range(steps):
            st = step(st, scene)
        return np.asarray(st.q)

    def test_cg_matches_dense_on_pile(self):
        q_dense = self._pile("dense")
        q_cg = self._pile("cg")
        assert not np.isnan(q_cg).any()
        # same rest configuration: bodies land in the same places (loose
        # tolerance — CG truncation changes iterates, not the fixed point)
        np.testing.assert_allclose(q_cg[0, :, :3], q_dense[0, :, :3], atol=3e-3)
        # all bodies rigid and above ground
        for b in range(q_cg.shape[1]):
            A = q_cg[0, b, 3:].reshape(3, 3)
            assert np.abs(A.T @ A - np.eye(3)).max() < 5e-2
            assert q_cg[0, b, 2] > 0.028

    def test_cg_batched_envs(self):
        q = self._pile("cg", n_envs=4, n_bodies=4, steps=40)
        assert q.shape[0] == 4 and not np.isnan(q).any()
        # envs share identical initial conditions -> identical results
        np.testing.assert_allclose(q[1:], np.broadcast_to(q[:1], q[1:].shape), atol=1e-6)
