"""Helical thread SDF (ops/sdf.py sdf_threads).

The analytic thread surface is the real Factory asset geometry the reference's
NutThread/GearMesh tasks collide against via PhysX SDF collision
(reference factory_env_cfg.py:192-213, factory_tasks_cfg.py) — here an
ISO-like triangular profile swept along a helix, evaluated exactly in
helicoidal coordinates. Tests validate against a brute-force point cloud
sampled from the same parametric surface.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tacex_tpu.ops import sdf as sdf_ops

R_MID, DEPTH, PITCH = 0.005, 0.001, 0.002
Z0, Z1 = 0.0, 0.02


def _thread(side):
    return jnp.asarray([[0, 0, 0, 0, 0, 1, R_MID, DEPTH, PITCH, Z0, Z1, side]])


def _surface_cloud(n=400_000, seed=0):
    """Points exactly on the thread surface, in the SDF's own helix frame
    (axis +z -> b1=(0,1,0), b2=(-1,0,0): p = r cos(t) b1 + r sin(t) b2 + z ez)."""
    rng = np.random.default_rng(seed)
    theta = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(Z0 + PITCH, Z1 - PITCH, n)  # inside the span (no end ramp)
    u = z - PITCH * theta / (2 * np.pi)
    f = u / PITCH - np.floor(u / PITCH)
    uf = np.minimum(f, 1 - f) * PITCH
    r = (R_MID + DEPTH / 2) - DEPTH * (uf / (PITCH / 2)) * 0.5 * 2
    return np.stack([-r * np.sin(theta), r * np.cos(theta), z], -1)


class TestThreadSdf:
    def test_matches_brute_force_distance(self):
        from scipy.spatial import cKDTree

        S = _surface_cloud()
        rng = np.random.default_rng(1)
        P = np.stack(
            [
                rng.uniform(-0.008, 0.008, 300),
                rng.uniform(-0.008, 0.008, 300),
                rng.uniform(0.004, 0.016, 300),
            ],
            -1,
        )
        d_sdf = np.asarray(sdf_ops.sdf_threads(jnp.asarray(P), _thread(1.0)))[:, 0]
        d_bf, _ = cKDTree(S).query(P)
        near = np.abs(d_sdf) < 0.003
        assert near.sum() > 100
        err = np.abs(np.abs(d_sdf[near]) - d_bf[near])
        # BF cloud spacing dominates; analytic error itself is <10 um
        assert err.max() < 1e-4, err.max()

    def test_signs_external_vs_internal(self):
        rng = np.random.default_rng(2)
        n = 200
        P = np.stack(
            [
                rng.uniform(-0.008, 0.008, n),
                rng.uniform(-0.008, 0.008, n),
                rng.uniform(0.004, 0.016, n),
            ],
            -1,
        )
        rr = np.hypot(P[:, 0], P[:, 1])
        d_ext = np.asarray(sdf_ops.sdf_threads(jnp.asarray(P), _thread(1.0)))[:, 0]
        d_int = np.asarray(sdf_ops.sdf_threads(jnp.asarray(P), _thread(-1.0)))[:, 0]
        core = rr < R_MID - DEPTH  # inside the bolt shank / inside the nut bore
        clear = rr > R_MID + DEPTH * 1.2
        # external thread (bolt): material inside
        assert (d_ext[core] < 0).all() and (d_ext[clear] > 0).all()
        # internal thread (nut): material outside the bore
        assert (d_int[core] > 0).all() and (d_int[clear] < 0).all()
        # side = 0 disables
        d_off = np.asarray(sdf_ops.sdf_threads(jnp.asarray(P), _thread(0.0)))[:, 0]
        assert (d_off > 1e3).all()

    def test_shank_cylinder_outside_span(self):
        # beyond [z0, z1] the depth ramps to zero: plain r_mid cylinder
        z = Z1 + PITCH  # one pitch past the end of the ramp
        P = np.array([[0.0, R_MID + 0.002, z], [0.0, R_MID - 0.002, z]])
        d = np.asarray(sdf_ops.sdf_threads(jnp.asarray(P), _thread(1.0)))[:, 0]
        np.testing.assert_allclose(d, [0.002, -0.002], atol=1e-5)

    def test_gradient_finite_everywhere(self):
        th = _thread(1.0)

        def f(p):
            return sdf_ops.sdf_threads(p[None], th)[0, 0]

        rng = np.random.default_rng(3)
        P = np.stack(
            [
                rng.uniform(-0.01, 0.01, 100),
                rng.uniform(-0.01, 0.01, 100),
                rng.uniform(-0.005, 0.025, 100),
            ],
            -1,
        )
        # include on-axis points (the atan2 NaN hazard)
        P = np.concatenate([P, [[0, 0, 0.01], [0, 0, -0.002]]])
        g = jax.vmap(jax.grad(f))(jnp.asarray(P))
        assert np.isfinite(np.asarray(g)).all()

    def test_scene_sdf_includes_threads(self):
        p = jnp.asarray([[0.0, R_MID + 0.002, 0.01]])
        d = sdf_ops.scene_sdf(
            p,
            jnp.zeros((1, 4)),
            jnp.zeros((1, 10)),
            jnp.zeros((1, 8)),
            jnp.zeros((1, 4)),
            _thread(1.0),
        )
        assert float(d[0]) < 0.01  # the thread, not BIG

    def test_nut_on_bolt_materials_disjoint(self):
        """An internal thread (nut) mated in-phase on an external thread
        (bolt) with radial clearance: the two material regions are disjoint
        (no point is inside BOTH), and genuine gap points exist between the
        flanks (both SDFs positive somewhere at mid-gap radius). Mating
        phase: the nut's inward tooth sits at the bolt's root, i.e. the nut
        helix is offset half a pitch axially."""
        bolt = jnp.asarray([[0, 0, 0, 0, 0, 1, R_MID, DEPTH, PITCH, Z0, Z1, 1.0]])
        nut = jnp.asarray(
            [
                [0, 0, PITCH / 2, 0, 0, 1, R_MID + 0.0004, DEPTH, PITCH,
                 Z0 - PITCH / 2, Z1 - PITCH / 2, -1.0]
            ]
        )
        rng = np.random.default_rng(4)
        n = 2000
        theta = rng.uniform(-np.pi, np.pi, n)
        z = rng.uniform(0.005, 0.015, n)
        r = rng.uniform(R_MID - DEPTH, R_MID + DEPTH, n)
        P = jnp.asarray(np.stack([-r * np.sin(theta), r * np.cos(theta), z], -1))
        db = np.asarray(sdf_ops.sdf_threads(P, bolt))[:, 0]
        dn = np.asarray(sdf_ops.sdf_threads(P, nut))[:, 0]
        assert not ((db < 0) & (dn < 0)).any()  # materials never overlap
        gap = (db > 0) & (dn > 0)
        assert gap.sum() > n // 20  # a real clearance gap exists
        assert db[gap].max() < DEPTH and dn[gap].max() < DEPTH
