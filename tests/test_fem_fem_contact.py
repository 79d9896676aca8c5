"""FEM-FEM / self contact (VERDICT #5): two gels pressing each other.

Two gel slabs on a union mesh, top one driven down by attachments into the
bottom one. With self-contact enabled the squeeze transmits force and stays
penetration-free; with it disabled the top gel sweeps straight through —
the control that proves the barrier (not the elasticity) does the work.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu.physics.soft.ipc import IpcSolverCfg, RigidSdfScene, SoftBodyModel, SoftBodyState
from tacex_tpu.physics.soft.mesh import box_tet_mesh, union_meshes

GAP = 0.0012  # initial face-to-face gap (m)
SIZE = (0.01, 0.01, 0.004)
RES = (3, 3, 2)


def _two_gel_model(self_contact_k: int):
    bottom = box_tet_mesh(SIZE, RES, center=(0.0, 0.0, 0.0))
    top = box_tet_mesh(SIZE, RES, center=(0.0, 0.0, SIZE[2] + GAP))
    mesh, offsets = union_meshes([bottom, top])
    nb = offsets[1]

    # attachments: bottom gel held by its bottom face, top gel driven by its
    # top face
    z = mesh.points[:, 2]
    bot_anchor = np.where((np.arange(len(z)) < nb) & (z < z[:nb].min() + 1e-6))[0]
    top_anchor = np.where((np.arange(len(z)) >= nb) & (z > z.max() - 1e-6))[0]
    anchors = np.concatenate([bot_anchor, top_anchor]).astype(np.int32)

    cfg = IpcSolverCfg(
        dt=0.01, newton_max_iter=8, cg_iters=24, d_hat=0.0005, kappa=1e3,
        friction_mu=0.0, self_contact_k=self_contact_k, gravity=(0.0, 0.0, 0.0),
    )
    model = SoftBodyModel(
        mesh, youngs_modulus=1.45e5, poisson_ratio=0.45, cfg=cfg,
        attachment_verts=anchors,
    )
    rest_aim = jnp.asarray(mesh.points[anchors])[None]  # (1, Va, 3)
    n_bot_anchor = len(bot_anchor)
    return model, mesh, int(nb), rest_aim, n_bot_anchor


def _squeeze(model, mesh, rest_aim, n_bot_anchor, steps=14, drop_per_step=1.5e-4):
    state = SoftBodyState.init(1, mesh.points)
    scene = RigidSdfScene.empty(1)
    step = jax.jit(model.step)
    for i in range(steps):
        aim = rest_aim.at[:, n_bot_anchor:, 2].add(-drop_per_step * (i + 1))
        state = step(state, scene, aim)
    return state


class TestTwoGelSqueeze:
    def test_squeeze_transmits_force_and_stays_separated(self):
        model, mesh, nb, rest_aim, nba = _two_gel_model(self_contact_k=4)
        state = _squeeze(model, mesh, rest_aim, nba)
        x = np.asarray(state.x[0])
        bottom, top = x[:nb], x[nb:]
        rest = mesh.points
        # total commanded drop 14 * 0.15 mm = 2.1 mm > gap 1.2 mm -> contact
        # 1) the bottom gel FEELS the top gel: its top face moved down
        bot_top_face = rest[:nb, 2] > rest[:nb, 2].max() - 1e-6
        descent = (rest[:nb, 2] - bottom[:, 2])[bot_top_face]
        assert descent.max() > 2e-4, descent.max()
        # 2) penetration-free: the top gel's lowest point stays above the
        # bottom gel's contact face (flat-slab geometry -> plane separation)
        sep = top[:, 2].min() - bottom[bot_top_face, 2].max()
        assert sep > -1e-4, sep  # allow sub-d_hat tolerance for face curvature
        # 3) all finite
        assert np.isfinite(x).all()

    def test_without_self_contact_gels_interpenetrate(self):
        model, mesh, nb, rest_aim, nba = _two_gel_model(self_contact_k=0)
        state = _squeeze(model, mesh, rest_aim, nba)
        x = np.asarray(state.x[0])
        bottom, top = x[:nb], x[nb:]
        rest = mesh.points
        bot_top_face = rest[:nb, 2] > rest[:nb, 2].max() - 1e-6
        # bottom gel untouched...
        descent = (rest[:nb, 2] - bottom[:, 2])[bot_top_face]
        assert descent.max() < 5e-5
        # ...while the top gel swept into its volume
        overlap = bottom[bot_top_face, 2].max() - top[:, 2].min()
        assert overlap > 5e-4, overlap

    def test_gels_apart_feel_nothing(self):
        model, mesh, nb, rest_aim, nba = _two_gel_model(self_contact_k=4)
        state = SoftBodyState.init(1, mesh.points)
        scene = RigidSdfScene.empty(1)
        step = jax.jit(model.step)
        for _ in range(5):
            state = step(state, scene, rest_aim)  # nothing moves
        x = np.asarray(state.x[0])
        np.testing.assert_allclose(x, mesh.points, atol=5e-5)


class TestPointTriangleDistance:
    def test_matches_bruteforce_samples(self):
        from tacex_tpu.physics.soft.ipc import _point_triangle_distance

        rng = np.random.default_rng(0)
        a, b, c = rng.normal(size=(3, 3)).astype(np.float32)
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        d = np.asarray(
            _point_triangle_distance(
                jnp.asarray(pts), jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
            )
        )
        # brute force: dense barycentric sampling of the triangle
        u = np.linspace(0, 1, 120)
        uu, vv = np.meshgrid(u, u)
        m = uu + vv <= 1
        samples = (
            a[None] + uu[m][:, None] * (b - a)[None] + vv[m][:, None] * (c - a)[None]
        )
        d_ref = np.linalg.norm(pts[:, None] - samples[None], axis=-1).min(1)
        np.testing.assert_allclose(d, d_ref, atol=2e-2 * np.abs(d_ref).max() + 1e-3)

    def test_gradient_finite_everywhere(self):
        from tacex_tpu.physics.soft.ipc import _point_triangle_distance

        a = jnp.array([0.0, 0.0, 0.0])
        b = jnp.array([1.0, 0.0, 0.0])
        c = jnp.array([0.0, 1.0, 0.0])
        for p in ([0.2, 0.2, 0.5], [0.2, 0.2, 0.0], [2.0, 2.0, 0.0], [0.0, 0.0, 0.0], [0.5, -0.5, 0.1]):
            g = jax.grad(lambda q: _point_triangle_distance(q, a, b, c))(jnp.asarray(p))
            assert bool(jnp.isfinite(g).all()), (p, g)


class TestUipcUnionWorld:
    """FEM-FEM contact through the UipcSim API (shared contact world)."""

    def _build(self, k):
        from tacex_tpu.uipc.objects import StableNeoHookeanCfg, TetMeshCfg, UipcObject, UipcObjectCfg
        from tacex_tpu.uipc.sim import UipcSim, UipcSimCfg

        cfg = UipcSimCfg(num_envs=2, gravity=(0.0, 0.0, 0.0))
        cfg.contact.self_contact_k = k
        cfg.contact.d_hat = 0.0005
        cfg.contact.resistance = 1e3
        cfg.contact.friction = False
        sim = UipcSim(cfg)
        mk = lambda cz: UipcObjectCfg(
            mesh_cfg=TetMeshCfg(size=SIZE, resolution=RES, center=(0.0, 0.0, cz)),
            constitution=StableNeoHookeanCfg(youngs_modulus=0.145),
        )
        bottom = UipcObject(mk(0.0), sim)
        top = UipcObject(mk(SIZE[2] + GAP), sim)
        z_b = bottom.mesh.points[:, 2]
        z_t = top.mesh.points[:, 2]
        bot_anchor = np.where(z_b < z_b.min() + 1e-6)[0]
        top_anchor = np.where(z_t > z_t.max() - 1e-6)[0]
        bottom.set_attachments(bot_anchor, aim_provider=lambda: jnp.asarray(
            bottom.mesh.points[bot_anchor])[None].repeat(2, 0))
        self_drop = {"d": 0.0}
        top.set_attachments(top_anchor, aim_provider=lambda: jnp.asarray(
            top.mesh.points[top_anchor])[None].repeat(2, 0).at[:, :, 2].add(-self_drop["d"]))
        sim.setup_sim()
        return sim, bottom, top, self_drop

    def test_two_gel_squeeze_through_sim_api(self):
        sim, bottom, top, drop = self._build(k=4)
        assert sim._union_model is not None
        for i in range(14):
            drop["d"] = 1.5e-4 * (i + 1)
            sim.step()
        xb = np.asarray(bottom.state.x[0])
        xt = np.asarray(top.state.x[0])
        rest_b = bottom.mesh.points
        face = rest_b[:, 2] > rest_b[:, 2].max() - 1e-6
        assert (rest_b[:, 2] - xb[:, 2])[face].max() > 2e-4  # force transmitted
        assert xt[:, 2].min() - xb[face, 2].max() > -1e-4  # penetration-free
        # both envs identical inputs -> identical results (batched solve)
        np.testing.assert_allclose(
            np.asarray(bottom.state.x[0]), np.asarray(bottom.state.x[1]), atol=1e-6
        )

    def test_reset_write_through_union(self):
        sim, bottom, top, drop = self._build(k=4)
        drop["d"] = 1e-3
        for _ in range(4):
            sim.step()
        moved = np.abs(np.asarray(top.state.x[0]) - top.mesh.points).max()
        assert moved > 1e-5
        top.write_vertex_positions_to_sim(jnp.asarray(top.mesh.points))
        np.testing.assert_allclose(np.asarray(top.state.x[0]), top.mesh.points, atol=0)
        # union state actually took the write
        np.testing.assert_allclose(
            np.asarray(sim._union_state.x[0, bottom.mesh.num_vertices:]),
            top.mesh.points, atol=0,
        )
