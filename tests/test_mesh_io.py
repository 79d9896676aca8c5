"""Tests for .msh loading and voxel tetrahedralization."""

import numpy as np

from tacex_tpu.physics.soft.mesh import box_tet_mesh, voxel_tet_mesh
from tacex_tpu.physics.soft.msh_io import load_msh

MSH22 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
5
1 0 0 0
2 1 0 0
3 0 1 0
4 0 0 1
5 1 1 1
$EndNodes
$Elements
3
1 4 2 0 1 1 2 3 4
2 4 2 0 1 2 3 4 5
3 2 2 0 1 1 2 3
$EndElements
"""


class TestMshIO:
    def test_load_v22(self, tmp_path):
        f = tmp_path / "t.msh"
        f.write_text(MSH22)
        mesh = load_msh(f)
        assert mesh.num_vertices == 5
        assert len(mesh.tets) == 2  # the triangle element is skipped
        assert (mesh.rest_volumes() > 0).all()
        assert len(mesh.surface_tris) > 0


class TestVoxelMesher:
    def test_voxelize_sphere(self):
        # icosphere-ish: sample a sphere surface via subdivided octahedron
        import itertools

        # build a closed box surface mesh (easy exact case)
        box = box_tet_mesh((0.04, 0.04, 0.04), (2, 2, 2))
        mesh = voxel_tet_mesh(box.points, box.surface_tris, resolution=6)
        assert len(mesh.tets) > 0
        vols = mesh.rest_volumes()
        assert (vols > 0).all()
        # total volume approximates the box volume within a voxel shell
        assert abs(vols.sum() - 0.04**3) / 0.04**3 < 0.5
        # all points within the (slightly padded) bounding box
        assert mesh.points.min() >= -0.021 and mesh.points.max() <= 0.021


class TestIsosurfaceStuffing:
    """Quality tetrahedralization (fTetWild-class role, mesh_gen.py:17-106)."""

    def test_sphere_quality_and_fidelity(self):
        from tacex_tpu.assets.meshes import icosphere, weld_soup
        from tacex_tpu.physics.soft.mesh import isosurface_stuffing_tet_mesh

        sp, st = weld_soup(icosphere(0.05, 2))
        m = isosurface_stuffing_tet_mesh(sp, st, resolution=10)
        vols = m.rest_volumes()
        assert (vols > 0).all()
        # volume within the boundary-layer tolerance of the true ball
        true = 4.0 / 3.0 * np.pi * 0.05**3
        assert 0.75 * true < vols.sum() <= true * 1.02, vols.sum()
        # BCC + warp keeps dihedral angles bounded (no slivers): check via
        # the volume/longest-edge^3 aspect proxy
        P, T = m.points.astype(np.float64), m.tets
        verts = P[T]
        emax = max(
            np.linalg.norm(verts[:, a] - verts[:, b], axis=-1).max()
            for a in range(4) for b in range(a + 1, 4)
        )
        aspect = vols / np.maximum(
            np.stack([
                np.linalg.norm(verts[:, a] - verts[:, b], axis=-1)
                for a in range(4) for b in range(a + 1, 4)
            ]).max(0) ** 3, 1e-30,
        )
        assert aspect.min() > 0.005, aspect.min()
        # boundary fidelity beats the voxel mesher
        sv = m.points[m.surface_verts]
        err = np.abs(np.linalg.norm(sv, axis=-1) - 0.05)
        h = 0.1 / 10
        assert err.max() < 0.75 * h, (err.max(), h)

    def test_solver_runs_on_stuffed_mesh(self):
        import jax

        from tacex_tpu.assets.meshes import icosphere, weld_soup
        from tacex_tpu.physics.soft.ipc import (
            IpcSolverCfg, RigidSdfScene, SoftBodyModel, SoftBodyState,
        )
        from tacex_tpu.physics.soft.mesh import isosurface_stuffing_tet_mesh

        sp, st = weld_soup(icosphere(0.03, 1))
        m = isosurface_stuffing_tet_mesh(sp, st, resolution=6)
        model = SoftBodyModel(
            m, youngs_modulus=5e4,
            cfg=IpcSolverCfg(dt=1 / 60, d_hat=0.002, newton_max_iter=4),
        )
        pts = m.points + np.array([0, 0, 0.06], np.float32)
        state = SoftBodyState.init(1, pts)
        sc = RigidSdfScene.empty(1)
        scene = RigidSdfScene(
            sc.spheres, sc.boxes, sc.capsules,
            sc.planes.at[:, 0].set(jax.numpy.array([0.0, 0.0, 1.0, 0.0])),
        )
        step = jax.jit(model.step)
        for _ in range(40):
            state = step(state, scene)
        z = np.asarray(state.x[0, :, 2])
        assert not np.isnan(z).any()
        assert z.min() > -1e-3  # rests on the ground, no penetration
        assert z.max() < 0.09  # actually fell
