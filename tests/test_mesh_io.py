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
