"""Triangle rasterizer golden tests: mesh depth must match analytic depth.

VERDICT round-1 item #2: mesh-rasterized depth ~= analytic ray-cast depth
for sphere/box, so the RTX-replacement path is trusted for arbitrary props.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu.assets import meshes
from tacex_tpu.render.depth_camera import SdfScene, render_depth_batch
from tacex_tpu.render.mesh_raster import (
    raster_depth,
    transform_tris,
    world_tris_to_cam,
)

RES = (32, 32)
EXTENT = (0.02, 0.02)
FAR = 0.1
# camera at origin looking down -Z world (quat w=0, x=1 flips z): keep it
# simple — identity quat, camera +Z = world +Z, object below at +z.
IDENT = jnp.array([1.0, 0.0, 0.0, 0.0])
ORIGIN = jnp.zeros(3)


def _analytic_scene(**kw):
    sc = SdfScene.empty(1, **{k: v for k, v in kw.items() if isinstance(v, int)})
    return sc


def _render(scene):
    return np.asarray(
        render_depth_batch(ORIGIN[None], IDENT[None], scene, RES, EXTENT, far=FAR)
    )[0]


class TestMeshVsAnalytic:
    def test_sphere_mesh_matches_analytic(self):
        r, cz = 0.005, 0.02
        analytic = SdfScene(
            spheres=jnp.array([[[0.0, 0.0, cz, r]]]),
            boxes=jnp.zeros((1, 1, 10)),
            capsules=jnp.zeros((1, 1, 8)),
            planes=jnp.zeros((1, 1, 4)),
        )
        d_ana = _render(analytic)

        tris = jnp.asarray(meshes.icosphere(r, 4))  # 5120 tris -> chunked path
        tris = tris + jnp.array([0.0, 0.0, cz])
        mesh_scene = SdfScene(
            spheres=jnp.zeros((1, 1, 4)),
            boxes=jnp.zeros((1, 1, 10)),
            capsules=jnp.zeros((1, 1, 8)),
            planes=jnp.zeros((1, 1, 4)),
            triangles=tris[None],
        )
        d_mesh = _render(mesh_scene)

        hit = d_ana < FAR * 0.99
        assert hit.sum() > 50
        # icosphere subdiv-4 chord error << 0.1 mm
        assert np.abs(d_mesh[hit] - d_ana[hit]).max() < 1e-4
        # background must agree exactly (both clip at far)
        np.testing.assert_allclose(d_mesh[~hit], d_ana[~hit], atol=1e-5)

    def test_box_mesh_matches_analytic_exactly(self):
        h = (0.004, 0.006, 0.003)
        cz = 0.015
        analytic = SdfScene(
            spheres=jnp.zeros((1, 1, 4)),
            boxes=jnp.array([[[0.0, 0.0, cz, 1.0, 0.0, 0.0, 0.0, *h]]]),
            capsules=jnp.zeros((1, 1, 8)),
            planes=jnp.zeros((1, 1, 4)),
        )
        d_ana = _render(analytic)

        tris = jnp.asarray(meshes.box_mesh(*h)) + jnp.array([0.0, 0.0, cz])
        mesh_scene = SdfScene(
            spheres=jnp.zeros((1, 1, 4)),
            boxes=jnp.zeros((1, 1, 10)),
            capsules=jnp.zeros((1, 1, 8)),
            planes=jnp.zeros((1, 1, 4)),
            triangles=jnp.asarray(meshes.pad_tris(np.asarray(tris), 16))[None],
        )
        d_mesh = _render(mesh_scene)
        np.testing.assert_allclose(d_mesh, d_ana, atol=1e-6)

    def test_rotated_box_mesh_matches_rotated_analytic(self):
        h = (0.004, 0.004, 0.004)
        cz = 0.02
        q = jnp.array([np.cos(0.3), 0.0, 0.0, np.sin(0.3)])  # yaw about z
        analytic = SdfScene(
            spheres=jnp.zeros((1, 1, 4)),
            boxes=jnp.array([[[0.0, 0.0, cz, *np.asarray(q), *h]]]),
            capsules=jnp.zeros((1, 1, 8)),
            planes=jnp.zeros((1, 1, 4)),
        )
        d_ana = _render(analytic)
        tris = transform_tris(jnp.array([0.0, 0.0, cz]), q, jnp.asarray(meshes.box_mesh(*h)))
        mesh_scene = SdfScene(
            spheres=jnp.zeros((1, 1, 4)),
            boxes=jnp.zeros((1, 1, 10)),
            capsules=jnp.zeros((1, 1, 8)),
            planes=jnp.zeros((1, 1, 4)),
            triangles=tris[None],
        )
        d_mesh = _render(mesh_scene)
        np.testing.assert_allclose(d_mesh, d_ana, atol=1e-6)


class TestRasterDepth:
    def test_chunked_matches_unchunked(self):
        tris = jnp.asarray(meshes.icosphere(0.005, 3)) + jnp.array([0.0, 0.0, 0.02])
        pix = jax.random.uniform(jax.random.PRNGKey(0), (64, 2), minval=-0.01, maxval=0.01)
        d1 = raster_depth(tris, pix, chunk=10_000)
        d2 = raster_depth(tris, pix, chunk=128)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-7)

    def test_zero_padding_is_inert(self):
        tris = meshes.box_mesh(0.004, 0.004, 0.004) + np.array([0, 0, 0.02], np.float32)
        pix = jax.random.uniform(jax.random.PRNGKey(1), (64, 2), minval=-0.006, maxval=0.006)
        d1 = raster_depth(jnp.asarray(tris), pix)
        d2 = raster_depth(jnp.asarray(meshes.pad_tris(tris, 256)), pix)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-7)

    def test_behind_camera_ignored(self):
        tris = jnp.asarray(meshes.box_mesh(0.004, 0.004, 0.001)) - jnp.array([0.0, 0.0, 0.05])
        d = raster_depth(tris, jnp.zeros((4, 2)))
        assert float(d.min()) > 1e8  # no hit

    def test_empty_soup(self):
        d = raster_depth(jnp.zeros((0, 3, 3)), jnp.zeros((5, 2)))
        assert d.shape == (5,) and float(d.min()) > 1e8

    def test_world_to_cam_roundtrip(self):
        key = jax.random.PRNGKey(2)
        tris = jax.random.normal(key, (7, 3, 3))
        pos = jnp.array([0.1, -0.2, 0.3])
        q = jnp.array([0.9, 0.1, 0.3, -0.2])
        q = q / jnp.linalg.norm(q)
        placed = transform_tris(pos, q, tris)
        back = world_tris_to_cam(pos, q, placed)
        np.testing.assert_allclose(np.asarray(back), np.asarray(tris), atol=1e-5)


class TestMeshLibrary:
    @pytest.mark.parametrize("name", meshes.MESH_SHAPE_NAMES)
    def test_generators_produce_valid_soup(self, name):
        tris = meshes.shape_mesh(name)
        assert tris.ndim == 3 and tris.shape[1:] == (3, 3)
        assert tris.dtype == np.float32
        assert np.isfinite(tris).all()
        # non-degenerate area for most triangles
        a = tris[:, 1] - tris[:, 0]
        b = tris[:, 2] - tris[:, 0]
        area = 0.5 * np.linalg.norm(np.cross(a, b), axis=-1)
        assert (area > 1e-12).mean() > 0.95

    def test_mesh_shapes_render_a_contact_disk(self):
        """Pressing the mesh sphere toward the camera yields a round hit."""
        tris = jnp.asarray(meshes.shape_mesh("sphere")) + jnp.array([0.0, 0.0, 0.02])
        sc = SdfScene.empty(1, num_triangles=tris.shape[0])
        sc = SdfScene(sc.spheres, sc.boxes, sc.capsules, sc.planes, tris[None])
        d = _render(sc)
        hit = d < FAR * 0.99
        assert 50 < hit.sum() < RES[0] * RES[1]

    def test_stl_roundtrip(self, tmp_path):
        """Write a binary STL of a box, load it back."""
        import struct

        tris = meshes.box_mesh(1.0, 2.0, 3.0)
        path = tmp_path / "box.stl"
        with open(path, "wb") as fh:
            fh.write(b"\0" * 80)
            fh.write(struct.pack("<I", len(tris)))
            for t in tris:
                fh.write(np.zeros(3, "<f4").tobytes())
                fh.write(t.astype("<f4").tobytes())
                fh.write(b"\0\0")
        loaded = meshes.load_stl(str(path))
        np.testing.assert_allclose(loaded, tris, atol=0)

    def test_reference_franka_stl_loads(self):
        """The reference's Franka finger collision STL parses to a sane soup."""
        import os

        path = (
            "/root/reference/source/tacex_assets/tacex_assets/data/Robots/Franka/"
            "GelSight_Mini/Gripper/meshes/collision/finger.stl"
        )
        if not os.path.exists(path):
            pytest.skip("reference tree not available")
        tris = meshes.load_stl(path)
        assert tris.shape[0] > 10
        assert np.isfinite(tris).all()
        assert np.abs(tris).max() < 1.0  # meters-scale part


class TestMeshOrientation:
    """All procedural generators must be closed, outward-oriented surfaces
    (the divergence-theorem mass/inertia integrals depend on it; regression:
    extrude()'s bottom caps and inner walls were winding-inverted, giving a
    tube +44% and a base-shifted cylinder +133% volume error)."""

    def test_signed_volumes(self):
        import numpy as np

        from tacex_tpu.assets import meshes as M

        def signed_vol(tris):
            a = tris[:, 0].astype(np.float64)
            b = tris[:, 1].astype(np.float64)
            c = tris[:, 2].astype(np.float64)
            return np.einsum("ij,ij->i", a, np.cross(b, c)).sum() / 6.0

        cases = {
            "cylinder": (M.cylinder_mesh(0.005, 0.02), np.pi * 0.005**2 * 0.02),
            "cylinder_shifted": (
                M.cylinder_mesh(0.005, 0.02) + np.array([0.01, 0.02, 0.005]),
                np.pi * 0.005**2 * 0.02,
            ),
            "tube": (M.tube_mesh(0.006, 0.004, 0.015), np.pi * (0.006**2 - 0.004**2) * 0.015),
            "cone": (M.cone_mesh(0.006, 0.012), np.pi * 0.006**2 * 0.012 / 3),
            "box": (M.box_mesh(0.01, 0.02, 0.03), 8 * 0.01 * 0.02 * 0.03),
            "icosphere": (M.icosphere(0.01, 2), 4 / 3 * np.pi * 0.01**3),
            "torus": (M.torus_mesh(0.01, 0.003), 2 * np.pi**2 * 0.01 * 0.003**2),
        }
        for name, (tris, expect) in cases.items():
            v = signed_vol(tris)
            assert v > 0, f"{name}: inward-oriented (signed volume {v:.3e})"
            assert abs(v / expect - 1) < 0.15, f"{name}: {v:.3e} vs {expect:.3e}"
