"""Tetrahedral mesh generation for soft bodies.

The reference tetrahedralizes arbitrary USD meshes with wildmeshing/fTetWild
at scene-build time (reference source/tacex_uipc/tacex_uipc/utils/
mesh_gen.py:17-106) or loads precomputed tet attributes. The gel pads this
framework simulates are boxes, for which a *structured* hex->tet subdivision
is better on TPU: deterministic topology shared across all envs (one mesh,
vmapped states), well-conditioned elements, no external meshing dependency.
Arbitrary precomputed (points, tets) arrays are accepted by the solver too.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class TetMesh:
    """Static mesh topology (numpy; constants under jit)."""

    points: np.ndarray  # (V, 3) float32 rest positions
    tets: np.ndarray  # (T, 4) int32
    surface_tris: np.ndarray  # (S, 3) int32, outward-oriented
    surface_verts: np.ndarray  # (Vs,) int32 unique surface vertex ids

    @property
    def num_vertices(self) -> int:
        return self.points.shape[0]

    def rest_volumes(self) -> np.ndarray:
        p = self.points
        t = self.tets
        d1 = p[t[:, 1]] - p[t[:, 0]]
        d2 = p[t[:, 2]] - p[t[:, 0]]
        d3 = p[t[:, 3]] - p[t[:, 0]]
        return np.einsum("ij,ij->i", np.cross(d1, d2), d3) / 6.0


def box_tet_mesh(
    size: tuple[float, float, float],
    resolution: tuple[int, int, int] = (8, 10, 3),
    center: tuple[float, float, float] = (0.0, 0.0, 0.0),
    use_native: bool = True,
) -> TetMesh:
    """Structured box tet mesh: (nx, ny, nz) cells, 6 tets per hex cell.

    The 6-tet (Kuhn) subdivision is orientation-consistent across cells, so
    neighboring tets share faces and the extracted boundary is watertight.
    Uses the C++ geometry runtime (native/libtacex_geom.so) when built; the
    numpy path below is the reference implementation and fallback.
    """
    if use_native:
        try:
            from ... import native

            if native.available():
                points, tets = native.box_tet_mesh(resolution, size, center)
                surface_tris = native.extract_surface(tets, points)
                return TetMesh(
                    points=points,
                    tets=tets,
                    surface_tris=surface_tris,
                    surface_verts=np.unique(surface_tris).astype(np.int32),
                )
        except Exception:  # pragma: no cover - fall back to numpy
            pass
    nx, ny, nz = resolution
    sx, sy, sz = size
    xs = np.linspace(-sx / 2, sx / 2, nx + 1)
    ys = np.linspace(-sy / 2, sy / 2, ny + 1)
    zs = np.linspace(-sz / 2, sz / 2, nz + 1)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    points = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3) + np.asarray(center)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    # Kuhn triangulation of the unit cube (6 tets around the main diagonal
    # v0 -> v6); consistent across cells without parity flips.
    corner_offsets = [
        (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
        (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
    ]
    kuhn = [
        (0, 1, 2, 6), (0, 2, 3, 6), (0, 3, 7, 6),
        (0, 7, 4, 6), (0, 4, 5, 6), (0, 5, 1, 6),
    ]
    tets = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                corners = [vid(i + di, j + dj, k + dk) for (di, dj, dk) in corner_offsets]
                for a, b, c, d in kuhn:
                    tets.append((corners[a], corners[b], corners[c], corners[d]))
    tets = np.asarray(tets, np.int32)

    # fix orientation: positive volume
    p = points
    d1 = p[tets[:, 1]] - p[tets[:, 0]]
    d2 = p[tets[:, 2]] - p[tets[:, 0]]
    d3 = p[tets[:, 3]] - p[tets[:, 0]]
    vol = np.einsum("ij,ij->i", np.cross(d1, d2), d3)
    flip = vol < 0
    tets[flip, 1], tets[flip, 2] = tets[flip, 2].copy(), tets[flip, 1].copy()

    surface_tris = extract_surface(tets, points)
    surface_verts = np.unique(surface_tris)
    return TetMesh(
        points=points.astype(np.float32),
        tets=tets,
        surface_tris=surface_tris.astype(np.int32),
        surface_verts=surface_verts.astype(np.int32),
    )


def extract_surface(tets: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Boundary faces (appearing once), oriented outward.

    Equivalent of libuipc's label_surface + label_triangle_orient +
    flip_inward_triangles pipeline (reference uipc_object.py:181-187).
    """
    faces = np.concatenate(
        [
            tets[:, [0, 2, 1]],
            tets[:, [0, 1, 3]],
            tets[:, [0, 3, 2]],
            tets[:, [1, 2, 3]],
        ]
    )
    owner = np.repeat(np.arange(len(tets)), 4)
    key = np.sort(faces, axis=1)
    _, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
    boundary = counts[inv] == 1
    bfaces = faces[boundary]
    bowner = owner[boundary]

    # orient outward: normal must point away from the owning tet's centroid
    centroids = points[tets[bowner]].mean(axis=1)
    v0, v1, v2 = points[bfaces[:, 0]], points[bfaces[:, 1]], points[bfaces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    outward = np.einsum("ij,ij->i", n, v0 - centroids) > 0
    bfaces[~outward] = bfaces[~outward][:, [0, 2, 1]]
    return bfaces
