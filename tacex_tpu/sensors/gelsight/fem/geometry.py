"""Geometry utilities for the FEM marker-flow pipeline.

Counterpart of the reference's fem_based geometry helpers (reference
source/tacex/.../fem_based/sim/utils/geometry.py:6-138:
``estimate_rigid_transform`` (SVD/Kabsch), ``transform_pts``, ``in_hull``
(Delaunay), point-in-polygon). Host-side one-time precomputes stay numpy/
scipy; anything used per-step is jax-native and jittable.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def estimate_rigid_transform(src: jax.Array, dst: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Best-fit rigid transform (R, t) with dst ~= src @ R.T + t.

    Kabsch via SVD (reference geometry.py estimate_rigid_transform).
    src/dst: (..., P, 3). Jittable and batched.
    """
    src_c = src - src.mean(axis=-2, keepdims=True)
    dst_c = dst - dst.mean(axis=-2, keepdims=True)
    H = jnp.einsum("...pi,...pj->...ij", src_c, dst_c)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", Vt.swapaxes(-1, -2), U.swapaxes(-1, -2))))
    S = jnp.ones(H.shape[:-2] + (3,)).at[..., 2].set(d)
    R = jnp.einsum("...ji,...j,...kj->...ik", Vt, S, U)
    t = dst.mean(axis=-2) - jnp.einsum("...ij,...j->...i", R, src.mean(axis=-2))
    return R, t


def transform_pts(pts: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Apply (R, t): (..., P, 3) -> (..., P, 3) (reference transform_pts)."""
    return jnp.einsum("...ij,...pj->...pi", R, pts) + t[..., None, :]


def in_hull(points: np.ndarray, hull_points: np.ndarray) -> np.ndarray:
    """Boolean mask of ``points`` inside the convex hull of ``hull_points``.

    Host-side (scipy Delaunay, exactly the reference's in_hull) — used once
    at marker-binding time, never per-step.
    """
    from scipy.spatial import Delaunay

    tri = Delaunay(np.asarray(hull_points))
    return tri.find_simplex(np.asarray(points)) >= 0


def points_in_polygon(points: jax.Array, polygon: jax.Array) -> jax.Array:
    """Ray-casting point-in-polygon, jittable.

    points: (..., P, 2); polygon: (V, 2) counter-clockwise. Returns bool
    (..., P). (Reference's point-in-polygon helper, vectorized.)
    """
    px = points[..., 0][..., None]  # (..., P, 1)
    py = points[..., 1][..., None]
    x0 = polygon[:, 0]
    y0 = polygon[:, 1]
    x1 = jnp.roll(polygon[:, 0], -1)
    y1 = jnp.roll(polygon[:, 1], -1)
    cond = (y0 > py) != (y1 > py)
    denom = jnp.where(jnp.abs(y1 - y0) > 1e-12, y1 - y0, 1e-12)
    x_int = x0 + (py - y0) * (x1 - x0) / denom
    crossings = (cond & (px < x_int)).sum(axis=-1)
    return (crossings % 2) == 1


def random_rectangle_points(
    rng: np.random.Generator,
    center: tuple[float, float],
    half_w: float,
    half_h: float,
    rotation: float = 0.0,
) -> np.ndarray:
    """Corner points of a rotated rectangle (reference's rectangle gen used
    for marker-region sampling)."""
    c, s = np.cos(rotation), np.sin(rotation)
    R = np.array([[c, -s], [s, c]])
    corners = np.array(
        [[-half_w, -half_h], [half_w, -half_h], [half_w, half_h], [-half_w, half_h]]
    )
    return corners @ R.T + np.asarray(center)
