"""Signed-distance functions for analytic rigid scenes.

Companion to render/depth_camera.py's ray intersections: the same
fixed-capacity primitive soup (spheres / oriented boxes / capsules / planes)
evaluated as signed distances — used by the IPC soft-body solver for
gel-vs-rigid barrier contact. All functions are smooth away from the
surface, jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import maths

BIG = 1e9


def _safe_norm(v: jax.Array, axis: int = -1) -> jax.Array:
    """sqrt(sum(v^2) + tiny): NaN-free gradient at v = 0. Plain norm has a
    NaN derivative at zero which leaks through min()/where() into autodiff
    even for non-selected (disabled-primitive) branches."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis) + 1e-20)


def sdf_spheres(p: jax.Array, spheres: jax.Array) -> jax.Array:
    """(P, 3) points vs (S, 4) spheres -> (P, S) signed distances."""
    c, r = spheres[:, :3], spheres[:, 3]
    d = _safe_norm(p[:, None, :] - c[None, :, :]) - r[None, :]
    return jnp.where(r[None, :] > 0, d, BIG)


def sdf_planes(p: jax.Array, planes: jax.Array) -> jax.Array:
    """(P, 3) vs (Pl, 4) planes (n, d): signed distance n.x - d."""
    n, off = planes[:, :3], planes[:, 3]
    d = jnp.einsum("pk,lk->pl", p, n) - off[None, :]
    enabled = (n**2).sum(-1) > 0.5
    return jnp.where(enabled[None, :], d, BIG)


def sdf_boxes(p: jax.Array, boxes: jax.Array) -> jax.Array:
    """(P, 3) vs (B, 10) oriented boxes -> (P, B) exact signed distances."""
    c, q, h = boxes[:, :3], boxes[:, 3:7], boxes[:, 7:10]
    local = maths.quat_apply_inverse(q[None, :, :], p[:, None, :] - c[None, :, :])  # (P,B,3)
    a = jnp.abs(local) - h[None, :, :]
    outside = _safe_norm(jnp.maximum(a, 0.0))
    inside = jnp.minimum(jnp.max(a, axis=-1), 0.0)
    d = outside + inside
    return jnp.where(boxes[None, :, 7] > 0, d, BIG)


def sdf_capsules(p: jax.Array, caps: jax.Array) -> jax.Array:
    """(P, 3) vs (C, 8) capsules -> (P, C)."""
    a, b, r, en = caps[:, 0:3], caps[:, 3:6], caps[:, 6], caps[:, 7]
    ab = b - a
    ab2 = jnp.maximum((ab**2).sum(-1), 1e-12)
    t = jnp.einsum("pck,ck->pc", p[:, None, :] - a[None, :, :], ab) / ab2[None, :]
    t = jnp.clip(t, 0.0, 1.0)
    closest = a[None, :, :] + t[..., None] * ab[None, :, :]
    d = _safe_norm(p[:, None, :] - closest) - r[None, :]
    return jnp.where(en[None, :] > 0.5, d, BIG)


def scene_sdf(
    p: jax.Array,  # (P, 3)
    spheres: jax.Array,
    boxes: jax.Array,
    capsules: jax.Array,
    planes: jax.Array,
) -> jax.Array:
    """(P,) min signed distance of each point to the primitive soup."""
    d = jnp.concatenate(
        [
            sdf_spheres(p, spheres),
            sdf_boxes(p, boxes),
            sdf_capsules(p, capsules),
            sdf_planes(p, planes),
        ],
        axis=-1,
    )
    return d.min(axis=-1)
