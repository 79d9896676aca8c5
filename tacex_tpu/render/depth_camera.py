"""Batched analytic depth camera — the TiledCamera / RTX replacement.

The reference gets per-sensor depth maps from an RTX-rendered Isaac
``TiledCamera`` (reference source/tacex/tacex/gelsight_sensor.py:203-319).
Here scene geometry is analytic (spheres / boxes / capsules / planes held in
fixed-capacity arrays), and depth is computed by *exact* ray-primitive
intersection — no ray-marching loops, no BVH: one fused vectorized program
per frame, vmapped over environments. For the near-field tactile camera we
cast parallel rays along the camera axis over the pixel grid (orthographic),
which is also the geometry Taxim's calibration assumes for its height maps.

Conventions: camera frame has +Z forward (into the scene), +X right (image
width), +Y down (image height). ``extent`` is the physical (width, height)
of the imaged rectangle at the gel, in meters.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import maths
from . import mesh_raster

BIG = 1e9


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SdfScene:
    """Fixed-capacity primitive soup, batched over a leading env axis.

    spheres: (N, S, 4)  -> center xyz, radius (radius <= 0 disables)
    boxes:   (N, B, 10) -> center xyz, quat wxyz, half-extents xyz
                           (half-extent x <= 0 disables)
    capsules:(N, C, 8)  -> endpoint a xyz, endpoint b xyz, radius, enabled
    planes:  (N, P, 4)  -> unit normal xyz, offset d (n.x = d), normal zeroed
                           disables
    triangles: (N, T, 3, 3) optional world-space triangle soup (padded with
                           zero/degenerate triangles) rasterized by
                           render.mesh_raster — the RTX-mesh replacement.
    """

    spheres: jax.Array
    boxes: jax.Array
    capsules: jax.Array
    planes: jax.Array
    triangles: jax.Array | None = None

    @staticmethod
    def empty(
        num_envs: int,
        num_spheres=1,
        num_boxes=1,
        num_capsules=1,
        num_planes=1,
        num_triangles=0,
    ) -> "SdfScene":
        return SdfScene(
            spheres=jnp.zeros((num_envs, num_spheres, 4)),
            boxes=jnp.zeros((num_envs, num_boxes, 10)),
            capsules=jnp.zeros((num_envs, num_capsules, 8)),
            planes=jnp.zeros((num_envs, num_planes, 4)),
            triangles=jnp.zeros((num_envs, num_triangles, 3, 3)) if num_triangles else None,
        )


def _ray_sphere(o: jax.Array, d: jax.Array, sph: jax.Array) -> jax.Array:
    """Nearest positive hit distance of rays (P, 3) vs spheres (S, 4) -> (P, S)."""
    c, r = sph[:, :3], sph[:, 3]
    oc = o[:, None, :] - c[None, :, :]  # (P, S, 3)
    b = jnp.einsum("psk,pk->ps", oc, d)
    cq = (oc**2).sum(-1) - (r**2)[None, :]
    disc = b * b - cq
    valid = (disc >= 0) & (r > 0)[None, :]
    sq = jnp.sqrt(jnp.where(valid, disc, 0.0))
    t = -b - sq
    t = jnp.where(valid & (t > 0), t, BIG)
    return t


def _ray_plane(o: jax.Array, d: jax.Array, pl: jax.Array) -> jax.Array:
    """(P, 3) rays vs (Pl, 4) planes -> (P, Pl)."""
    n, off = pl[:, :3], pl[:, 3]
    denom = jnp.einsum("pk,lk->pl", d, n)
    num = off[None, :] - jnp.einsum("pk,lk->pl", o, n)
    enabled = (n**2).sum(-1) > 0.5
    t = num / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    t = jnp.where(enabled[None, :] & (jnp.abs(denom) > 1e-9) & (t > 0), t, BIG)
    return t


def _ray_box(o: jax.Array, d: jax.Array, box: jax.Array) -> jax.Array:
    """(P, 3) rays vs (B, 10) oriented boxes (slab method) -> (P, B)."""
    c, q, h = box[:, :3], box[:, 3:7], box[:, 7:10]
    # transform rays into each box frame
    ol = maths.quat_apply_inverse(q[None, :, :], o[:, None, :] - c[None, :, :])  # (P, B, 3)
    dl = maths.quat_apply_inverse(q[None, :, :], jnp.broadcast_to(d[:, None, :], ol.shape))
    inv = 1.0 / jnp.where(jnp.abs(dl) > 1e-9, dl, 1e-9)
    t0 = (-h[None] - ol) * inv
    t1 = (h[None] - ol) * inv
    tmin = jnp.minimum(t0, t1).max(-1)
    tmax = jnp.maximum(t0, t1).min(-1)
    enabled = box[:, 7] > 0
    hit = enabled[None, :] & (tmax >= jnp.maximum(tmin, 0.0))
    t = jnp.where(tmin > 0, tmin, tmax)  # inside the box -> exit face
    return jnp.where(hit & (t > 0), t, BIG)


def _ray_capsule(o: jax.Array, d: jax.Array, cap: jax.Array) -> jax.Array:
    """(P, 3) rays vs (C, 8) capsules -> (P, C). Infinite-cylinder solve
    clamped to the segment, plus end-cap spheres."""
    a, b, r, en = cap[:, 0:3], cap[:, 3:6], cap[:, 6], cap[:, 7]
    ab = b - a
    ab2 = jnp.maximum((ab**2).sum(-1), 1e-12)
    ao = o[:, None, :] - a[None, :, :]  # (P, C, 3)
    dd = jnp.broadcast_to(d[:, None, :], ao.shape)
    # components orthogonal to the axis
    ab_n = ab / jnp.sqrt(ab2)[:, None]
    d_par = jnp.einsum("pck,ck->pc", dd, ab_n)
    o_par = jnp.einsum("pck,ck->pc", ao, ab_n)
    d_perp = dd - d_par[..., None] * ab_n[None]
    o_perp = ao - o_par[..., None] * ab_n[None]
    A = (d_perp**2).sum(-1)
    B = 2 * (d_perp * o_perp).sum(-1)
    C = (o_perp**2).sum(-1) - (r**2)[None, :]
    disc = B * B - 4 * A * C
    okA = A > 1e-12
    sq = jnp.sqrt(jnp.where(disc >= 0, disc, 0.0))
    t_cyl = (-B - sq) / jnp.where(okA, 2 * A, 1.0)
    # clamp: hit must project within the segment
    s = o_par + t_cyl * d_par
    seg_len = jnp.sqrt(ab2)
    in_seg = (s >= 0) & (s <= seg_len[None, :])
    t_cyl = jnp.where(okA & (disc >= 0) & in_seg & (t_cyl > 0), t_cyl, BIG)
    # end caps
    sph_a = jnp.concatenate([a, r[:, None]], -1)
    sph_b = jnp.concatenate([b, r[:, None]], -1)
    t_caps = jnp.minimum(_ray_sphere(o, d, sph_a), _ray_sphere(o, d, sph_b))
    t = jnp.minimum(t_cyl, t_caps)
    return jnp.where(en[None, :] > 0.5, t, BIG)


def render_depth(
    cam_pos: jax.Array,  # (3,) camera position, world
    cam_quat: jax.Array,  # (4,) camera orientation (wxyz), +Z forward
    scene_spheres: jax.Array,
    scene_boxes: jax.Array,
    scene_capsules: jax.Array,
    scene_planes: jax.Array,
    resolution: tuple[int, int],  # (w, h)
    extent: tuple[float, float],  # (width_m, height_m) of the imaged window
    far: float,
    scene_triangles: jax.Array | None = None,  # (T, 3, 3) world-space
) -> jax.Array:
    """Orthographic depth (h, w) in meters for ONE env (vmap over envs)."""
    w, h = resolution
    ex, ey = extent
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * ex - ex / 2
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * ey - ey / 2
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    origins_cam = jnp.stack([xx, yy, jnp.zeros_like(xx)], -1).reshape(-1, 3)  # (P, 3)
    o = maths.quat_apply(cam_quat[None, :], origins_cam) + cam_pos[None, :]
    fwd = maths.quat_apply(cam_quat, jnp.array([0.0, 0.0, 1.0]))
    d = jnp.broadcast_to(fwd, o.shape)

    t = jnp.concatenate(
        [
            _ray_sphere(o, d, scene_spheres),
            _ray_box(o, d, scene_boxes),
            _ray_capsule(o, d, scene_capsules),
            _ray_plane(o, d, scene_planes),
        ],
        axis=-1,
    ).min(-1)
    if scene_triangles is not None and scene_triangles.shape[0] > 0:
        tris_cam = mesh_raster.world_tris_to_cam(cam_pos, cam_quat, scene_triangles)
        t_mesh = mesh_raster.raster_depth(tris_cam, origins_cam[:, :2])
        t = jnp.minimum(t, t_mesh)
    t = jnp.minimum(t, far)
    return t.reshape(h, w)


def render_depth_batch(
    cam_pos: jax.Array,  # (N, 3)
    cam_quat: jax.Array,  # (N, 4)
    scene: SdfScene,
    resolution: tuple[int, int],
    extent: tuple[float, float],
    far: float,
) -> jax.Array:
    """(N, h, w) depth for the whole env batch."""
    if scene.triangles is not None and scene.triangles.shape[1] > 0:
        return jax.vmap(
            lambda p, q, s, b, c, pl, tr: render_depth(
                p, q, s, b, c, pl, resolution, extent, far, tr
            )
        )(
            cam_pos,
            cam_quat,
            scene.spheres,
            scene.boxes,
            scene.capsules,
            scene.planes,
            scene.triangles,
        )
    return jax.vmap(
        lambda p, q, s, b, c, pl: render_depth(p, q, s, b, c, pl, resolution, extent, far)
    )(cam_pos, cam_quat, scene.spheres, scene.boxes, scene.capsules, scene.planes)
