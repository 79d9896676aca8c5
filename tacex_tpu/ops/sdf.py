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


def sdf_threads(p: jax.Array, threads: jax.Array) -> jax.Array:
    """(P, 3) points vs (T, 12) helical threads -> (P, T) signed distances.

    Analytic ISO-like thread surface (the real asset geometry the reference's
    Factory NutThread/GearMesh run against via PhysX SDF collision,
    factory_env_cfg.py:192-213) — a triangular thread profile swept along a
    helix, evaluated in helicoidal coordinates where the surface is exactly
    a 2D periodic polyline:

      u = z - pitch * theta / 2pi   (helix-following axial coordinate)
      fold u to u' in [0, pitch/2] (the profile is mirror-periodic), then
      the surface is ONE straight flank segment from (0, r_mid + s*depth/2)
      to (pitch/2, r_mid - s*depth/2); distance = 2D point-segment distance
      in the (u, r) half-plane. The neglected arc-direction foreshortening
      is O(helix angle^2) — well under d_hat for machine-screw pitches.

    Layout per thread: [base(3), axis(3), r_mid, depth, pitch, z0, z1, side]
    with side = +1 an EXTERNAL thread (bolt: material inside the surface),
    side = -1 an INTERNAL thread (nut bore: material outside), side = 0
    disabled. Outside the threaded span [z0, z1] the depth ramps to zero
    over pitch/2, leaving a smooth r_mid cylinder (bolt shank / bore).
    """
    base, axis = threads[:, 0:3], threads[:, 3:6]
    r_mid, depth, pitch = threads[:, 6], threads[:, 7], threads[:, 8]
    z0, z1, side = threads[:, 9], threads[:, 10], threads[:, 11]
    axis = axis / _safe_norm(axis)[..., None]
    # orthonormal frame per thread (deterministic, smooth: seed with the
    # world axis least aligned with the thread axis)
    seed = jnp.where(
        (jnp.abs(axis[:, 0]) < 0.9)[:, None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), axis.shape),
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), axis.shape),
    )
    b1 = jnp.cross(axis, seed)
    b1 = b1 / _safe_norm(b1)[..., None]
    b2 = jnp.cross(axis, b1)

    rel = p[:, None, :] - base[None, :, :]  # (P, T, 3)
    z = jnp.einsum("ptk,tk->pt", rel, axis)
    x1 = jnp.einsum("ptk,tk->pt", rel, b1)
    x2 = jnp.einsum("ptk,tk->pt", rel, b2)
    r2 = x1 * x1 + x2 * x2
    rr = jnp.sqrt(r2 + 1e-20)
    # NaN-free atan2 gradient at the axis (see _safe_norm rationale)
    on_axis = r2 < 1e-16
    theta = jnp.arctan2(
        jnp.where(on_axis, 0.0, x2), jnp.where(on_axis, 1.0, x1)
    )

    pitch_s = jnp.maximum(pitch, 1e-9)[None, :]
    u = z - pitch_s * theta / (2.0 * jnp.pi)
    f = u / pitch_s - jnp.floor(u / pitch_s)  # frac in [0, 1)
    uf = jnp.minimum(f, 1.0 - f) * pitch_s  # folded to [0, pitch/2]

    # depth ramp outside the threaded span
    ramp = jnp.clip(
        1.0 + jnp.minimum(z - z0[None, :], z1[None, :] - z) / (0.5 * pitch_s),
        0.0,
        1.0,
    )
    half_d = 0.5 * depth[None, :] * ramp * side[None, :]  # signed crest offset

    # 2D distance to flank segment A=(0, r_mid+half_d) -> B=(pitch/2, r_mid-half_d)
    ax_, ay = 0.0, r_mid[None, :] + half_d
    bx, by = 0.5 * pitch_s, r_mid[None, :] - half_d
    ex, ey = bx - ax_, by - ay
    px_, py = uf - ax_, rr - ay
    t = jnp.clip((px_ * ex + py * ey) / (ex * ex + ey * ey + 1e-20), 0.0, 1.0)
    dx, dy = px_ - t * ex, py - t * ey
    dist = jnp.sqrt(dx * dx + dy * dy + 1e-20)
    # free space: r beyond the profile on the +side direction
    R_prof = ay + (by - ay) * (uf / (0.5 * pitch_s))
    sign = jnp.sign(side[None, :] * (rr - R_prof))
    d = sign * dist
    return jnp.where(side[None, :] != 0, d, BIG)


def sdf_gear(p: jax.Array, gears: jax.Array) -> jax.Array:
    """(P, 3) points vs (G, 8) z-axis spur gears -> (P, G) distances.

    The fixed neighbor gears of the Factory GearMesh station (the reference
    task meshes the held medium gear against gears already on the base,
    factory_tasks_cfg.py gear assets via PhysX SDF collision). A gear is a
    cylinder whose radius alternates between r_tip (tooth) and r_root
    (gap) around the circumference:

      r(theta) = r_root + (r_tip - r_root) * sigma(cos(n (theta - phase)))

    with sigma a clamped linear smoothing (tooth flanks ~0.4 rad of cosine
    wide) so autodiff normals exist on the flanks. The field is the RADIAL
    distance rho - r(theta) intersected with the z-slab — not a true
    Euclidean SDF near the flank walls (error O(flank slope)), but the
    factory contact model only needs penetration depth + an outward
    gradient, and tooth-over-tooth landing uses the exact top-face term.

    Layout per gear: [cx, cy, r_root, r_tip, n_teeth, z0, z1, phase].
    """
    c = gears[:, 0:2]
    r_root, r_tip = gears[:, 2], gears[:, 3]
    n_teeth = gears[:, 4]
    z0, z1, phase = gears[:, 5], gears[:, 6], gears[:, 7]
    rel = p[:, None, 0:2] - c[None, :, :]  # (P, G, 2)
    rho2 = (rel**2).sum(-1)
    rho = jnp.sqrt(rho2 + 1e-20)
    on_axis = rho2 < 1e-16
    theta = jnp.arctan2(
        jnp.where(on_axis, 1.0, rel[..., 1]), jnp.where(on_axis, 1.0, rel[..., 0])
    )
    cw = jnp.cos(n_teeth[None, :] * (theta - phase[None, :]))
    sigma = jnp.clip(0.5 + cw / 0.8, 0.0, 1.0)
    r_surf = r_root[None, :] + (r_tip - r_root)[None, :] * sigma
    d_radial = rho - r_surf
    z = p[:, None, 2]
    d = jnp.maximum(d_radial, jnp.maximum(z0[None, :] - z, z - z1[None, :]))
    return d


def scene_sdf(
    p: jax.Array,  # (P, 3)
    spheres: jax.Array,
    boxes: jax.Array,
    capsules: jax.Array,
    planes: jax.Array,
    threads: jax.Array | None = None,
) -> jax.Array:
    """(P,) min signed distance of each point to the primitive soup."""
    parts = [
        sdf_spheres(p, spheres),
        sdf_boxes(p, boxes),
        sdf_capsules(p, capsules),
        sdf_planes(p, planes),
    ]
    if threads is not None:
        parts.append(sdf_threads(p, threads))
    d = jnp.concatenate(parts, axis=-1)
    return d.min(axis=-1)
