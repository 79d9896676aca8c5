"""Analytic contact generation + impulse resolution for simple shapes.

Replaces the PhysX contact solver for the task scenes (ball-on-plate with a
gel-pad pusher, pole-on-gelpad). Contacts are resolved with a projected
impulse model (normal impulse with Baumgarte positional stabilization +
Coulomb-clamped tangential impulse) — vectorized over envs and contact
pairs, jit/vmap-safe (masked, fixed contact capacity).

Shapes supported: dynamic spheres against static planes and kinematic
oriented boxes (the gelpad). The gelpad box may move (kinematic velocity
enters the relative velocity), matching the compliant-rigid gelpad scheme of
the reference's scalable path (SURVEY §2.6 "physx_rigid").
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...core import maths


@dataclasses.dataclass(frozen=True)
class SphereParams:
    """Sphere contact parameters.

    Fields may be python scalars (shared across envs) or (N,)-shaped arrays
    (per-env, e.g. domain-randomized — reference EventCfg,
    ball_rolling_taxim_fots.py:84-165). All contact math broadcasts either
    form against (N, ...) state.
    """

    radius: float
    mass: float | jax.Array
    restitution: float | jax.Array = 0.0
    friction: float | jax.Array = 0.8

    @property
    def inv_mass(self):
        return 1.0 / self.mass

    @property
    def inv_inertia(self):
        # solid sphere: I = 2/5 m r^2 (guarded: a zero radius — e.g. a
        # params object built for a non-sphere shape — must not divide by 0)
        return 1.0 / jnp.maximum(
            jnp.asarray(0.4 * self.mass * self.radius**2, jnp.float32), 1e-12
        )


def _col(x) -> jax.Array:
    """Scalar or (N,) parameter -> broadcastable against (..., 3) vectors."""
    return jnp.asarray(x, jnp.float32)[..., None]


def _resolve_contact(
    lin_vel: jax.Array,  # (..., 3) sphere linear velocity
    ang_vel: jax.Array,  # (..., 3)
    normal: jax.Array,  # (..., 3) contact normal (pointing away from surface, toward sphere)
    depth: jax.Array,  # (...,) penetration depth (>0 = penetrating)
    surf_vel: jax.Array,  # (..., 3) velocity of the surface at contact point
    r_vec: jax.Array,  # (..., 3) contact point - sphere center
    params: SphereParams,
    dt: float,
    baumgarte: float = 0.2,
    slop: float = 1e-5,
    lock_rotation: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (d_lin_vel, d_ang_vel) impulse response for one contact set.

    ``lock_rotation=True`` treats the friction as purely translational
    (k_t = 1/m, no angular response): the model for an opposing-pinch grasp,
    where the second finger's contact plus gel torsional friction lock the
    sphere's spin — resolving each pad independently with free rotation lets
    the ball creep through the pinch (the opposing angular terms cancel but
    each contact under-applies its linear share).
    """
    active = depth > 0.0

    # velocity of sphere material point at contact
    v_point = lin_vel + jnp.cross(ang_vel, r_vec)
    v_rel = v_point - surf_vel
    vn = jnp.sum(v_rel * normal, axis=-1)

    inv_m = params.inv_mass
    inv_i = params.inv_inertia

    # normal impulse (with positional bias)
    bias = baumgarte / dt * jnp.maximum(depth - slop, 0.0)
    jn = -(1.0 + params.restitution) * vn + bias
    # effective mass along normal for a sphere contact at r = -r n: pure 1/m
    jn = jnp.maximum(jn / inv_m, 0.0)
    jn = jnp.where(active, jn, 0.0)

    # tangential (friction) impulse
    vt = v_rel - vn[..., None] * normal
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    t_dir = vt / jnp.maximum(vt_norm, 1e-9)[..., None]
    # effective mass along tangent includes rotation: 1/m + r^2/I (r ⟂ t)
    k_t = inv_m if lock_rotation else inv_m + (params.radius**2) * inv_i
    jt_needed = vt_norm / k_t
    jt = jnp.minimum(jt_needed, params.friction * jn)
    jt = jnp.where(active, jt, 0.0)

    imp = jn[..., None] * normal - jt[..., None] * t_dir
    d_lin = imp * _col(inv_m)
    ang_imp = jn[..., None] * normal - (0.0 if lock_rotation else 1.0) * jt[..., None] * t_dir
    d_ang = jnp.cross(r_vec, ang_imp) * _col(inv_i)
    return d_lin, d_ang


def sphere_plane_contact(
    pos: jax.Array,  # (..., 3) sphere center
    lin_vel: jax.Array,
    ang_vel: jax.Array,
    plane_n: jax.Array,  # (3,) unit normal
    plane_d: float,  # plane offset: n.x = d
    params: SphereParams,
    dt: float,
) -> tuple[jax.Array, jax.Array]:
    n = jnp.broadcast_to(jnp.asarray(plane_n, pos.dtype), pos.shape)
    dist = jnp.sum(pos * n, axis=-1) - plane_d
    depth = params.radius - dist
    r_vec = -params.radius * n
    surf_vel = jnp.zeros_like(pos)
    return _resolve_contact(lin_vel, ang_vel, n, depth, surf_vel, r_vec, params, dt)


def closest_point_on_box(
    p: jax.Array,  # (..., 3) query point, world
    box_pos: jax.Array,  # (..., 3)
    box_quat: jax.Array,  # (..., 4)
    half_extents: jax.Array,  # (3,) or (..., 3)
) -> jax.Array:
    local = maths.quat_apply_inverse(box_quat, p - box_pos)
    clamped = jnp.clip(local, -half_extents, half_extents)
    return maths.quat_apply(box_quat, clamped) + box_pos


def sphere_box_contact(
    pos: jax.Array,  # (..., 3) sphere center
    lin_vel: jax.Array,
    ang_vel: jax.Array,
    box_pos: jax.Array,  # (..., 3) kinematic box pose
    box_quat: jax.Array,  # (..., 4)
    box_vel: jax.Array,  # (..., 3) kinematic box linear velocity
    half_extents: jax.Array,  # (3,)
    params: SphereParams,
    dt: float,
    stiffness_scale: float = 1.0,
    lock_rotation: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Sphere vs kinematic oriented box (e.g. the gelpad pressing a ball).

    ``stiffness_scale`` < 1 softens the positional correction, approximating
    gel compliance (the reference's "compliant rigid" gelpad contact).
    ``lock_rotation``: see ``_resolve_contact`` (opposing-pinch grasps).
    """
    cp = closest_point_on_box(pos, box_pos, box_quat, half_extents)
    delta = pos - cp
    dist = jnp.linalg.norm(delta, axis=-1)
    # if center inside the box, push out along the face normal of least depth
    local = maths.quat_apply_inverse(box_quat, pos - box_pos)
    inside = jnp.all(jnp.abs(local) <= half_extents, axis=-1)
    face_dist = half_extents - jnp.abs(local)
    face_axis = jnp.argmin(face_dist, axis=-1)
    sign = jnp.sign(jnp.take_along_axis(local, face_axis[..., None], -1))[..., 0]
    face_n_local = jax.nn.one_hot(face_axis, 3, dtype=pos.dtype) * sign[..., None]
    face_n = maths.quat_apply(box_quat, face_n_local)
    n_out = delta / jnp.maximum(dist, 1e-9)[..., None]
    normal = jnp.where(inside[..., None], face_n, n_out)
    depth = jnp.where(
        inside,
        params.radius + jnp.min(face_dist, axis=-1),
        params.radius - dist,
    )
    r_vec = -params.radius * normal
    return _resolve_contact(
        lin_vel, ang_vel, normal, depth, box_vel, r_vec, params, dt,
        baumgarte=0.2 * stiffness_scale, lock_rotation=lock_rotation,
    )


def sphere_box_penetration(
    pos: jax.Array, box_pos: jax.Array, box_quat: jax.Array, half_extents: jax.Array, radius: float
) -> jax.Array:
    """(...,) penetration depth of a sphere into a box (>0 = contact)."""
    cp = closest_point_on_box(pos, box_pos, box_quat, half_extents)
    return radius - jnp.linalg.norm(pos - cp, axis=-1)
