"""Batched implicit FEM soft-body solver with barrier contact (IPC-style).

The TPU-native replacement for libuipc's CUDA engine (reference SURVEY §2.2
row 1: penetration-free FEM + barrier-energy Newton with line search, PCG
linear solve). Architecture, re-thought for XLA instead of translated:

  * One soft body topology shared by ALL environments (the gel pad), state
    ``(N, V, 3)``; the entire Newton loop vmaps over N — the reference could
    only ever run ONE env (docs/source/showcases/ball_rolling.md:23); batched
    solves are this rebuild's core contribution (SURVEY §7.3).
  * Incremental potential  E(x) = 1/(2 dt^2) ||x - x_tilde||^2_M
    + elastic(x) + barrier(sdf(x)) + attachments(x); gradients via autodiff.
  * Newton directions from matrix-free conjugate gradient on autodiff
    Hessian-vector products — no sparse assembly, no preconditioner
    machinery: dense fused tensor ops, exactly what the MXU/VPU want.
  * Contact is gel-vs-analytic-rigid-SDF (sphere/box/capsule/plane): the
    log-barrier of IPC applied to surface-vertex signed distances. The
    feasibility ("CCD") check in the line search is d(x) > 0 for all surface
    vertices — exact for convex primitives at these step sizes, with no BVH
    or element pair lists (static shapes everywhere).
  * Newton iterations are a fixed unrolled count with per-env convergence
    masking (converged envs take zero-length steps) — compiler-friendly
    control flow instead of data-dependent loops.
  * Friction: IPC-style lagged Coulomb — tangential quadratic mollifier
    scaled by the previous iterate's normal barrier force.

Solver knob names follow UipcSimCfg (reference uipc_sim.py:32-131):
``d_hat``, ``newton_max_iter``, ``velocity_tol``, ``friction ratio``.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import configclass
from ...ops import sdf as sdf_ops
from .fem import lame_params, lumped_masses, precompute_rest, stable_neo_hookean_energy
from .mesh import TetMesh


def _point_triangle_closest(p, a, b, c):
    """Closest point on triangle (a,b,c) to p, broadcast over leading dims
    (Ericson RTCD 5.1.5 as a jnp.where cascade)."""
    ab, ac, ap = b - a, c - a, p - a

    def dot(u, v):
        return (u * v).sum(-1)

    d1, d2 = dot(ab, ap), dot(ac, ap)
    bp = p - b
    d3, d4 = dot(ab, bp), dot(ac, bp)
    cp = p - c
    d5, d6 = dot(ab, cp), dot(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom_f = jnp.maximum(va + vb + vc, 1e-30)
    v_f = (vb / denom_f)[..., None]
    w_f = (vc / denom_f)[..., None]

    # edge parameterizations (guarded divisions)
    t_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) > 1e-30, d1 - d3, 1e-30), 0.0, 1.0)[..., None]
    t_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) > 1e-30, d2 - d6, 1e-30), 0.0, 1.0)[..., None]
    t_bc_num = d4 - d3
    t_bc_den = (d4 - d3) + (d5 - d6)
    t_bc = jnp.clip(
        t_bc_num / jnp.where(jnp.abs(t_bc_den) > 1e-30, t_bc_den, 1e-30), 0.0, 1.0
    )[..., None]

    q = a + v_f * ab + w_f * ac  # face region default
    # region cascade (later writes win -> order from face to vertices)
    q_edge_ab = a + t_ab * ab
    q_edge_ac = a + t_ac * ac
    q_edge_bc = b + t_bc * (c - b)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    at_a = (d1 <= 0) & (d2 <= 0)
    at_b = (d3 >= 0) & (d4 <= d3)
    at_c = (d6 >= 0) & (d5 <= d6)

    q = jnp.where(on_bc[..., None], q_edge_bc, q)
    q = jnp.where(on_ac[..., None], q_edge_ac, q)
    q = jnp.where(on_ab[..., None], q_edge_ab, q)
    q = jnp.where(at_c[..., None], c, q)
    q = jnp.where(at_b[..., None], b, q)
    q = jnp.where(at_a[..., None], a, q)
    return q


def _point_triangle_distance(p, a, b, c):
    """Unsigned distance point->triangle; eps-padded sqrt keeps autodiff
    finite at the (never active in practice) zero-distance point."""
    q = _point_triangle_closest(p, a, b, c)
    return jnp.sqrt(((p - q) ** 2).sum(-1) + 1e-18)


def _segment_segment_closest(p1, p2, q1, q2):
    """Closest points between segments [p1,p2] and [q1,q2], broadcast over
    leading dims (Ericson RTCD 5.1.9 as a branch-free jnp.where cascade).
    Returns (cp, cq) — the closest point on each segment."""
    d1, d2 = p2 - p1, q2 - q1
    r = p1 - q1

    def dot(u, v):
        return (u * v).sum(-1)

    a = dot(d1, d1)
    e = dot(d2, d2)
    f = dot(d2, r)
    c = dot(d1, r)
    b = dot(d1, d2)
    # SCALE-INVARIANT parallelism guard: denom = a e - b^2 = a e sin^2(theta)
    # in f32 is ~1e-14 (roundoff, units L^4) for exactly-parallel mm-scale
    # edges — an absolute threshold either mis-takes the division branch
    # (second derivative overflows -> NaN Hessians) or rejects genuine
    # contacts. Normalize by a e so the guard is sin^2(theta) > 1e-4
    # (~0.6 deg); below it the s=0 endpoint solve is exact enough and the
    # parallel-edge mollifier kills the pair's barrier anyway.
    ae = jnp.maximum(a * e, 1e-30)
    sin2 = jnp.maximum(1.0 - (b * b) / ae, 0.0)
    num_n = (b * f - c * e) / ae
    s_gen = jnp.clip(num_n / jnp.maximum(sin2, 1e-4), 0.0, 1.0)
    s = jnp.where(sin2 > 1e-4, s_gen, 0.0)
    # t for that s, then clamp and recompute s (the standard two-pass fixup)
    t = jnp.where(e > 1e-20, (b * s + f) / jnp.where(e > 1e-20, e, 1.0), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s2 = jnp.where(a > 1e-20, (b * t_cl - c) / jnp.where(a > 1e-20, a, 1.0), 0.0)
    s_cl = jnp.clip(s2, 0.0, 1.0)
    s_fin = jnp.where((t != t_cl), s_cl, s)
    cp = p1 + s_fin[..., None] * d1
    cq = q1 + t_cl[..., None] * d2
    return cp, cq


def _edge_edge_distance(p1, p2, q1, q2):
    """Unsigned distance between two segments (eps-padded sqrt for AD)."""
    cp, cq = _segment_segment_closest(p1, p2, q1, q2)
    return jnp.sqrt(((cp - cq) ** 2).sum(-1) + 1e-18)


def _edge_pair_crossed(p1a, p2a, q1a, q2a, p1b, p2b, q1b, q2b, eps: float = 1e-3):
    """True where edge pair (p, q) CROSSED between state a and state b.

    The poor man's CCD for edge-edge barriers (counterpart of
    _segment_crosses_triangle for PT pairs): the unsigned segment-segment
    distance is positive again after a pass-through, so the line search
    must reject trials whose signed line-line gap flips sign while the
    mutual closest points lie within both segments. Near-parallel pairs
    (sin^2 < 1e-4) are excluded — their gap sign is noise and their
    barrier is mollified away anyway."""

    def gap_params(p1, p2, q1, q2):
        d1, d2 = p2 - p1, q2 - q1
        n = jnp.cross(d1, d2)
        nn = jnp.sqrt((n * n).sum(-1) + 1e-30)
        g = ((q1 - p1) * n).sum(-1) / nn
        r = p1 - q1
        a = (d1 * d1).sum(-1)
        e = (d2 * d2).sum(-1)
        b = (d1 * d2).sum(-1)
        c = (d1 * r).sum(-1)
        f = (d2 * r).sum(-1)
        ae = jnp.maximum(a * e, 1e-30)
        sin2 = jnp.maximum(1.0 - (b * b) / ae, 0.0)
        s = ((b * f - c * e) / ae) / jnp.maximum(sin2, 1e-4)
        t = jnp.where(e > 1e-20, (b * s + f) / jnp.where(e > 1e-20, e, 1.0), 0.0)
        return g, s, t, sin2

    ga, _, _, _ = gap_params(p1a, p2a, q1a, q2a)
    gb, sb, tb, sin2b = gap_params(p1b, p2b, q1b, q2b)
    interior = (
        (sb > -eps) & (sb < 1.0 + eps) & (tb > -eps) & (tb < 1.0 + eps)
    )
    return interior & (sin2b > 1e-4) & (ga * gb < 0)


def edge_edge_mollifier(p1, p2, q1, q2, eps_x):
    """IPC parallel-edge mollifier (Li et al. 2020 §4.2): the clamped
    segment-segment distance is non-smooth when the edges are near-parallel
    (the closest-point pair jumps), so the EE barrier is weighted by
    m(c) = (2 - c/eps) * (c/eps) clamped at 1, with c = |d1 x d2|^2 and
    eps_x ~ 1e-3 * |d1_rest|^2 |d2_rest|^2. Near-parallel contacts fade out
    smoothly — their support is covered by neighboring point-triangle
    pairs, matching libuipc's pair pipeline semantics."""
    cr = jnp.cross(p2 - p1, q2 - q1)
    c = (cr * cr).sum(-1)
    x = c / jnp.maximum(eps_x, 1e-30)
    return jnp.where(x < 1.0, x * (2.0 - x), 1.0)


def _segment_crosses_triangle(p0, p1, a, b, c, eps: float = 1e-4):
    """True where the segment p0->p1 pierces triangle (a,b,c).

    Möller–Trumbore over broadcastable leading dims. The poor man's CCD for
    UNSIGNED point-triangle barriers: a log-barrier on |distance| cannot see
    a vertex jumping to the far side of a triangle within one line-search
    trial, so the feasibility check must reject crossing steps explicitly
    (signed SDFs catch this for analytic colliders; meshes need this test).
    """
    d = p1 - p0
    e1, e2 = b - a, c - a
    h = jnp.cross(d, e2)
    det = (e1 * h).sum(-1)
    safe = jnp.abs(det) > 1e-14
    f = 1.0 / jnp.where(safe, det, 1.0)
    s = p0 - a
    u = f * (s * h).sum(-1)
    q = jnp.cross(s, e1)
    v = f * (d * q).sum(-1)
    t = f * (e2 * q).sum(-1)
    return (
        safe
        & (u >= -eps)
        & (v >= -eps)
        & (u + v <= 1.0 + eps)
        & (t > -eps)
        & (t < 1.0 + eps)
    )


def _segment_crosses_moving_triangle(
    p0, p1, a0, b0, c0, a1, b1, c1, eps: float = 1e-4
):
    """Crossing test against a MOVING triangle: Möller–Trumbore in the
    triangle's co-moving frame.

    Testing the vertex segment against the end-pose triangle alone misses
    relative crossings where both sides move — the exact kinematics a
    barrier produces at contact onset (it pushes the surfaces apart, so a
    vertex that slipped past mid-iterate sees the triangle recede and the
    end-frame segment never pierces it; measured tunneling in the
    cloth-catches-falling-body scene). First-order fix: subtract the
    triangle's mean (centroid) displacement from the vertex's motion and
    test against the end pose — exact for relative translation, which
    dominates within one line-search trial; triangle rotation/deformation
    is second-order over a trial and covered by the distance floors.
    """
    shift = ((a1 - a0) + (b1 - b0) + (c1 - c0)) / 3.0
    return _segment_crosses_triangle(p0 + shift, p1, a1, b1, c1, eps)


def barrier_extended(d, kappa: float, d_hat: float):
    """Per-distance IPC log-barrier with a C^2 quadratic extension below
    d0 = 0.1 d_hat (value/slope/curvature matched at d0).

    The extension exists for vertices that START a step already penetrated —
    a kinematic collider moved into them between steps, something true IPC
    never faces because its CCD sees the collider motion. They need a
    strong, finite, depth-growing outward gradient AND bounded positive
    curvature: a clamped log gives zero gradient, a linear extension gives
    zero curvature (meter-scale Newton directions the line search can never
    shrink — the solve freezes at alpha=0).

    The ONE shared implementation for the FEM, ABD, and shell solvers —
    this expression is numerically delicate; keep it in one place.
    """
    d0 = 0.1 * d_hat
    d_c = jnp.clip(d, d0, d_hat)
    active = d < d_hat
    b_core = -kappa * (d_c - d_hat) ** 2 * jnp.log(d_c / d_hat)
    lg = math.log(d0 / d_hat)
    b_d0 = -kappa * (d0 - d_hat) ** 2 * lg
    db_d0 = -kappa * (2.0 * (d0 - d_hat) * lg + (d0 - d_hat) ** 2 / d0)
    d2b_d0 = -kappa * (2.0 * lg + 4.0 * (d0 - d_hat) / d0 - (d0 - d_hat) ** 2 / d0**2)
    dd = d - d0
    b = jnp.where(d < d0, b_d0 + db_d0 * dd + 0.5 * d2b_d0 * dd * dd, b_core)
    return jnp.where(active, b, 0.0)


def barrier_force_mag(d, kappa: float, d_hat: float):
    """|d/dd barrier_extended(d)| — the normal contact-force magnitude used
    as the lagged friction coefficient lambda_n.

    MUST stay consistent with :func:`barrier_extended`: below d0 = 0.1 d_hat
    the force is the (bounded, linear-in-depth) derivative of the quadratic
    extension, NOT the raw log-barrier derivative with a clamped d — the raw
    form at a penetrated start explodes to ~kappa d_hat^2 / d_clamp and the
    resulting friction stiffness jams the very solve the extension exists to
    unfreeze (advisor round-2 finding, abd.py:510 pattern).
    """
    d0 = 0.1 * d_hat
    d_c = jnp.clip(d, d0, d_hat)
    g_core = 2.0 * (d_c - d_hat) * jnp.log(d_c / d_hat) + (d_c - d_hat) ** 2 / d_c
    lg = math.log(d0 / d_hat)
    db_d0 = 2.0 * (d0 - d_hat) * lg + (d0 - d_hat) ** 2 / d0
    d2b_d0 = 2.0 * lg + 4.0 * (d0 - d_hat) / d0 - (d0 - d_hat) ** 2 / d0**2
    g = jnp.where(d < d0, db_d0 + d2b_d0 * (d - d0), g_core)
    return jnp.where(d < d_hat, kappa * jnp.abs(g), 0.0)


@configclass
class IpcSolverCfg:
    """Solver configuration (defaults mirror UipcSimCfg where applicable)."""

    dt: float = 0.01
    gravity: tuple = (0.0, 0.0, -9.81)
    newton_max_iter: int = 8
    velocity_tol: float = 0.05  # m/s — per-vertex |dx|/dt convergence norm
    cg_iters: int = 24
    line_search_iters: int = 8
    d_hat: float = 0.001  # barrier activation distance (m)
    kappa: float = 1e4  # barrier stiffness (N/m^2-ish)
    friction_mu: float = 0.5  # default_friction_ratio
    eps_velocity: float = 0.01  # friction smoothing velocity (m/s)
    damping: float = 0.0
    # FEM-FEM / self contact: vertex-vs-surface-triangle barriers over a
    # fixed-capacity candidate set (K nearest non-adjacent triangles per
    # surface vertex, re-selected each step). 0 disables. Two separate gels
    # pressing each other = the same machinery on their union mesh.
    self_contact_k: int = 0
    # candidate static-collider triangles per surface vertex, when the model
    # was built with static_tris (fixed trimesh bodies, e.g. kinematic
    # affine objects — same machinery as the shell solver)
    static_contact_k: int = 4
    # EDGE-EDGE candidate edges per surface edge (0 = off). Vertex-triangle
    # pairs alone hop contacts where thin features meet edge-on — for the
    # nodal system the canonical case is cloth: two coarse cloth strips
    # crossing at 90 deg touch mid-edge, far from every vertex. Real IPC
    # (libuipc's BVH pipeline, SURVEY §2.2 row 1) resolves PT and EE pairs;
    # same scheme as AbdSolverCfg.ee_contact_k, over the union surface
    # edges (self + object-object, adjacency-excluded, i<j dedup).
    ee_contact_k: int = 0
    # KINEMATIC-COLLIDER CCD fallback: number of equal substeps per step().
    # The analytic-scene colliders move BETWEEN steps (their poses are
    # inputs, not unknowns), so no line-search crossing test can see a
    # collider that jumps past a thin feature in one dt — true CCD over the
    # collider trajectory (libuipc ccd_tol, reference uipc_sim.py:63-66)
    # has no equivalent here. Measured envelope (docs/ccd_envelope.md):
    # a collider tunnels through a gel slab once its per-step displacement
    # exceeds ~(slab thickness + d_hat). With k substeps the scene poses
    # are linearly interpolated prev->current (quaternions nlerp, valid for
    # the small per-substep rotations this exists for) and the solver runs
    # k solves at dt/k — the per-substep displacement shrinks k-fold.
    ccd_substeps: int = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SoftBodyState:
    x: jax.Array  # (N, V, 3)
    v: jax.Array  # (N, V, 3)

    @staticmethod
    def init(num_envs: int, points: np.ndarray) -> "SoftBodyState":
        x = jnp.broadcast_to(jnp.asarray(points, jnp.float32), (num_envs,) + points.shape)
        return SoftBodyState(x=x, v=jnp.zeros_like(x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidSdfScene:
    """Per-env analytic rigid colliders (same capacities across envs).

    ``threads`` (optional, (N, T, 12)) are helical thread surfaces —
    bolt shafts / nut bores for the Factory tasks (sdf_ops.sdf_threads).
    """

    spheres: jax.Array  # (N, S, 4)
    boxes: jax.Array  # (N, B, 10)
    capsules: jax.Array  # (N, C, 8)
    planes: jax.Array  # (N, P, 4)
    threads: jax.Array | None = None  # (N, T, 12)

    @staticmethod
    def empty(num_envs: int, s=1, b=1, c=1, p=1, t=0) -> "RigidSdfScene":
        return RigidSdfScene(
            spheres=jnp.zeros((num_envs, s, 4)),
            boxes=jnp.zeros((num_envs, b, 10)),
            capsules=jnp.zeros((num_envs, c, 8)),
            planes=jnp.zeros((num_envs, p, 4)),
            threads=jnp.zeros((num_envs, t, 12)) if t else None,
        )

    def sdf(self, p: jax.Array) -> jax.Array:
        """(P,) scene signed distance (single-env view: fields (S, ...))."""
        return sdf_ops.scene_sdf(
            p, self.spheres, self.boxes, self.capsules, self.planes, self.threads
        )


def scene_motion(prev: RigidSdfScene, curr: RigidSdfScene) -> jax.Array:
    """(N,) upper bound on how far any scene collider SURFACE point moved
    between two frames — the quantity the kinematic-collider CCD envelope is
    written in (docs/ccd_envelope.md): a collider can tunnel through a thin
    soft feature once its per-(sub)step motion exceeds the feature thickness
    + d_hat, because collider poses are step inputs the line-search crossing
    tests never sweep. check_health() compares this against
    cfg.newton.ccd_motion_limit per substep.

    Per primitive family: spheres |dc|; boxes |dc| + |dq|·|half-diag|
    (small-angle lever-arm bound); capsules max(|da|, |db|); planes |d off|
    + |dn|·1 m lever; threads |d base|.
    """

    def mag(a, b, sl):
        return jnp.sqrt(((b[..., sl] - a[..., sl]) ** 2).sum(-1) + 1e-30)

    moves = [
        jnp.where(curr.spheres[..., 3] > 0, mag(prev.spheres, curr.spheres, slice(0, 3)), 0.0),
        jnp.where(
            curr.boxes[..., 7] > 0,
            mag(prev.boxes, curr.boxes, slice(0, 3))
            + mag(prev.boxes, curr.boxes, slice(3, 7))
            * jnp.sqrt((curr.boxes[..., 7:10] ** 2).sum(-1) + 1e-30),
            0.0,
        ),
        jnp.where(
            curr.capsules[..., 7] > 0,
            jnp.maximum(
                mag(prev.capsules, curr.capsules, slice(0, 3)),
                mag(prev.capsules, curr.capsules, slice(3, 6)),
            ),
            0.0,
        ),
        jnp.where(
            (curr.planes[..., :3] ** 2).sum(-1) > 0.5,
            jnp.abs(curr.planes[..., 3] - prev.planes[..., 3])
            + mag(prev.planes, curr.planes, slice(0, 3)),
            0.0,
        ),
    ]
    if curr.threads is not None:
        moves.append(mag(prev.threads, curr.threads, slice(0, 3)))
    return jnp.stack([m.max(-1) for m in moves], -1).max(-1)


class SoftBodyModel:
    """Static per-topology data + the vmapped step function."""

    def __init__(
        self,
        mesh: TetMesh,
        youngs_modulus=1.45e5,  # Pa, scalar or (T,) per-tet (reference ~0.145 MPa)
        poisson_ratio=0.45,  # scalar or (T,)
        mass_density=1000.0,  # scalar or (T,)
        cfg: IpcSolverCfg | None = None,
        attachment_verts: np.ndarray | None = None,
        attachment_strength_ratio=100.0,  # scalar or (Va,) per attachment vertex
        static_tris: np.ndarray | None = None,  # (Ts, 3, 3) fixed trimesh colliders
        shell_elems=None,  # codim.ShellElements: membrane/bending elements
    ):
        self.mesh = mesh
        self.cfg = cfg or IpcSolverCfg()
        mu, lam = lame_params(youngs_modulus, poisson_ratio)
        # per-tet arrays broadcast through the energy; keep scalars as floats
        self.mu = float(mu) if np.ndim(mu) == 0 else jnp.asarray(mu, jnp.float32)
        self.lam = float(lam) if np.ndim(lam) == 0 else jnp.asarray(lam, jnp.float32)

        dm_inv, vol = precompute_rest(mesh.points, mesh.tets)
        self.tets = jnp.asarray(mesh.tets)
        self.dm_inv = jnp.asarray(dm_inv)
        self.rest_vol = jnp.asarray(vol)
        # Codimensional (cloth/shell) elements over the SAME vertex array —
        # libuipc's layout, where NeoHookeanShell/DiscreteShellBending are
        # FiniteElement constitutions in one system (uipc_sim.py:23-26): a
        # union model can mix tet and membrane elements, so cloth joins the
        # self-contact machinery and the coupled FEM<->ABD world for free.
        masses_np = np.asarray(lumped_masses(mesh.points, mesh.tets, mass_density))
        if shell_elems is not None and shell_elems.num_tris > 0:
            from .codim import ShellElementsJax

            self.shell = ShellElementsJax(shell_elems)
            masses_np = masses_np + np.asarray(shell_elems.masses)
        else:
            self.shell = None
        assert (masses_np > 0).all(), (
            "zero-mass vertex: every vertex must belong to a tet or a shell element"
        )
        self.masses = jnp.asarray(masses_np)  # (V,)
        self.surface_verts = jnp.asarray(mesh.surface_verts)
        self.surface_tris = jnp.asarray(mesh.surface_tris)  # (Ts, 3) vertex ids
        # vertex-in-triangle exclusion for self contact (IPC convention:
        # a vertex never collides with a triangle it belongs to)
        sv = np.asarray(mesh.surface_verts)
        st = np.asarray(mesh.surface_tris)
        self._vt_exclude = jnp.asarray(
            (sv[:, None, None] == st[None, :, :]).any(-1)
        )  # (Vs, Ts) bool
        tri_pts = mesh.points[st]  # (Ts, 3, 3)
        self._tri_radius_max = float(
            np.linalg.norm(tri_pts - tri_pts.mean(1, keepdims=True), axis=-1).max()
        )
        # unique surface edges for EDGE-EDGE pairs (built only when enabled:
        # the (E, E) adjacency mask is cloth-scene machinery, not worth the
        # memory on sensor-gel meshes running vertex-triangle only)
        if self.cfg.ee_contact_k > 0:
            e_all = np.concatenate([st[:, [0, 1]], st[:, [1, 2]], st[:, [2, 0]]])
            e_all.sort(axis=1)
            edges = np.unique(e_all, axis=0)
            self.edges = jnp.asarray(edges, jnp.int32)  # (E, 2)
            # exclude edge pairs sharing a vertex (IPC adjacency convention)
            share = (
                (edges[:, None, :, None] == edges[None, :, None, :])
                .any(-1)
                .any(-1)
            )  # (E, E)
            self._ee_exclude = jnp.asarray(share)
            elen2 = ((mesh.points[edges[:, 1]] - mesh.points[edges[:, 0]]) ** 2).sum(-1)
            self._edge_len2 = jnp.asarray(elen2, jnp.float32)
            self._edge_halflen = jnp.asarray(0.5 * np.sqrt(elen2), jnp.float32)
        else:
            self.edges = None
        # fixed triangle-soup colliders (the shell solver's static_tris
        # machinery): K-nearest candidates per surface vertex + crossing CCD
        if static_tris is not None and len(static_tris) > 0:
            self.static_tris = jnp.asarray(static_tris, jnp.float32)
            self.static_cent = self.static_tris.mean(axis=1)
            st_np = np.asarray(static_tris, np.float64)
            self._static_radius_max = float(
                np.linalg.norm(st_np - st_np.mean(1, keepdims=True), axis=-1).max()
            )
        else:
            self.static_tris = None
            self.static_cent = None

        # attachments: soft position constraints (UipcIsaacAttachments
        # semantics — strength = ratio x object mass, uipc_attachments.py:36-66)
        if attachment_verts is None:
            attachment_verts = np.zeros((0,), np.int32)
        self.attachment_verts = jnp.asarray(attachment_verts, jnp.int32)
        # per-vertex stiffness ratio * m_i / dt^2: the soft-position-constraint
        # strength scaling that makes "ratio x mass" (UipcIsaacAttachmentsCfg:
        # constraint_strength_ratio=100) hold against gravity under implicit
        # integration (deviation ~ g dt^2 / ratio ~ 1e-5 m at the defaults)
        m_attach = masses_np[attachment_verts]  # incl. shell mass contribution
        self.attachment_k = jnp.asarray(
            attachment_strength_ratio * m_attach / self.cfg.dt**2, jnp.float32
        )[:, None]

    # ----------------------------------------------------------- self contact
    def _select_candidates(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Broad phase: K nearest non-adjacent surface triangles per surface
        vertex, by centroid distance at the step's starting configuration
        (indices are constants through the Newton solve — stop_gradient'd).

        Returns (cand (Vs, K) triangle ids, valid (Vs, K) bool)."""
        k = self.cfg.self_contact_k
        xs = x[self.surface_verts]  # (Vs, 3)
        cent = x[self.surface_tris].mean(-2)  # (Ts, 3)
        d2 = ((xs[:, None, :] - cent[None]) ** 2).sum(-1)  # (Vs, Ts)
        d2 = jnp.where(self._vt_exclude, jnp.inf, d2)
        neg, cand = jax.lax.top_k(-d2, k)
        # prune candidates whose centroid is beyond barrier reach this step
        cut = 3.0 * self.cfg.d_hat + self._tri_radius_max
        valid = (-neg) < cut * cut
        return jax.lax.stop_gradient(cand), jax.lax.stop_gradient(valid)

    # ------------------------------------------------- broad-phase accounting
    def broad_phase_overflow(self, x: jax.Array) -> dict[str, jax.Array]:
        """Count candidates WITHIN barrier reach that fell outside the
        fixed-capacity top-K sets, per pair family, for one env (int32
        scalars; vmap over the env axis for batches).

        libuipc's linear-BVH broad phase never misses a pair (reference
        source/tacex_uipc/tacex_uipc/sim/uipc_sim.py:121
        ``collision_detection_method="linear_bvh"``); this rebuild's
        static-shape K-nearest candidate sets silently drop pairs beyond
        K. Because top-K keeps the NEAREST candidates, the dropped count
        per row is exactly ``max(#within_reach − K, 0)`` — any nonzero
        value means a pair inside the same reach cut the narrow phase
        uses (3·d_hat + support radius) got NO barrier this step. Raise
        ``self_contact_k`` / ``static_contact_k`` / ``ee_contact_k``
        until the counters stay zero at the scene's density.
        """
        c = self.cfg
        out: dict[str, jax.Array] = {}
        if c.self_contact_k > 0:
            xs = x[self.surface_verts]
            cent = x[self.surface_tris].mean(-2)
            d2 = ((xs[:, None, :] - cent[None]) ** 2).sum(-1)
            d2 = jnp.where(self._vt_exclude, jnp.inf, d2)
            cut = 3.0 * c.d_hat + self._tri_radius_max
            within = (d2 < cut * cut).sum(-1)
            out["vt_self"] = jnp.maximum(within - c.self_contact_k, 0).sum()
        if self.static_tris is not None:
            xs = x[self.surface_verts]
            k = min(c.static_contact_k, self.static_cent.shape[0])
            d2 = ((xs[:, None, :] - self.static_cent[None]) ** 2).sum(-1)
            cut = 3.0 * c.d_hat + self._static_radius_max
            within = (d2 < cut * cut).sum(-1)
            out["vt_static"] = jnp.maximum(within - k, 0).sum()
        if self.edges is not None:
            k = min(c.ee_contact_k, self.edges.shape[0])
            mid = x[self.edges].mean(-2)
            d2 = ((mid[:, None, :] - mid[None]) ** 2).sum(-1)
            E = self.edges.shape[0]
            dedup = jnp.arange(E)[:, None] >= jnp.arange(E)[None, :]
            d2 = jnp.where(self._ee_exclude | dedup, jnp.inf, d2)
            cut = (
                3.0 * c.d_hat
                + self._edge_halflen[:, None]
                + self._edge_halflen[None, :]
            )
            within = (d2 < cut * cut).sum(-1)
            out["ee"] = jnp.maximum(within - k, 0).sum()
        return out

    # ------------------------------------------------------------- edge-edge
    def _select_ee_candidates(self, x: jax.Array):
        """K nearest HIGHER-index edges per surface edge (each unordered
        pair once), adjacency-excluded, by midpoint distance at the step
        start (constants through the Newton solve)."""
        k = min(self.cfg.ee_contact_k, self.edges.shape[0])
        mid = x[self.edges].mean(-2)  # (E, 3)
        d2 = ((mid[:, None, :] - mid[None]) ** 2).sum(-1)
        E = self.edges.shape[0]
        dedup = jnp.arange(E)[:, None] >= jnp.arange(E)[None, :]
        d2 = jnp.where(self._ee_exclude | dedup, jnp.inf, d2)
        neg, cand = jax.lax.top_k(-d2, k)
        cut = 3.0 * self.cfg.d_hat + self._edge_halflen[:, None] + self._edge_halflen[cand]
        valid = (-neg) < cut * cut
        return jax.lax.stop_gradient(cand), jax.lax.stop_gradient(valid)

    # ------------------------------------------------- one-hot gather operators
    def _gather_ops(self, self_cand, ee_cand):
        """Per-step 0/1 gather matrices for the x-dependent candidate
        fetches (same rationale as CoupledModel._gather_ops: per-env
        dynamic-index gathers are issue-bound on TPU and re-execute inside
        every energy/hvp/feasibility evaluation; the indices are step
        constants, so each fetch is a tiny one-hot matmul on the MXU)."""
        V = self.mesh.num_vertices
        op_vt = op_ee = None
        if self_cand is not None:
            op_vt = jax.lax.stop_gradient(
                jax.nn.one_hot(
                    self.surface_tris[self_cand[0]].reshape(-1), V, dtype=jnp.float32
                )
            )
        if ee_cand is not None:
            op_ee = jax.lax.stop_gradient(
                jax.nn.one_hot(
                    self.edges[ee_cand[0]].reshape(-1), V, dtype=jnp.float32
                )
            )
        return (op_vt, op_ee)

    def _tri_rows(self, x, cand, ops):
        """(Vs, K, 3, 3) candidate self-contact triangle corners.

        precision=HIGHEST: with a 0/1 matrix a full-f32 matmul reproduces
        the gather EXACTLY; the TPU default rounds operands to bf16, which
        would put ~tens-of-µm error into coordinates that feed barrier
        distances and feasibility floors (round-4 advice)."""
        if ops is None or ops[0] is None:
            return x[self.surface_tris[cand]]
        return jnp.matmul(
            ops[0], x, precision=jax.lax.Precision.HIGHEST
        ).reshape(cand.shape + (3, 3))

    def _ee_rows(self, x, cand, ops):
        """(E, K, 2, 3) candidate-edge endpoints (exact one-hot gather)."""
        if ops is None or ops[1] is None:
            return x[self.edges[cand]]
        return jnp.matmul(
            ops[1], x, precision=jax.lax.Precision.HIGHEST
        ).reshape(cand.shape + (2, 3))

    def _ee_distances(self, x: jax.Array, cand: jax.Array, ops=None) -> jax.Array:
        pi = x[self.edges]  # (E, 2, 3)
        pj = self._ee_rows(x, cand, ops)  # (E, K, 2, 3)
        return _edge_edge_distance(
            pi[:, None, 0, :], pi[:, None, 1, :], pj[..., 0, :], pj[..., 1, :]
        )

    def _ee_barrier(self, x: jax.Array, ee_cand, ops=None) -> jax.Array:
        """Mollified edge-edge barrier sum (edge_edge_mollifier fades the
        near-parallel pairs whose support PT pairs already carry)."""
        cand, valid = ee_cand
        c = self.cfg
        pi = x[self.edges]
        pj = self._ee_rows(x, cand, ops)
        d = _edge_edge_distance(
            pi[:, None, 0, :], pi[:, None, 1, :], pj[..., 0, :], pj[..., 1, :]
        )
        eps_x = 1e-3 * self._edge_len2[:, None] * self._edge_len2[cand]
        m = edge_edge_mollifier(
            pi[:, None, 0, :], pi[:, None, 1, :], pj[..., 0, :], pj[..., 1, :], eps_x
        )
        d = jnp.where(valid, d, 10.0 * c.d_hat)
        return jnp.sum(m * barrier_extended(d, c.kappa, c.d_hat))

    def _pair_distances(self, x: jax.Array, cand: jax.Array, ops=None) -> jax.Array:
        """Unsigned vertex-triangle distances for the candidate set -> (Vs, K)."""
        p = x[self.surface_verts][:, None, :]  # (Vs, 1, 3)
        tri = self._tri_rows(x, cand, ops)  # (Vs, K, 3, 3)
        return _point_triangle_distance(p, tri[..., 0, :], tri[..., 1, :], tri[..., 2, :])

    # ---------------------------------------------------------------- energy
    def _barrier(self, d: jax.Array) -> jax.Array:
        """Summed log-barrier (see barrier_extended for the formulation)."""
        return barrier_extended(d, self.cfg.kappa, self.cfg.d_hat).sum()

    def _static_candidates(self, xs: jax.Array):
        """K nearest static-collider triangles per surface vertex."""
        k = min(self.cfg.static_contact_k, self.static_cent.shape[0])
        d2 = ((xs[:, None, :] - self.static_cent[None]) ** 2).sum(-1)
        _, cand = jax.lax.top_k(-d2, k)
        return jax.lax.stop_gradient(cand)

    def _static_distance(self, xs: jax.Array, cand: jax.Array) -> jax.Array:
        """``cand``: (Vs, K) int triangle ids, OR the prefetched float
        (Vs, K, 3, 3) corner array — the static-collider triangles are
        x-independent, so hot paths hoist the fetch out of the solve
        entirely and pass corners."""
        if jnp.issubdtype(cand.dtype, jnp.integer):
            cand = self.static_tris[cand]  # (Vs, K, 3, 3)
        tri = cand
        return _point_triangle_distance(
            xs[:, None, :], tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
        )

    def _energy(
        self, x, x_tilde, scene, aim_pos, x_prev, friction_basis, self_cand=None,
        static_cand=None, ee_cand=None, dt=None, ops=None,
    ):
        c = self.cfg
        if dt is None:
            dt = c.dt
        inertia = (0.5 / dt**2) * jnp.sum(self.masses[:, None] * (x - x_tilde) ** 2)
        elastic = stable_neo_hookean_energy(x, self.tets, self.dm_inv, self.rest_vol, self.mu, self.lam)
        if self.shell is not None:
            from .codim import bending_energy, membrane_energy

            elastic = elastic + membrane_energy(x, self.shell) + bending_energy(x, self.shell)
        xs = x[self.surface_verts]
        contact = self._barrier(scene.sdf(xs))
        if self_cand is not None:
            cand, valid = self_cand
            d_vt = self._pair_distances(x, cand, ops)
            # inactive pairs pushed past d_hat so the barrier ignores them
            d_vt = jnp.where(valid, d_vt, 10.0 * c.d_hat)
            contact = contact + self._barrier(d_vt)
        if static_cand is not None:
            contact = contact + self._barrier(self._static_distance(xs, static_cand))
        if ee_cand is not None:
            contact = contact + self._ee_barrier(x, ee_cand, ops)
        attach = 0.0
        if self.attachment_verts.shape[0] > 0:
            attach = 0.5 * jnp.sum(self.attachment_k * (x[self.attachment_verts] - aim_pos) ** 2)
        friction = 0.0
        if friction_basis is not None:
            lam_n, n_dir = friction_basis  # (Vs,), (Vs, 3) — lagged from last step
            du = xs - x_prev[self.surface_verts]
            du_t = du - jnp.sum(du * n_dir, axis=-1, keepdims=True) * n_dir
            # smooth |u_t| mollifier (quadratic near 0, linear beyond eps),
            # written in s = |du_t|^2 with a clamped sqrt argument so both
            # where-branches have finite 1st AND 2nd derivatives at du_t = 0
            # (sqrt(s + tiny) is NaN under double differentiation there —
            # the CG Hessian-vector products hit it on resting contacts).
            ut2 = jnp.sum(du_t**2, axis=-1)
            eps = c.eps_velocity * dt
            f0 = jnp.where(
                ut2 < eps * eps,
                ut2 / (2 * eps) + eps / 2,
                jnp.sqrt(jnp.maximum(ut2, eps * eps)),
            )
            friction = c.friction_mu * jnp.sum(lam_n * f0)
        return inertia + elastic + contact + attach + friction

    # ------------------------------------------------------------- single env
    def _step_single(self, x, v, scene, aim_pos, dt=None):
        c = self.cfg
        if dt is None:
            dt = c.dt
        g = jnp.asarray(c.gravity, jnp.float32)
        x_tilde = x + dt * v + dt * dt * g

        xs0 = x[self.surface_verts]
        sdf_fn = scene.sdf

        # FEM-FEM / self contact: fixed-capacity candidate set for this step
        self_cand = self._select_candidates(x) if c.self_contact_k > 0 else None
        static_cand = (
            self._static_candidates(xs0) if self.static_tris is not None else None
        )
        ee_cand = (
            self._select_ee_candidates(x) if self.edges is not None else None
        )
        # one-hot gather operators + x-independent prefetches (step
        # constants; every in-solve candidate fetch becomes a tiny MXU
        # matmul — see _gather_ops)
        ops = self._gather_ops(self_cand, ee_cand)
        if static_cand is not None:
            static_cand = self.static_tris[static_cand]  # prefetched corners

        def friction_lag(x_k, stop=True):
            """(lambda_n, normal) recomputed from the CURRENT Newton iterate
            (stop-gradient). Re-lagging every iteration is the fixed-point
            scheme that converges to fully-implicit friction (libuipc's
            Contact.friction semantics, reference uipc_sim.py:87-95): a
            once-per-step lag freezes lambda at the starting distances and
            self-locks multi-point conforming contacts (the round-2
            screw-and-nut limitation)."""
            if c.friction_mu <= 0:
                return None
            xs = (jax.lax.stop_gradient(x_k) if stop else x_k)[self.surface_verts]
            d = sdf_fn(xs)
            n = jax.vmap(jax.grad(lambda p: sdf_fn(p[None])[0]))(xs)
            n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
            return (barrier_force_mag(d, c.kappa, c.d_hat), n)

        # Straight-through lag for diff-sim: primal value = per-iteration
        # re-lag (implicit-friction fixed point), tangent = the step-start
        # lag's smooth dependence on the inputs. Differentiating through the
        # iterate-lag recurrence amplifies the stiff dlambda/dd path each
        # Newton iteration (measured: unrolled gradient flips sign, 19x off
        # FD); stop-gradient alone cuts the friction sensitivity entirely
        # (measured: 10x under FD). Anchoring the tangent at the step-start
        # lag keeps both the primal fix and the round-1 gradient quality.
        lag0 = friction_lag(x, stop=False)

        def lag_st(x_k):
            if lag0 is None:
                return None
            return jax.tree_util.tree_map(
                lambda it, s0: s0 + jax.lax.stop_gradient(it - s0),
                friction_lag(x_k), lag0,
            )

        def make_energy(friction_basis):
            return lambda xx: self._energy(
                xx, x_tilde, scene, aim_pos, x, friction_basis, self_cand,
                static_cand, ee_cand, dt, ops,
            )

        # Feasibility floor: strict penetration-free (d > 0) when the step
        # STARTS feasible; when a kinematic collider moved into the gel
        # between steps (start already penetrated), require no-worsening
        # instead — otherwise every line-search trial is rejected and the
        # solve freezes at the pre-contact state (zero contact force).
        d_floor = jnp.minimum(sdf_fn(x[self.surface_verts]).min(), 0.0)
        # same no-worsening pattern for static trimesh colliders: a gel that
        # STARTS closer than the strict threshold (reset/init overlap) must
        # not have every trial rejected — require not-worse instead
        if static_cand is not None:
            s_floor = jnp.minimum(
                0.999 * self._static_distance(xs0, static_cand).min(), 1e-7
            )
        else:
            s_floor = 1e-7
        if ee_cand is not None:
            eci0, eval0 = ee_cand
            ee_floor = jnp.minimum(
                0.999 * jnp.where(eval0, self._ee_distances(x, eci0), 1.0).min(),
                1e-7,
            )

        def feasible(xx, x_from):
            ok = sdf_fn(xx[self.surface_verts]).min() > d_floor
            if self_cand is not None:
                cand, valid = self_cand
                d_vt = self._pair_distances(xx, cand, ops)
                ok = ok & (jnp.where(valid, d_vt, 1.0).min() > 1e-6)
                # crossing check: unsigned vertex-triangle distances cannot
                # see a vertex that jumped THROUGH a triangle this trial;
                # the triangles MOVE too, so test in their co-moving frame
                tri = self._tri_rows(xx, cand, ops)  # (Vs, K, 3, 3)
                tri0 = self._tri_rows(x_from, cand, ops)
                crossed = _segment_crosses_moving_triangle(
                    x_from[self.surface_verts][:, None, :],
                    xx[self.surface_verts][:, None, :],
                    tri0[..., 0, :], tri0[..., 1, :], tri0[..., 2, :],
                    tri[..., 0, :], tri[..., 1, :], tri[..., 2, :],
                )
                ok = ok & ~(crossed & valid).any()
            if static_cand is not None:
                xs_try = xx[self.surface_verts]
                ok = ok & (self._static_distance(xs_try, static_cand).min() > s_floor)
                tri = static_cand  # prefetched (Vs, K, 3, 3) corners
                crossed = _segment_crosses_triangle(
                    x_from[self.surface_verts][:, None, :],
                    xs_try[:, None, :],
                    tri[..., 0, :], tri[..., 1, :], tri[..., 2, :],
                )
                ok = ok & ~crossed.any()
            if ee_cand is not None:
                eci, evalid = ee_cand
                d_ee = self._ee_distances(xx, eci, ops)
                ok = ok & (jnp.where(evalid, d_ee, 1.0).min() > ee_floor)
                # EE crossing CCD (edges pass through each other unseen by
                # unsigned distances)
                pa = x_from[self.edges]
                pja = self._ee_rows(x_from, eci, ops)
                pb = xx[self.edges]
                pjb = self._ee_rows(xx, eci, ops)
                crossed = _edge_pair_crossed(
                    pa[:, None, 0, :], pa[:, None, 1, :],
                    pja[..., 0, :], pja[..., 1, :],
                    pb[:, None, 0, :], pb[:, None, 1, :],
                    pjb[..., 0, :], pjb[..., 1, :],
                )
                ok = ok & ~(crossed & evalid).any()
            return ok

        def newton_iter(_, carry):
            x_k, done = carry
            energy = make_energy(lag_st(x_k))
            grad = jax.grad(energy)(x_k)

            hvp = lambda p: jax.jvp(jax.grad(energy), (x_k,), (p,))[1]
            # matrix-free CG with Jacobi-ish scaling by lumped mass
            precond = 1.0 / (self.masses[:, None] / dt**2)

            def cg_body(_, cg):
                p_dir, r, z, xsol = cg
                hp = hvp(p_dir)
                denom = jnp.sum(p_dir * hp)
                alpha = jnp.where(jnp.abs(denom) > 1e-20, jnp.sum(r * z) / denom, 0.0)
                xsol = xsol + alpha * p_dir
                r_new = r - alpha * hp
                z_new = precond * r_new
                beta = jnp.where(
                    jnp.sum(r * z) > 1e-20, jnp.sum(r_new * z_new) / jnp.sum(r * z), 0.0
                )
                return (z_new + beta * p_dir, r_new, z_new, xsol)

            r0 = -grad
            z0 = precond * r0
            _, _, _, p = jax.lax.fori_loop(
                0, c.cg_iters, cg_body, (z0, r0, z0, jnp.zeros_like(x_k))
            )

            # fall back to preconditioned gradient descent if CG direction is
            # not a descent direction (indefinite Hessian far from optimum)
            descent = jnp.sum(p * grad) < 0
            p = jnp.where(descent, p, -z0)

            # backtracking line search with feasibility (penetration-free)
            e0 = energy(x_k)

            def ls_body(_, ls):
                alpha, accepted = ls
                x_try = x_k + alpha * p
                ok = (energy(x_try) < e0) & feasible(x_try, x_k)
                new_alpha = jnp.where(ok | accepted, alpha, alpha * 0.5)
                return (new_alpha, ok | accepted)

            alpha, accepted = jax.lax.fori_loop(0, c.line_search_iters, ls_body, (1.0, False))
            alpha = jnp.where(accepted, alpha, 0.0)

            step_vec = alpha * p
            x_new = jnp.where(done, x_k, x_k + step_vec)
            # convergence: max vertex displacement rate below tolerance
            max_rate = jnp.abs(step_vec).max() / c.dt
            done = done | (max_rate < c.velocity_tol)
            return (x_new, done)

        # start from x (feasible), not x_tilde (may already penetrate)
        x_new, _ = jax.lax.fori_loop(0, c.newton_max_iter, newton_iter, (x, False))
        v_new = (x_new - x) / c.dt * (1.0 - c.damping)
        return x_new, v_new

    # ----------------------------------------------------------------- public
    def step(
        self,
        state: SoftBodyState,
        scene: RigidSdfScene,
        aim_pos: jax.Array | None = None,
        scene_prev: RigidSdfScene | None = None,
        aim_prev: jax.Array | None = None,
    ):
        """Advance all envs one dt. ``aim_pos``: (N, Va, 3) attachment targets.

        With ``cfg.ccd_substeps = k > 1`` the step runs k solves at dt/k
        against scene poses linearly interpolated ``scene_prev`` -> ``scene``
        (the kinematic-collider CCD fallback; see IpcSolverCfg.ccd_substeps).
        ``scene_prev`` defaults to ``scene`` (colliders held at their new
        pose for every substep — still shrinks the solver's own per-substep
        motion, but the collider jump stays unresolved; pass the previous
        frame's scene to actually sweep it). ``aim_prev`` likewise sweeps
        attachment targets; when omitted the end-of-step aim is held for
        every substep (attachment-driven motion unswept — round-4 advice).
        """
        n = state.x.shape[0]
        if aim_pos is None:
            aim_pos = jnp.zeros((n, max(int(self.attachment_verts.shape[0]), 1), 3))

        k = int(self.cfg.ccd_substeps)
        if k <= 1:
            x, v = jax.vmap(self._step_single)(state.x, state.v, scene, aim_pos)
            return SoftBodyState(x=x, v=v)

        if scene_prev is None:
            scene_prev = scene
        dt_sub = self.cfg.dt / k
        # box orientations lerp as quaternions, not raw components: flip the
        # previous quat into the same hemisphere as the current one (a q/-q
        # sign flip between frames would otherwise lerp through near-zero
        # norm) and renormalize after the lerp — quat_apply in the box SDF
        # assumes unit norm (round-4 advice: nlerp, as the cfg comment says)
        qp, qc = scene_prev.boxes[..., 3:7], scene.boxes[..., 3:7]
        same_hemi = jnp.where((qp * qc).sum(-1, keepdims=True) < 0, -qp, qp)
        scene_prev = dataclasses.replace(
            scene_prev, boxes=scene_prev.boxes.at[..., 3:7].set(same_hemi)
        )

        a_prev = aim_pos if aim_prev is None else aim_prev

        def sub(st, tau):
            sc = jax.tree_util.tree_map(
                lambda a, b: a + tau * (b - a), scene_prev, scene
            )
            q = sc.boxes[..., 3:7]
            q = q / jnp.sqrt((q**2).sum(-1, keepdims=True) + 1e-30)
            sc = dataclasses.replace(sc, boxes=sc.boxes.at[..., 3:7].set(q))
            aim = a_prev + tau * (aim_pos - a_prev)
            x, v = jax.vmap(self._step_single, in_axes=(0, 0, 0, 0, None))(
                st.x, st.v, sc, aim, dt_sub
            )
            return SoftBodyState(x=x, v=v), None

        taus = jnp.arange(1, k + 1, dtype=jnp.float32) / k
        st, _ = jax.lax.scan(sub, state, taus)
        return st

    def surface_positions(self, state: SoftBodyState) -> jax.Array:
        return state.x[:, self.surface_verts]

    def sphere_contact_force(self, state: SoftBodyState, scene: RigidSdfScene) -> jax.Array:
        """Reaction force the gel exerts on each sphere collider -> (N, S, 3).

        Action-reaction on the shared barrier potential: the force on a
        rigid sphere is -dE_barrier/d(center), evaluated at the solved gel
        configuration (VERDICT round-1 item #6 — two-way coupling instead of
        a rigid box proxy). Gradients flow only through surface vertices
        whose nearest scene primitive is that sphere (min composition), so
        no pair bookkeeping is needed.
        """

        def one(x, sc):
            xs = x[self.surface_verts]

            def eb(s):
                return self._barrier(dataclasses.replace(sc, spheres=s).sdf(xs))

            g = jax.grad(eb)(sc.spheres)  # (S, 4): d/d(center xyz), d/d(radius)
            return -g[:, :3]

        return jax.vmap(one)(state.x, scene)
