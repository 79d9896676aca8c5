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

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import configclass
from ...ops import sdf as sdf_ops
from .fem import lame_params, lumped_masses, precompute_rest, stable_neo_hookean_energy
from .mesh import TetMesh


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
    """Per-env analytic rigid colliders (same capacities across envs)."""

    spheres: jax.Array  # (N, S, 4)
    boxes: jax.Array  # (N, B, 10)
    capsules: jax.Array  # (N, C, 8)
    planes: jax.Array  # (N, P, 4)

    @staticmethod
    def empty(num_envs: int, s=1, b=1, c=1, p=1) -> "RigidSdfScene":
        return RigidSdfScene(
            spheres=jnp.zeros((num_envs, s, 4)),
            boxes=jnp.zeros((num_envs, b, 10)),
            capsules=jnp.zeros((num_envs, c, 8)),
            planes=jnp.zeros((num_envs, p, 4)),
        )


class SoftBodyModel:
    """Static per-topology data + the vmapped step function."""

    def __init__(
        self,
        mesh: TetMesh,
        youngs_modulus: float = 1.45e5,  # Pa (reference gelpad cfgs use ~0.145 MPa)
        poisson_ratio: float = 0.45,
        mass_density: float = 1000.0,
        cfg: IpcSolverCfg | None = None,
        attachment_verts: np.ndarray | None = None,
        attachment_strength_ratio: float = 100.0,
    ):
        self.mesh = mesh
        self.cfg = cfg or IpcSolverCfg()
        mu, lam = lame_params(youngs_modulus, poisson_ratio)
        self.mu, self.lam = float(mu), float(lam)

        dm_inv, vol = precompute_rest(mesh.points, mesh.tets)
        self.tets = jnp.asarray(mesh.tets)
        self.dm_inv = jnp.asarray(dm_inv)
        self.rest_vol = jnp.asarray(vol)
        self.masses = jnp.asarray(lumped_masses(mesh.points, mesh.tets, mass_density))  # (V,)
        self.surface_verts = jnp.asarray(mesh.surface_verts)

        # attachments: soft position constraints (UipcIsaacAttachments
        # semantics — strength = ratio x object mass, uipc_attachments.py:36-66)
        if attachment_verts is None:
            attachment_verts = np.zeros((0,), np.int32)
        self.attachment_verts = jnp.asarray(attachment_verts, jnp.int32)
        # per-vertex stiffness ratio * m_i / dt^2: the soft-position-constraint
        # strength scaling that makes "ratio x mass" (UipcIsaacAttachmentsCfg:
        # constraint_strength_ratio=100) hold against gravity under implicit
        # integration (deviation ~ g dt^2 / ratio ~ 1e-5 m at the defaults)
        m_attach = np.asarray(lumped_masses(mesh.points, mesh.tets, mass_density))[attachment_verts]
        self.attachment_k = jnp.asarray(
            attachment_strength_ratio * m_attach / self.cfg.dt**2, jnp.float32
        )[:, None]

    # ---------------------------------------------------------------- energy
    def _barrier(self, d: jax.Array) -> jax.Array:
        """IPC log-barrier on signed distances, NaN-safe for autodiff."""
        dh = self.cfg.d_hat
        d_safe = jnp.maximum(d, 1e-9)
        active = d < dh
        b = -self.cfg.kappa * (d_safe - dh) ** 2 * jnp.log(jnp.where(active, d_safe / dh, 1.0))
        return jnp.where(active, b, 0.0).sum()

    def _energy(self, x, x_tilde, scene, aim_pos, x_prev, friction_basis):
        c = self.cfg
        inertia = (0.5 / c.dt**2) * jnp.sum(self.masses[:, None] * (x - x_tilde) ** 2)
        elastic = stable_neo_hookean_energy(x, self.tets, self.dm_inv, self.rest_vol, self.mu, self.lam)
        xs = x[self.surface_verts]
        d = sdf_ops.scene_sdf(xs, scene.spheres, scene.boxes, scene.capsules, scene.planes)
        contact = self._barrier(d)
        attach = 0.0
        if self.attachment_verts.shape[0] > 0:
            attach = 0.5 * jnp.sum(self.attachment_k * (x[self.attachment_verts] - aim_pos) ** 2)
        friction = 0.0
        if friction_basis is not None:
            lam_n, n_dir = friction_basis  # (Vs,), (Vs, 3) — lagged from last step
            du = xs - x_prev[self.surface_verts]
            du_t = du - jnp.sum(du * n_dir, axis=-1, keepdims=True) * n_dir
            # safe norm: grad of sqrt at 0 is NaN; the +tiny keeps autodiff
            # finite at the (common) zero-slip point
            ut2 = jnp.sum(du_t**2, axis=-1)
            ut = jnp.sqrt(ut2 + 1e-16)
            eps = c.eps_velocity * c.dt
            # smooth |u_t| mollifier (quadratic near 0, linear beyond eps)
            f0 = jnp.where(ut < eps, ut2 / (2 * eps) + eps / 2, ut)
            friction = c.friction_mu * jnp.sum(lam_n * f0)
        return inertia + elastic + contact + attach + friction

    # ------------------------------------------------------------- single env
    def _step_single(self, x, v, scene, aim_pos):
        c = self.cfg
        g = jnp.asarray(c.gravity, jnp.float32)
        x_tilde = x + c.dt * v + c.dt * c.dt * g

        # lagged friction basis from the starting configuration
        xs0 = x[self.surface_verts]
        sdf_fn = lambda p: sdf_ops.scene_sdf(
            p, scene.spheres, scene.boxes, scene.capsules, scene.planes
        )
        d0 = sdf_fn(xs0)
        n_dir = jax.vmap(jax.grad(lambda p: sdf_fn(p[None])[0]))(xs0)
        n_dir = n_dir / jnp.maximum(jnp.linalg.norm(n_dir, axis=-1, keepdims=True), 1e-9)
        dh = c.d_hat
        d0s = jnp.clip(d0, 1e-9, dh)
        # normal barrier force magnitude at d0 (|db/dd|), zero when inactive
        lam_n = jnp.where(
            d0 < dh,
            c.kappa * jnp.abs(2.0 * (d0s - dh) * jnp.log(d0s / dh) + (d0s - dh) ** 2 / d0s),
            0.0,
        )
        friction_basis = (lam_n, n_dir) if c.friction_mu > 0 else None

        energy = lambda xx: self._energy(xx, x_tilde, scene, aim_pos, x, friction_basis)

        def feasible(xx):
            return sdf_fn(xx[self.surface_verts]).min() > 0.0

        def newton_iter(_, carry):
            x_k, done = carry
            grad = jax.grad(energy)(x_k)

            hvp = lambda p: jax.jvp(jax.grad(energy), (x_k,), (p,))[1]
            # matrix-free CG with Jacobi-ish scaling by lumped mass
            precond = 1.0 / (self.masses[:, None] / c.dt**2)

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
                ok = (energy(x_try) < e0) & feasible(x_try)
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
    def step(self, state: SoftBodyState, scene: RigidSdfScene, aim_pos: jax.Array | None = None):
        """Advance all envs one dt. ``aim_pos``: (N, Va, 3) attachment targets."""
        n = state.x.shape[0]
        if aim_pos is None:
            aim_pos = jnp.zeros((n, max(int(self.attachment_verts.shape[0]), 1), 3))

        def one(x, v, sph, box, cap, pl, aim):
            sc = RigidSdfScene(sph, box, cap, pl)
            return self._step_single(x, v, sc, aim)

        x, v = jax.vmap(one)(
            state.x, state.v, scene.spheres, scene.boxes, scene.capsules, scene.planes, aim_pos
        )
        return SoftBodyState(x=x, v=v)

    def surface_positions(self, state: SoftBodyState) -> jax.Array:
        return state.x[:, self.surface_verts]
