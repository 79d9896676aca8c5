"""UIPC-compatible soft/rigid object wrappers.

API mirrors the reference's ``UipcObjectCfg``/``UipcObject``
(reference source/tacex_uipc/tacex_uipc/objects/uipc_object.py:54-483):
constitution configs (StableNeoHookean / AffineBody), tet-mesh provisioning,
initial-state reset via vertex writes. Differences by design:

  * meshes come from the structured generator or precomputed (points, tets)
    arrays instead of USD prims + wildmeshing;
  * every object is batched over ``num_envs`` (state (N, V, 3)) — the
    engine this wraps solves all envs in one vmapped Newton loop;
  * "kinematic" affine bodies are driven analytically (their pose is an
    input, SDF colliders for the soft solver), matching how the reference's
    kinematic ABD objects are used in its scenes.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import configclass
from ..physics.soft.ipc import RigidSdfScene, SoftBodyModel, SoftBodyState
from ..physics.soft.mesh import TetMesh, box_tet_mesh


@configclass
class StableNeoHookeanCfg:
    """FEM soft-body constitution (reference uipc_object.py:75-84)."""

    youngs_modulus: float = 0.145  # MPa (reference unit convention)
    poisson_rate: float = 0.45


@configclass
class AffineBodyConstitutionCfg:
    """Affine/rigid constitution (reference uipc_object.py:66-73).

    ``kinematic=True`` bodies are held at their pose by a strong soft
    constraint AND baked into the FEM/shell solvers' static triangle soup at
    their CONSTRUCTION pose — a kinematic collider that is meant to move
    (motor/provider) must instead be a dynamic body in the unified contact
    world (UipcSimCfg.contact.unified_fem_abd), where its current pose is
    seen by soft bodies every step.
    """

    m_kappa: float = 100.0  # MPa
    kinematic: bool = False


@configclass
class NeoHookeanShellCfg:
    """Shell/cloth constitution (libuipc NeoHookeanShell +
    DiscreteShellBending; reference 11_bunny_cloth.py:72-79: 10 kPa,
    nu=0.499, thickness 1 mm, density via mass_density, bending E=10)."""

    youngs_modulus: float = 0.01  # MPa (sample: 10 kPa)
    poisson_rate: float = 0.3
    thickness: float = 0.001  # m
    bending_E: float = 10.0  # DiscreteShellBending stiffness


@configclass
class TetMeshCfg:
    """Mesh generation config (reference mesh_gen.py:18-106 uses fTetWild
    quality knobs; the structured generator replaces them with a resolution)."""

    size: tuple = (0.02, 0.025, 0.0045)
    resolution: tuple = (8, 10, 3)
    center: tuple = (0.0, 0.0, 0.0)


@configclass
class UipcObjectCfg:
    mesh_cfg: TetMeshCfg = None
    mass_density: float = 1000.0
    constitution: Any = None  # StableNeoHookeanCfg | AffineBodyConstitutionCfg
    attachment_cfg: Any = None  # UipcIsaacAttachmentsCfg

    def __post_init__(self):
        if self.mesh_cfg is None:
            self.mesh_cfg = TetMeshCfg()
        if self.constitution is None:
            self.constitution = StableNeoHookeanCfg()


def _fit_affine_pose(rest: np.ndarray, pos: jax.Array) -> jax.Array:
    """Least-squares affine fit: rest (V, 3), pos (..., V, 3) -> q (..., 12)
    with x = A p + t (row-of-A layout, abd.q_to_affine convention)."""
    rest = jnp.asarray(rest, jnp.float32)
    rc = rest.mean(0)
    Pc = rest - rc
    xc = pos.mean(-2)
    Xc = pos - xc[..., None, :]
    M = jnp.einsum("...vi,vj->...ij", Xc, Pc)  # (..., 3, 3)
    C = Pc.T @ Pc + 1e-12 * jnp.eye(3)
    A = M @ jnp.linalg.inv(C)
    t = xc - jnp.einsum("...ij,j->...i", A, rc)
    return jnp.concatenate([t, A.reshape(A.shape[:-2] + (9,))], axis=-1)


class UipcObject:
    """A (batched) soft body registered with a UipcSim.

    Reference lifecycle preserved: construct vs a sim -> setup_sim finalizes
    -> per-step advance; ``write_vertex_positions_to_sim`` resets vertex
    state (the forked-libuipc reset mechanism, uipc_object.py:316-370).
    """

    def __init__(
        self,
        cfg: UipcObjectCfg,
        uipc_sim,
        mesh: TetMesh | None = None,
        points: np.ndarray | None = None,
        tets: np.ndarray | None = None,
        triangles: np.ndarray | None = None,
    ):
        self.cfg = cfg
        self.sim = uipc_sim
        # Affine bodies only need a closed surface mesh (libuipc walking-cube
        # reads cube.obj trimesh, 5_walking_cube:86-88): accept (points,
        # triangles) without tets for the ABD constitution.
        if (
            mesh is None
            and tets is None
            and points is not None
            and triangles is not None
            and isinstance(cfg.constitution, (AffineBodyConstitutionCfg, NeoHookeanShellCfg))
        ):
            tris = np.asarray(triangles, np.int32)
            mesh = TetMesh(
                points=np.asarray(points, np.float32),
                tets=np.zeros((0, 4), np.int32),
                surface_tris=tris,
                surface_verts=np.unique(tris).astype(np.int32),
            )
        if mesh is None:
            if points is not None and tets is not None:
                from ..physics.soft.mesh import extract_surface

                tris = extract_surface(np.asarray(tets, np.int32), np.asarray(points, np.float32))
                mesh = TetMesh(
                    points=np.asarray(points, np.float32),
                    tets=np.asarray(tets, np.int32),
                    surface_tris=tris,
                    surface_verts=np.unique(tris).astype(np.int32),
                )
            else:
                mc = cfg.mesh_cfg
                mesh = box_tet_mesh(tuple(mc.size), tuple(mc.resolution), tuple(mc.center))
        self.mesh = mesh
        self.model: SoftBodyModel | None = None
        self.state: SoftBodyState | None = None
        self.init_vertex_pos = np.asarray(mesh.points, np.float32)
        self._attachment_verts: np.ndarray | None = None
        self._aim_provider = None
        self._union_range: tuple[int, int] | None = None
        # ABD bookkeeping (filled by UipcSim._setup_abd)
        self._abd_index: int | None = None
        self._abd_aim_provider = None
        self._abd_aim_strength: float = 0.0
        self._abd_motor: tuple[np.ndarray, float] | None = None
        uipc_sim.register_object(self)

    @property
    def is_affine_body(self) -> bool:
        return isinstance(self.cfg.constitution, AffineBodyConstitutionCfg)

    @property
    def is_shell(self) -> bool:
        return isinstance(self.cfg.constitution, NeoHookeanShellCfg)

    # ------------------------------------------------- ABD constraint surface
    def set_transform_target(self, provider=None, strength: float = 100.0) -> None:
        """SoftTransformConstraint (reference stc.apply_to(mesh, strength),
        5_walking_cube:104): pull this affine body's 12-DOF state toward a
        target. ``provider() -> (N, 12)`` or None to hold the initial pose."""
        assert self.is_affine_body, "transform targets are for affine bodies"
        self._abd_aim_provider = provider
        self._abd_aim_strength = float(strength)

    def set_rotating_motor(self, axis, rot_vel: float, strength: float = 100.0) -> None:
        """RotatingMotor (reference rm.apply_to(mesh, 100, motor_rot_vel=pi),
        5_walking_cube:98): the aim transform is advanced by ``rot_vel * dt``
        about ``axis`` every step."""
        assert self.is_affine_body, "motors are for affine bodies"
        self._abd_motor = (np.asarray(axis, np.float32), float(rot_vel))
        self._abd_aim_strength = float(strength)

    # ------------------------------------------------------------ finalization
    def set_attachments(self, vertex_ids: np.ndarray, aim_provider=None, strength_ratio: float = 100.0):
        self._attachment_verts = np.asarray(vertex_ids, np.int32)
        self._aim_provider = aim_provider
        self._attachment_strength = strength_ratio

    def _finalize(self, sim, static_tris=None) -> None:
        if self.is_shell:
            from ..physics.soft.shell import ShellModel

            con = self.cfg.constitution
            self.model = ShellModel(
                self.mesh.points,
                self.mesh.surface_tris,
                youngs_modulus=con.youngs_modulus * 1e6,  # MPa -> Pa
                poisson_ratio=con.poisson_rate,
                thickness=con.thickness,
                mass_density=self.cfg.mass_density,
                bending_stiffness=con.bending_E,
                cfg=sim.cfg.to_shell_cfg(),
                static_tris=static_tris,
                attachment_verts=self._attachment_verts,
                attachment_strength_ratio=getattr(self, "_attachment_strength", 100.0),
            )
            self.state = SoftBodyState.init(sim.cfg.num_envs, self.mesh.points)
            self._step = jax.jit(self.model.step)
            return
        assert isinstance(self.cfg.constitution, StableNeoHookeanCfg), (
            "affine bodies are finalized by UipcSim._setup_abd"
        )
        con = self.cfg.constitution
        self.model = SoftBodyModel(
            self.mesh,
            youngs_modulus=con.youngs_modulus * 1e6,  # MPa -> Pa
            poisson_ratio=con.poisson_rate,
            mass_density=self.cfg.mass_density,
            cfg=sim.cfg.to_solver_cfg(),
            attachment_verts=self._attachment_verts,
            attachment_strength_ratio=getattr(self, "_attachment_strength", 100.0),
            static_tris=static_tris,
        )
        self.state = SoftBodyState.init(sim.cfg.num_envs, self.mesh.points)
        self._step = jax.jit(self.model.step)

    def _set_union_view(self, sim, lo: int, hi: int) -> None:
        """Union contact world: this object's vertices live in the sim's
        shared model at [lo:hi); its state is a materialized slice."""
        self._union_range = (lo, hi)
        self.model = None
        self._refresh_union_slice()

    def _refresh_union_slice(self) -> None:
        lo, hi = self._union_range
        u = self.sim._union_state
        self.state = SoftBodyState(x=u.x[:, lo:hi], v=u.v[:, lo:hi])

    # ------------------------------------------------------------------- step
    def _advance(self, scene: RigidSdfScene, scene_prev: RigidSdfScene | None = None) -> None:
        if self._aim_provider is not None:
            aim = self._aim_provider()
        elif self._attachment_verts is not None and len(self._attachment_verts) > 0:
            # provider-less attachments HOLD their initial positions (same
            # convention as the union path — a None aim would become a
            # zeros target and pull every anchored vertex to the origin)
            aim = jnp.broadcast_to(
                jnp.asarray(self.init_vertex_pos[self._attachment_verts]),
                (self.state.x.shape[0], len(self._attachment_verts), 3),
            )
        else:
            aim = None
        if not self.is_shell and scene_prev is not None:
            # FEM solver sweeps kinematic colliders prev->current when
            # ccd_substeps > 1 (shell standalone path keeps the cheap call);
            # attachment aims sweep alongside (round-4 advice)
            aim_prev = getattr(self, "_aim_prev", None)
            self.state = self._step(self.state, scene, aim, scene_prev, aim_prev)
        else:
            self.state = self._step(self.state, scene, aim)
        self._aim_prev = aim

    # ------------------------------------------------------------------ views
    def surface_positions(self) -> jax.Array:
        if self.is_affine_body:
            return self.sim.abd_vertex_positions(self)
        if self._union_range is not None:
            return self.state.x[:, jnp.asarray(self.mesh.surface_verts)]
        return self.model.surface_positions(self.state)

    @property
    def nodal_pos_w(self) -> jax.Array:
        """(N, V, 3) — reference UipcObjectDeformableData.nodal_pos_w."""
        if self.is_affine_body:
            return self.sim.abd_vertex_positions(self)
        return self.state.x

    @property
    def root_pos_w(self) -> jax.Array:
        """(N, 3) mean of surface verts (uipc_object_deformable_data.py);
        for affine bodies = surface mean like UipcObjectRigidData."""
        return self.surface_positions().mean(axis=1)

    def write_vertex_positions_to_sim(self, positions: jax.Array, env_mask: jax.Array | None = None):
        """Reset mechanism (reference forked write_vertex_pos_to_sim)."""
        if self.is_affine_body:
            # Affine bodies carry 12 DOFs, not vertices: honor the caller's
            # positions by writing the BEST-FIT affine pose (least-squares
            # (A, t) vs the rest points — exact whenever ``positions`` is an
            # affine transform of them, e.g. a randomized reset pose).
            q = _fit_affine_pose(self.mesh.points, jnp.asarray(positions))
            self.sim.write_abd_pose(self, q, env_mask)
            return
        if env_mask is None:
            x = jnp.broadcast_to(positions, self.state.x.shape)
            new = SoftBodyState(x=x, v=jnp.zeros_like(x))
        else:
            m = env_mask[:, None, None]
            x = jnp.where(m, positions, self.state.x)
            v = jnp.where(m, 0.0, self.state.v)
            new = SoftBodyState(x=x, v=v)
        if self._union_range is not None:
            lo, hi = self._union_range
            u = self.sim._union_state
            self.sim._union_state = SoftBodyState(
                x=u.x.at[:, lo:hi].set(new.x), v=u.v.at[:, lo:hi].set(new.v)
            )
            self._refresh_union_slice()
        else:
            self.state = new
