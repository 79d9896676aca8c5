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
    """Affine/rigid constitution (reference uipc_object.py:66-73)."""

    m_kappa: float = 100.0  # MPa
    kinematic: bool = False


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
    ):
        self.cfg = cfg
        self.sim = uipc_sim
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
        uipc_sim.register_object(self)

    # ------------------------------------------------------------ finalization
    def set_attachments(self, vertex_ids: np.ndarray, aim_provider=None, strength_ratio: float = 100.0):
        self._attachment_verts = np.asarray(vertex_ids, np.int32)
        self._aim_provider = aim_provider
        self._attachment_strength = strength_ratio

    def _finalize(self, sim) -> None:
        if not isinstance(self.cfg.constitution, StableNeoHookeanCfg):
            raise NotImplementedError(
                "kinematic/affine bodies are driven analytically as SDF "
                "colliders; only FEM soft bodies carry solver state"
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
    def _advance(self, scene: RigidSdfScene) -> None:
        aim = self._aim_provider() if self._aim_provider is not None else None
        self.state = self._step(self.state, scene, aim)

    # ------------------------------------------------------------------ views
    def surface_positions(self) -> jax.Array:
        if self._union_range is not None:
            return self.state.x[:, jnp.asarray(self.mesh.surface_verts)]
        return self.model.surface_positions(self.state)

    @property
    def nodal_pos_w(self) -> jax.Array:
        """(N, V, 3) — reference UipcObjectDeformableData.nodal_pos_w."""
        return self.state.x

    @property
    def root_pos_w(self) -> jax.Array:
        """(N, 3) mean of surface verts (uipc_object_deformable_data.py)."""
        return self.surface_positions().mean(axis=1)

    def write_vertex_positions_to_sim(self, positions: jax.Array, env_mask: jax.Array | None = None):
        """Reset mechanism (reference forked write_vertex_pos_to_sim)."""
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
