"""ManiSkillSimulator: the FEM marker-flow sensor approach facade.

API-parity counterpart of the reference's ``ManiSkillSimulator``
(reference source/tacex/.../fem_based/mani_skill_sim.py:22-318), which wraps
``VisionTactileSensorUIPC`` over a UIPC gel pad. Here it binds a
:class:`FemMarkerFlow` to a batched soft-body gel (uipc.UipcObject or a raw
SoftBodyModel/state) and produces the ``marker_flow`` sensor output; unlike
the reference it is batched over envs (the reference hard-codes env 0,
mani_skill_sim.py:84-85).
"""

from __future__ import annotations

import numpy as np

import jax

from ....core import maths
from .marker_flow import FemMarkerFlow, ManiSkillSimulatorCfg


class ManiSkillSimulator:
    """Marker-flow simulation from a FEM gel surface."""

    def __init__(
        self,
        cfg: ManiSkillSimulatorCfg,
        gel_mesh,  # physics.soft.mesh.TetMesh (tool frame, contact face at max z)
        cam_to_contact: float = 0.0285,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.mesh = gel_mesh
        remap = -np.ones(gel_mesh.num_vertices, np.int64)
        remap[gel_mesh.surface_verts] = np.arange(len(gel_mesh.surface_verts))
        tris = remap[gel_mesh.surface_tris].astype(np.int32)
        rest_cam = gel_mesh.points[gel_mesh.surface_verts].copy()
        rest_cam[:, 2] += cam_to_contact - gel_mesh.points[:, 2].max()
        self.flow_gen = FemMarkerFlow(cfg, rest_cam.astype(np.float32), tris, seed=seed)

    def marker_motion_simulation(
        self,
        gel_state,  # SoftBodyState (world frame)
        surface_verts: jax.Array,  # indices of surface verts in the state
        cam_pos: jax.Array,  # (N, 3)
        cam_quat: jax.Array,  # (N, 4)
        key: jax.Array,
    ) -> jax.Array:
        """(N, 2, marker_flow_size, 2) marker flow (init_uv, curr_uv)."""
        surf_world = gel_state.x[:, surface_verts]
        surf_cam = maths.quat_apply_inverse(cam_quat[:, None], surf_world - cam_pos[:, None])
        return self.flow_gen.flow(surf_cam, key)
