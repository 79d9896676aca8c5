"""Soft-body <-> rigid coupling: UipcIsaacAttachments equivalent.

The reference couples the FEM gel to PhysX rigid links with soft position
constraints: it finds the tet vertices lying on the rigid collider with
sphere-sweep raycasts, stores their offsets in the body frame, and writes
per-step aim positions from the link transform (reference
source/tacex_uipc/tacex_uipc/sim/uipc_attachments.py:69-497).

Here the same three phases are geometric + functional:
  * ``compute_attachment_data``: select vertices within ``radius`` of the
    mount plane/pose and record body-frame offsets (no PhysX queries — the
    geometry is known analytically);
  * per-step: ``aim_positions(body_pos, body_quat)`` maps the stored offsets
    through the rigid pose, batched over envs;
  * the solver applies the soft position constraint
    (physics/soft/ipc.py attachments) with strength ratio x vertex mass
    (UipcIsaacAttachmentsCfg.constraint_strength_ratio).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import maths
from ..core.config import configclass


@configclass
class UipcIsaacAttachmentsCfg:
    """Reference field names (uipc_attachments.py:36-66)."""

    constraint_strength_ratio: float = 100.0
    body_name: str = ""
    compute_attachment_data: bool = True
    attachment_points_radius: float = 5e-4


class UipcIsaacAttachments:
    """Binds selected soft-body vertices to a rigid pose."""

    def __init__(self, cfg: UipcIsaacAttachmentsCfg, uipc_object, body_pose0=None):
        self.cfg = cfg
        self.obj = uipc_object
        self.vertex_ids: np.ndarray | None = None
        self.offsets: np.ndarray | None = None  # (Va, 3) in body frame
        if body_pose0 is not None:
            self.compute_attachment_data(*body_pose0)

    def compute_attachment_data(
        self,
        body_pos: np.ndarray,  # (3,) rigid mount pose (single, rest config)
        body_quat: np.ndarray,  # (4,)
        selector=None,
    ) -> None:
        """Select attachment vertices and record body-frame offsets.

        ``selector(points) -> bool mask`` defaults to "within
        attachment_points_radius of the mount origin plane along the body z
        axis" — the analytic stand-in for the reference's sphere-sweep
        against the collider surface (uipc_attachments.py:247-346).
        """
        pts = self.obj.mesh.points
        if selector is None:
            rot = np.asarray(maths.matrix_from_quat(jnp.asarray(body_quat, jnp.float32)))
            local = (pts - np.asarray(body_pos)) @ rot  # body-frame coords
            mask = np.abs(local[:, 2]) <= self.cfg.attachment_points_radius
        else:
            mask = selector(pts)
        self.vertex_ids = np.where(mask)[0].astype(np.int32)
        rot = np.asarray(maths.matrix_from_quat(jnp.asarray(body_quat, jnp.float32)))
        self.offsets = ((pts[self.vertex_ids] - np.asarray(body_pos)) @ rot).astype(np.float32)
        self.obj.set_attachments(
            self.vertex_ids,
            aim_provider=None,
            strength_ratio=self.cfg.constraint_strength_ratio,
        )

    def aim_positions(self, body_pos: jax.Array, body_quat: jax.Array) -> jax.Array:
        """(N, Va, 3) world aim positions from batched rigid poses
        (the per-step physics callback, uipc_attachments.py:387-421)."""
        off = jnp.asarray(self.offsets)
        return maths.transform_points(off, body_pos, body_quat)
