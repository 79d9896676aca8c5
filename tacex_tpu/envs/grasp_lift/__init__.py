"""Grasp-and-lift task registrations.

No reference counterpart: the reference's libuipc scenes are single-env
(SURVEY §2.6) so it has no batched grasp RL task — this env exists to
exercise the round-3 unified FEM<->ABD contact world at RL scale.
"""

from ..base import register
from .env import GraspLiftEnv, GraspLiftEnvCfg

register(
    "TacEx-Grasp-Lift-Uipc-v0",
    GraspLiftEnv,
    lambda: GraspLiftEnvCfg(),
)
register(
    "TacEx-Grasp-Lift-Uipc-Depth-v0",
    GraspLiftEnv,
    # cheap mode: dense 16x16 embedded COMPRESSION image per pad
    lambda: GraspLiftEnvCfg().replace(obs_mode="depth", tactile_embed=(16, 16)),
)
register(
    "TacEx-Grasp-Lift-Uipc-Tactile-v0",
    GraspLiftEnv,
    # full GelSight stack: per-pad Taxim tactile RGB + FOTS marker motion
    # rendered from the embedded dense inner-face surface (32x32 camera)
    lambda: GraspLiftEnvCfg().replace(obs_mode="tactile", tactile_embed=(32, 32)),
)
