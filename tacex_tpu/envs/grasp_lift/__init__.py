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
    "TacEx-Grasp-Lift-Uipc-Tactile-v0",
    GraspLiftEnv,
    # dense 16x16 embedded tactile image per pad at coarse-solve cost
    lambda: GraspLiftEnvCfg().replace(obs_mode="depth", tactile_embed=(16, 16)),
)
