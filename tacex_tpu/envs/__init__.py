from .base import DirectRLEnv, DirectRLEnvCfg, make, register, registered_envs  # noqa: F401
from . import ball_rolling  # noqa: F401  (registers TacEx-Ball-Rolling-*)
from . import pole_balancing  # noqa: F401  (registers TacEx-Pole-Balancing-*)
from . import factory  # noqa: F401  (registers TacEx-Factory-*)
from . import grasp_lift  # noqa: F401  (registers TacEx-Grasp-Lift-*)
