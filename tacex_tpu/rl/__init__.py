from .networks import ActorCritic  # noqa: F401
from .ppo import PPO, PPOConfig, TrainState  # noqa: F401
from .sac import SAC, SACConfig  # noqa: F401
