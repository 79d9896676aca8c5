"""Per-task tuned agent configurations.

Counterpart of the reference's per-task agent YAML tree
(source/tacex_tasks/tacex_tasks/*/agents/skrl_*_cfg.yaml and
factory/agents/rl_games_ppo_cfg.yaml): every gym id maps to the
hyperparameters its YAML carries, so `train.py --task X` picks the tuned
config exactly like the reference's gym.register(kwargs={"skrl_cfg_entry_point"}).

The reference's tuning splits cleanly by observation modality:
  * state-vector tasks (skrl_ppo_cfg.yaml): rollouts 24, epochs 8,
    mini-batches 4, KL target 0.01, entropy 0.001, obs standardization;
  * vision tasks (skrl_ppo_camera/tactile_rgb_cfg.yaml): rollouts 64,
    epochs 4, mini-batches 32, KL target 0.008, entropy 0;
  * Factory (rl_games_ppo_cfg.yaml): horizon 128, gamma 0.995, lr 1e-4.
"""

from __future__ import annotations

from .ppo import PPOConfig
from .sac import SACConfig

_STATE_PPO = dict(
    rollouts=24, learning_epochs=8, mini_batches=4,
    kl_threshold=0.01, entropy_loss_scale=0.001,
)
_VISION_PPO = dict(
    rollouts=64, learning_epochs=4, mini_batches=32,
    kl_threshold=0.008, entropy_loss_scale=0.0,
)
_FACTORY_PPO = dict(
    rollouts=128, learning_epochs=4, mini_batches=32,
    discount_factor=0.995, kl_threshold=0.008, entropy_loss_scale=0.0,
)

# task id -> PPO kwargs (reference agents/ YAML per task)
PPO_AGENT_CFGS: dict[str, dict] = {
    "TacEx-Ball-Rolling-Privileged-v0": _STATE_PPO,
    # NB lowercase "with" — matches the registered id (reference casing:
    # source/tacex_tasks/tacex_tasks/ball_rolling_privileged/__init__.py:40)
    "TacEx-Ball-Rolling-Privileged-Reset-with-IK-v0": _STATE_PPO,
    "TacEx-Ball-Rolling-Privileged-Without-Reaching-v0": _STATE_PPO,
    "TacEx-Ball-Rolling-Tactile-Depth-v1": _VISION_PPO,
    "TacEx-Ball-Rolling-Tactile-RGB-v0": _VISION_PPO,
    "TacEx-Ball-Rolling-Taxim-Fots-v0": _VISION_PPO,
    "TacEx-Ball-Rolling-Tactile-RGB-Uipc-v0": _VISION_PPO,
    "TacEx-Ball-Rolling-Uipc-Textured-v0": _VISION_PPO,
    "TacEx-Pole-Balancing-Base-v0": _VISION_PPO,
    "TacEx-Factory-PegInsert-Direct-v0": _FACTORY_PPO,
    "TacEx-Factory-GearMesh-Direct-v0": _FACTORY_PPO,
    "TacEx-Factory-NutThread-Direct-v0": _FACTORY_PPO,
    # coupled-world grasp (no reference counterpart): short horizon, state
    # policy — the state split's hyperparameters fit. A trained lift policy
    # earns ~13/step over a ~200-step horizon (returns ~1.2k), so the raw
    # critic's MSE reaches ~5e4 and its gradient monopolizes the shared
    # trunk under global-norm clipping — the round-4 64-env run collapsed
    # and re-converged twice from exactly this (logs/grasp_lift_ppo_r04).
    # The running value-target scaler keeps the critic loss O(1).
    "TacEx-Grasp-Lift-Uipc-v0": dict(_STATE_PPO, value_preprocessor=True),
    "TacEx-Grasp-Lift-Uipc-Depth-v0": dict(_VISION_PPO, value_preprocessor=True),
    "TacEx-Grasp-Lift-Uipc-Tactile-v0": dict(_VISION_PPO, value_preprocessor=True),
    # coupled-world Factory (FEM gel pads in the insertion station): Factory
    # horizon/discount with the grasp-lift value scaler
    "TacEx-Factory-PegInsert-Uipc-v0": dict(_FACTORY_PPO, value_preprocessor=True),
    "TacEx-Factory-PegInsert-Uipc-Depth-v0": dict(_FACTORY_PPO, value_preprocessor=True),
}

# skrl_sac_cfg.yaml: batch 256, lr 1e-4 (state) / 5e-4 grad steps (vision)
SAC_AGENT_CFGS: dict[str, dict] = {
    "TacEx-Ball-Rolling-Privileged-v0": dict(batch_size=256, actor_lr=1e-4, critic_lr=1e-4),
    "TacEx-Pole-Balancing-Base-v0": dict(batch_size=256),
    # vision task (reference skrl SAC variants, train.py --algorithm SAC):
    # dict obs flatten into the replay buffer — the 24x32x3 tactile image
    # makes each transition ~18 KB, so the buffer is sized to ~0.9 GB HBM;
    # smaller batches + higher critic lr keep the flattened-pixel critic
    # moving (the reference's SAC yaml pairs lr 5e-4 with batch 256)
    "TacEx-Ball-Rolling-Taxim-Fots-v0": dict(
        batch_size=256, buffer_size=20_000, actor_lr=3e-4, critic_lr=5e-4,
        rollout_steps=4, grad_steps=2,
    ),
}


def agent_cfg_for(task_id: str, algorithm: str = "ppo", **overrides):
    """Tuned config for a task (reference per-task YAML equivalent).

    ``overrides`` (e.g. a user's --rollouts) always win over the tuned
    values; unknown tasks fall back to the library defaults.
    """
    if algorithm == "sac":
        base = dict(SAC_AGENT_CFGS.get(task_id, {}))
        base.update({k: v for k, v in overrides.items() if v is not None})
        return SACConfig(**base)
    base = dict(PPO_AGENT_CFGS.get(task_id, {}))
    base.update({k: v for k, v in overrides.items() if v is not None})
    return PPOConfig(**base)
