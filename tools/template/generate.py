"""New-task scaffolder.

Counterpart of the reference's tools/template extension generator: creates a
new env package under tacex_tpu/envs/<name>/ with a working cfg/state/env
skeleton and a registration, wired to the sensor + physics stack.

Usage: python tools/template/generate.py my_task --id TacEx-My-Task-v0
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]

ENV_TEMPLATE = '''"""{title} task environment (generated scaffold)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...core import maths
from ...core.config import configclass
from ...physics.rigid import franka
from ..base import DirectRLEnv, DirectRLEnvCfg


@configclass
class {cls}Cfg(DirectRLEnvCfg):
    num_envs: int = 256
    episode_length_s: float = 10.0
    action_space: int = 6
    action_scale: float = 0.05


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class {cls}State:
    arm: franka.ArmState
    actions: jax.Array
    episode_length: jax.Array
    key: jax.Array


class {cls}(DirectRLEnv):
    cfg: {cls}Cfg

    def __init__(self, cfg: {cls}Cfg | None = None):
        super().__init__(cfg or {cls}Cfg())

    def init_state(self, key: jax.Array) -> {cls}State:
        n = self.cfg.num_envs
        return {cls}State(
            arm=franka.ArmState.init(n),
            actions=jnp.zeros((n, self.cfg.action_space)),
            episode_length=jnp.zeros((n,), jnp.int32),
            key=key,
        )

    def reset_all(self, state):
        state = self.init_state(state.key)
        return state, self._observations(state)

    def step(self, state, action):
        c = self.cfg
        actions = jnp.clip(jnp.nan_to_num(action), -1.0, 1.0) * c.action_scale
        arm = franka.apply_delta_pose_ik(state.arm, actions[:, :3], actions[:, 3:6])
        arm = franka.servo_step(arm, c.sim_dt)
        state = {cls}State(
            arm=arm, actions=actions,
            episode_length=state.episode_length + 1, key=state.key,
        )
        reward = jnp.zeros((c.num_envs,))  # TODO: task reward
        terminated = jnp.zeros((c.num_envs,), bool)  # TODO: failure conditions
        truncated = state.episode_length >= c.max_episode_length - 1
        obs = self._observations(state)
        return state, obs, reward, terminated, truncated, {{}}

    def _observations(self, state):
        tool_pos, tool_quat = franka.forward_kinematics(state.arm.q)[:2]
        return {{"proprio_obs": jnp.concatenate([tool_pos, state.actions], -1)}}
'''

INIT_TEMPLATE = '''from ..base import register
from .env import {cls}, {cls}Cfg

register("{env_id}", {cls}, lambda: {cls}Cfg())
'''


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("name", help="snake_case package name, e.g. my_task")
    p.add_argument("--id", default=None, help="gym-style env id")
    args = p.parse_args()

    name = args.name
    assert re.fullmatch(r"[a-z][a-z0-9_]*", name), "name must be snake_case"
    cls = "".join(w.capitalize() for w in name.split("_")) + "Env"
    env_id = args.id or f"TacEx-{'-'.join(w.capitalize() for w in name.split('_'))}-v0"
    title = name.replace("_", " ").title()

    pkg = REPO / "tacex_tpu" / "envs" / name
    pkg.mkdir(parents=True, exist_ok=False)
    (pkg / "env.py").write_text(ENV_TEMPLATE.format(cls=cls, title=title))
    (pkg / "__init__.py").write_text(INIT_TEMPLATE.format(cls=cls, env_id=env_id))

    init = REPO / "tacex_tpu" / "envs" / "__init__.py"
    init.write_text(init.read_text() + f"from . import {name}  # noqa: F401  (registers {env_id})\n")
    print(f"created {pkg} with env id {env_id}")


if __name__ == "__main__":
    main()
