"""Behavioral tests for the Factory insertion envs."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu import envs
from tacex_tpu.envs.factory.env import FactoryEnv, FactoryEnvCfg, peg_insert_task


def _deterministic_env(num_envs=2):
    """Peg-insert with all randomization off: the hand starts centered above
    the hole, so straight descent must insert and succeed."""
    t = peg_insert_task().replace(
        fixed_asset_init_pos_noise=(0.0, 0.0, 0.0),
        held_asset_pos_noise=(0.0, 0.0, 0.0),
        hand_init_pos=(0.0, 0.0, 0.03),
    )
    return FactoryEnv(FactoryEnvCfg(num_envs=num_envs, task=t))


class TestFactoryBehavior:
    def test_scripted_descent_succeeds(self):
        env = _deterministic_env()
        state = env.init_state(jax.random.PRNGKey(0))
        state, obs = env.reset_all(state)
        step = jax.jit(env.step)
        down = jnp.tile(jnp.array([[0.0, 0.0, -1.0, 0.0, 0.0, 0.0]]), (2, 1))
        succeeded = jnp.zeros((2,), bool)
        kp = []
        for i in range(80):
            state, obs, rew, term, trunc, info = step(state, down)
            kp.append(float(info["log"]["keypoint_dist"]))
            succeeded = succeeded | (info["log"]["successes"] > 0)
        # keypoint distance must shrink monotonically-ish during descent
        assert kp[-1] < kp[0] * 0.6, (kp[0], kp[-1])
        assert bool(jnp.asarray(succeeded).any()), "scripted aligned descent never succeeded"

    def test_misaligned_descent_blocked(self):
        """With a lateral grip offset bigger than the hole clearance, the peg
        rests on the block surface instead of penetrating."""
        env = _deterministic_env()
        state = env.init_state(jax.random.PRNGKey(0))
        state, _ = env.reset_all(state)
        state = dataclasses.replace(
            state, held_grip_offset=jnp.tile(jnp.array([[0.005, 0.0, 0.0]]), (2, 1))
        )
        step = jax.jit(env.step)
        down = jnp.tile(jnp.array([[0.0, 0.0, -1.0, 0.0, 0.0, 0.0]]), (2, 1))
        success_seen = False
        for _ in range(60):
            state, obs, rew, term, trunc, info = step(state, down)
            success_seen = success_seen or bool(info["log"]["successes"] > 0)
        assert not success_seen, "misaligned peg should not report success"

    def test_tactile_responds_to_insertion_force(self):
        env = _deterministic_env()
        state = env.init_state(jax.random.PRNGKey(1))
        state = dataclasses.replace(
            state, held_grip_offset=jnp.tile(jnp.array([[0.005, 0.0, 0.0]]), (2, 1))
        )
        state, obs0 = env.reset_all(state)
        step = jax.jit(env.step)
        down = jnp.tile(jnp.array([[0.0, 0.0, -1.0, 0.0, 0.0, 0.0]]), (2, 1))
        for _ in range(50):
            state, obs, rew, term, trunc, info = step(state, down)
        # pressing against the block deepens the grip indentation -> the
        # tactile image differs from the free-hanging frame
        tac = np.asarray(info["tactile_rgb_fingers"])
        assert np.isfinite(tac).all()
        assert tac.std() > 0.01
