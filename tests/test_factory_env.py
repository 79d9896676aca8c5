"""Behavioral tests for the Factory insertion envs (round-2 dynamic version).

The held asset is a 6-DoF body under grasp + SDF contact forces and tactile
images are rendered from its real mesh per finger — so these tests assert
the EMERGENT behaviors the VERDICT demanded: aligned descent succeeds,
misaligned descent jams, and misalignment loads one finger visibly more
than the other.
"""

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
        hand_init_pos_noise=(0.0, 0.0, 0.0),
        hand_init_pos=(0.0, 0.0, 0.03),
    )
    return FactoryEnv(FactoryEnvCfg(num_envs=num_envs, task=t))


def _set_grip_offset(state, off):
    n = state.grip_offset.shape[0]
    return dataclasses.replace(
        state, grip_offset=jnp.tile(jnp.asarray(off, jnp.float32)[None], (n, 1))
    )


DOWN = jnp.array([[0.0, 0.0, -1.0, 0.0, 0.0, 0.0]])


class TestFactoryBehavior:
    def test_scripted_descent_succeeds(self):
        env = _deterministic_env()
        state = env.init_state(jax.random.PRNGKey(0))
        state, obs = env.reset_all(state)
        step = jax.jit(env.step)
        down = jnp.tile(DOWN, (2, 1))
        succeeded = jnp.zeros((2,), bool)
        kp = []
        for i in range(80):
            state, obs, rew, term, trunc, info = step(state, down)
            kp.append(float(info["log"]["keypoint_dist"]))
            succeeded = succeeded | (info["log"]["successes"] > 0)
        assert kp[-1] < kp[0] * 0.6, (kp[0], kp[-1])
        assert bool(jnp.asarray(succeeded).any()), "scripted aligned descent never succeeded"

    def test_misaligned_descent_blocked(self):
        """With a lateral grip offset bigger than the hole clearance, the peg
        jams on the block surface: no success, sustained contact force."""
        env = _deterministic_env()
        state = env.init_state(jax.random.PRNGKey(0))
        state, _ = env.reset_all(state)
        state = _set_grip_offset(state, [0.005, 0.0, 0.0])
        step = jax.jit(env.step)
        down = jnp.tile(DOWN, (2, 1))
        success_seen = False
        fz = 0.0
        for _ in range(60):
            state, obs, rew, term, trunc, info = step(state, down)
            success_seen = success_seen or bool(info["log"]["successes"] > 0)
            fz = max(fz, float(info["log"]["contact_force_z"]))
        assert not success_seen, "misaligned peg should not report success"
        assert fz > 0.5, f"jamming should build real contact force, got {fz}"
        # the peg tip must still be at/above the block top
        top_z = float(state.fixed_pos[0, 2]) + env.cfg.task.fixed_size[2] / 2
        assert float(state.held.pos[:, 2].min()) > top_z - 0.004

    def test_misalignment_loads_one_finger_more(self):
        """VERDICT item #3 'done' criterion: a grip offset along the finger
        axis makes the two tactile images visibly different."""
        env = _deterministic_env()
        state = env.init_state(jax.random.PRNGKey(1))
        state, _ = env.reset_all(state)
        # offset along hand-y = the finger axis
        state = _set_grip_offset(state, [0.0, 0.0025, 0.0])
        step = jax.jit(env.step)
        down = jnp.tile(DOWN, (2, 1))
        for _ in range(30):
            state, obs, rew, term, trunc, info = step(state, down)
        tac = np.asarray(info["tactile_rgb_fingers"])  # (N, 2, h, w, 3)
        assert np.isfinite(tac).all()
        left, right = tac[:, 0], tac[:, 1]
        asym = np.abs(left - right).mean()
        # centered control: fingers see (nearly) the same image
        state2 = env.init_state(jax.random.PRNGKey(2))
        state2, _ = env.reset_all(state2)
        for _ in range(30):
            state2, _, _, _, _, info2 = step(state2, down)
        tac2 = np.asarray(info2["tactile_rgb_fingers"])
        asym2 = np.abs(tac2[:, 0] - tac2[:, 1]).mean()
        assert asym > 2.0 * asym2 + 1e-4, (asym, asym2)

    def test_tactile_shows_the_held_asset(self):
        """The finger image must contain actual contact structure (rendered
        from the peg mesh), not a flat background."""
        env = _deterministic_env()
        state = env.init_state(jax.random.PRNGKey(3))
        state, _ = env.reset_all(state)
        step = jax.jit(env.step)
        still = jnp.zeros((2, 6))
        state, obs, rew, term, trunc, info = step(state, still)
        tac = np.asarray(info["tactile_rgb_fingers"])
        assert np.isfinite(tac).all()
        assert tac.std() > 0.01

    def test_gear_and_nut_envs_step(self):
        for env_id in ("TacEx-Factory-GearMesh-Direct-v0", "TacEx-Factory-NutThread-Direct-v0"):
            env = envs.make(env_id, num_envs=2)
            state = env.init_state(jax.random.PRNGKey(0))
            state, obs = env.reset_all(state)
            step = jax.jit(env.step)
            key = jax.random.PRNGKey(1)
            for _ in range(5):
                key, k = jax.random.split(key)
                a = jax.random.uniform(k, (2, 6), minval=-1.0, maxval=1.0)
                state, obs, rew, term, trunc, info = step(state, a)
            for leaf in jax.tree_util.tree_leaves(obs):
                assert bool(jnp.isfinite(leaf).all())
            assert bool(jnp.isfinite(rew).all())
