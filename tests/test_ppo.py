"""PPO smoke + learning tests on a tiny env."""

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu import envs
from tacex_tpu.rl import PPO, PPOConfig


def _make():
    env = envs.make("TacEx-Ball-Rolling-Privileged-v0", num_envs=8)
    cfg = PPOConfig(rollouts=8, mini_batches=4, learning_epochs=2, hidden=(32, 32))
    return env, PPO(env, cfg)


class TestPPO:
    def test_train_step_runs_and_is_finite(self):
        env, ppo = _make()
        ts = ppo.init(jax.random.PRNGKey(0))
        step = ppo.jit_train_step()
        for _ in range(2):
            ts, metrics = step(ts)
        assert bool(jnp.isfinite(metrics["loss"]))
        assert bool(jnp.isfinite(metrics["reward_per_step"]))
        assert int(ts.steps) == 2 * 8 * 8

    def test_params_change(self):
        env, ppo = _make()
        ts = ppo.init(jax.random.PRNGKey(0))
        p0 = jax.tree_util.tree_leaves(ts.params)[0].copy()
        ts, _ = ppo.jit_train_step()(ts)
        p1 = jax.tree_util.tree_leaves(ts.params)[0]
        assert float(jnp.abs(p1 - p0).max()) > 0.0

    def test_act_deterministic(self):
        env, ppo = _make()
        ts = ppo.init(jax.random.PRNGKey(0))
        a1 = ppo.act(ts.params, ts.obs)
        a2 = ppo.act(ts.params, ts.obs)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
        assert a1.shape == (8, env.cfg.action_space)

    def test_vision_obs_env(self):
        env = envs.make("TacEx-Ball-Rolling-Taxim-Fots-v0", num_envs=4)
        ppo = PPO(env, PPOConfig(rollouts=4, mini_batches=2, learning_epochs=1, hidden=(32,)))
        ts = ppo.init(jax.random.PRNGKey(1))
        ts, metrics = ppo.jit_train_step()(ts)
        assert bool(jnp.isfinite(metrics["loss"]))


class TestSAC:
    def test_sac_train_step(self):
        from tacex_tpu.rl import SAC, SACConfig

        env = envs.make("TacEx-Ball-Rolling-Privileged-v0", num_envs=4)
        sac = SAC(env, SACConfig(buffer_size=2048, batch_size=64, rollout_steps=2, warmup_steps=8, hidden=(32, 32)))
        ts = sac.init(jax.random.PRNGKey(0))
        step = sac.jit_train_step()
        for _ in range(3):
            ts, metrics = step(ts)
        assert bool(jnp.isfinite(metrics["reward_per_step"]))
        assert bool(jnp.isfinite(metrics["critic_loss"]))
        assert int(ts.buffer.size) == 3 * 2 * 4

    def test_sac_act(self):
        from tacex_tpu.rl import SAC, SACConfig

        env = envs.make("TacEx-Ball-Rolling-Privileged-v0", num_envs=4)
        sac = SAC(env, SACConfig(hidden=(32,)))
        ts = sac.init(jax.random.PRNGKey(0))
        _, obs = env.reset_all(ts.env_state)
        a = sac.act(ts.actor_params, obs)
        assert a.shape == (4, env.cfg.action_space)
        assert float(jnp.abs(a).max()) <= 1.0
