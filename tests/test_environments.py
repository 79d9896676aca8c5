"""Environment sweep: random actions + NaN checks, mirroring the reference's
test strategy (reference source/tacex_tasks/test/test_environments.py:34-38 —
every registered env x {1, 32} envs x random-action steps, asserting all
obs/reward/done tensors are finite), plus physics-behavior checks the
reference never had (pure-JAX envs are unit-testable without a simulator).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu import envs

STEPS = 5


@pytest.mark.parametrize("env_id", envs.registered_envs())
@pytest.mark.parametrize("num_envs", [1, 4])
def test_random_actions_no_nans(env_id, num_envs):
    env = envs.make(env_id, num_envs=num_envs)
    key = jax.random.PRNGKey(0)
    state = env.init_state(key)
    state, obs = env.reset_all(state)
    step = jax.jit(env.step)

    for k in obs:
        assert bool(jnp.isfinite(obs[k]).all()), f"{k} has non-finite values at reset"

    akey = jax.random.PRNGKey(1)
    for i in range(STEPS):
        akey, sub = jax.random.split(akey)
        action = jax.random.uniform(sub, (num_envs, env.cfg.action_space), minval=-1.0, maxval=1.0)
        state, obs, reward, term, trunc, info = step(state, action)
        for k, v in obs.items():
            assert bool(jnp.isfinite(v).all()), f"step {i}: obs[{k}] non-finite"
        assert bool(jnp.isfinite(reward).all()), f"step {i}: reward non-finite"
        assert term.shape == (num_envs,) and trunc.shape == (num_envs,)


class TestBallRollingBehavior:
    @pytest.fixture(scope="class")
    def env(self):
        return envs.make("TacEx-Ball-Rolling-Taxim-Fots-v0", num_envs=4)

    def test_obs_contract(self, env):
        state = env.init_state(jax.random.PRNGKey(0))
        state, obs = env.reset_all(state)
        assert obs["proprio_obs"].shape == (4, 14)
        assert obs["vision_obs"].shape == (4, 24, 32, 3)

    def test_press_down_creates_contact(self, env):
        """Pushing the tool down presses the ball: indentation becomes > 0 and
        the tactile image responds."""
        state = env.init_state(jax.random.PRNGKey(0))
        state, obs = env.reset_all(state)
        step = jax.jit(env.step)
        down = jnp.tile(jnp.array([[0.0, 0.0, -0.3, 0.0, 0.0, 0.0]]), (4, 1))
        indent = None
        for _ in range(12):
            state, obs, reward, term, trunc, info = step(state, down)
            indent = info["indentation_depth"]
        assert float(indent.max()) > 0.1, f"no indentation after pressing: {indent}"

    def test_ball_stays_on_plate_when_idle(self, env):
        state = env.init_state(jax.random.PRNGKey(0))
        state, _ = env.reset_all(state)
        step = jax.jit(env.step)
        zero = jnp.zeros((4, 6))
        for _ in range(20):
            state, *_ = step(state, zero)
        z = np.asarray(state.ball_pos[:, 2])
        np.testing.assert_allclose(z, 0.0076, atol=5e-4)

    def test_done_on_ee_far_from_ball(self, env):
        """Moving the tool away from the ball terminates (ee_far condition)."""
        state = env.init_state(jax.random.PRNGKey(0))
        state, _ = env.reset_all(state)
        step = jax.jit(env.step)
        away = jnp.tile(jnp.array([[1.0, 1.0, 0.5, 0.0, 0.0, 0.0]]), (4, 1))
        terminated_seen = False
        for _ in range(25):
            state, obs, reward, term, trunc, info = step(state, away)
            if bool(term.any()):
                terminated_seen = True
                break
        assert terminated_seen

    def test_reset_restores_defaults(self, env):
        state = env.init_state(jax.random.PRNGKey(0))
        state, _ = env.reset_all(state)
        ball0 = np.asarray(state.ball_pos)
        step = jax.jit(env.step)
        away = jnp.tile(jnp.array([[1.0, -1.0, 0.5, 0.0, 0.0, 0.0]]), (4, 1))
        for _ in range(30):
            state, *_ = step(state, away)
        # post-termination the auto-reset must have restored ball + arm
        q = np.asarray(state.arm.q)
        ball = np.asarray(state.ball_pos)
        if np.any(np.all(np.abs(q - np.asarray(env._q0)) < 1e-4, axis=-1)):
            idx = np.where(np.all(np.abs(q - np.asarray(env._q0)) < 1e-4, axis=-1))[0]
            np.testing.assert_allclose(ball[idx], ball0[idx], atol=1e-3)

    def test_goals_randomized_per_env(self, env):
        state = env.init_state(jax.random.PRNGKey(3))
        state, _ = env.reset_all(state)
        goals = np.asarray(state.goal_pos)
        assert np.std(goals[:, 0]) > 0.01 or np.std(goals[:, 1]) > 0.01
