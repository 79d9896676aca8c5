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

# Reference parity: 100 random steps x {1, 32} envs per registered id
# (reference test/utils/env_test_utils.py:159-276). The rollout is a single
# lax.scan so the sweep compiles once per (env_id, num_envs).
STEPS = 100

# Coupled-world envs (one Newton solve over FEM + ABD DOFs per substep) are
# ~7 s/step at 32 envs on the CPU test platform — even a reduced sweep cell
# costs minutes. Their full coverage (random-action NaN/termination sweep,
# scripted lift, mu=0 control, auto-reset, tactile) lives in
# tests/test_grasp_lift.py at a scale that fits its own file budget.
_OWN_SUITE = {
    "TacEx-Grasp-Lift-Uipc-v0",
    "TacEx-Grasp-Lift-Uipc-Depth-v0",
    "TacEx-Grasp-Lift-Uipc-Tactile-v0",
    "TacEx-Factory-PegInsert-Uipc-v0",  # tests/test_factory_uipc.py
    "TacEx-Factory-PegInsert-Uipc-Depth-v0",
}


@pytest.mark.parametrize("env_id", envs.registered_envs())
@pytest.mark.parametrize("num_envs", [1, 32])
def test_random_actions_no_nans(env_id, num_envs):
    if env_id in _OWN_SUITE:
        pytest.skip("coupled-world env: swept in tests/test_grasp_lift.py")
    env = envs.make(env_id, num_envs=num_envs)
    key = jax.random.PRNGKey(0)
    state = env.init_state(key)
    state, obs = env.reset_all(state)

    for k in obs:
        assert bool(jnp.isfinite(obs[k]).all()), f"{k} has non-finite values at reset"

    # Truncation-only families (Factory) need the full horizon to see a done.
    steps = min(max(STEPS, int(env.cfg.max_episode_length)), 200)
    actions = jax.random.uniform(
        jax.random.PRNGKey(1), (steps, num_envs, env.cfg.action_space), minval=-1.0, maxval=1.0
    )
    rollout = jax.jit(env.rollout_fn(steps))
    final_state, (obs_seq, rew_seq, term_seq, trunc_seq) = rollout(state, actions)

    for k, v in obs_seq.items():
        assert bool(jnp.isfinite(v).all()), f"obs[{k}] non-finite during rollout"
    assert bool(jnp.isfinite(rew_seq).all()), "reward non-finite during rollout"
    assert term_seq.shape == (steps, num_envs) and trunc_seq.shape == (steps, num_envs)
    # 100 random steps must hit at least one termination (and hence an
    # in-rollout masked reset) — random actions wander out of bounds /
    # too-far-from-object in every registered task family.
    assert bool((term_seq | trunc_seq).any()), f"no termination in {steps} random steps"
    # the reset actually re-zeroed episode bookkeeping for the done envs
    n_done_final = int((term_seq[-1] | trunc_seq[-1]).sum())
    if n_done_final:
        assert int((final_state_episode_length(final_state) == 0).sum()) >= n_done_final


def final_state_episode_length(state):
    base = getattr(state, "base", state)
    return base.episode_length


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


class TestDomainRandomization:
    """EventCfg-style per-env physics randomization (reference
    ball_rolling_taxim_fots.py:84-165)."""

    def test_dr_fields_vary_across_envs(self):
        env = envs.make("TacEx-Ball-Rolling-Taxim-Fots-v0", num_envs=16)
        state = env.init_state(jax.random.PRNGKey(0))
        state, _ = env.reset_all(state)
        dr = state.dr
        for name in ("ball_friction", "ball_mass", "plate_friction", "pad_friction", "gravity_z"):
            v = np.asarray(getattr(dr, name))
            assert v.std() > 1e-4, f"{name} not randomized: {v[:4]}"
        assert np.all(np.asarray(dr.ball_mass) > 0)

    def test_dr_disabled_gives_defaults(self):
        env = envs.make("TacEx-Ball-Rolling-Taxim-Fots-v0", num_envs=8)
        env.cfg.events_cfg["enabled"] = False
        state = env.init_state(jax.random.PRNGKey(0))
        state, _ = env.reset_all(state)
        np.testing.assert_allclose(np.asarray(state.dr.ball_friction), env.cfg.ball_friction)
        np.testing.assert_allclose(np.asarray(state.dr.gravity_z), -9.81)

    def test_dr_resampled_only_for_reset_envs(self):
        env = envs.make("TacEx-Ball-Rolling-Taxim-Fots-v0", num_envs=8)
        state = env.init_state(jax.random.PRNGKey(0))
        state, _ = env.reset_all(state)
        before = np.asarray(state.dr.ball_friction)
        mask = jnp.zeros((8,), bool).at[3].set(True)
        state2 = env._reset_where(state, mask)
        after = np.asarray(state2.dr.ball_friction)
        assert after[3] != before[3]
        np.testing.assert_array_equal(np.delete(after, 3), np.delete(before, 3))
