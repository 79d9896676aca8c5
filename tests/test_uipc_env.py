"""Behavior tests for the batched FEM-gelpad ball-rolling env."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu import envs


@pytest.fixture(scope="module")
def env():
    return envs.make("TacEx-Ball-Rolling-Tactile-RGB-Uipc-v0", num_envs=2)


class TestUipcEnv:
    def test_batched_fem_envs(self, env):
        """More than one FEM env steps concurrently — the capability the
        reference lacks (its libuipc scene is single-env)."""
        state = env.init_state(jax.random.PRNGKey(0))
        state, obs = env.reset_all(state)
        step = jax.jit(env.step)
        down = jnp.tile(jnp.array([[0.0, 0.0, -0.08, 0.0, 0.0, 0.0]]), (2, 1))
        for _ in range(6):
            state, obs, rew, term, trunc, info = step(state, down)
        assert bool(jnp.isfinite(state.gel.x).all())
        assert state.gel.x.shape[0] == 2
        assert bool(jnp.isfinite(rew).all())
        assert info["marker_flow"].shape == (2, 2, 128, 2)

    def test_gel_deforms_under_press(self, env):
        state = env.init_state(jax.random.PRNGKey(0))
        state, _ = env.reset_all(state)
        step = jax.jit(env.step)
        rest_contact = np.asarray(state.gel.x[0])
        down = jnp.tile(jnp.array([[0.0, 0.0, -0.08, 0.0, 0.0, 0.0]]), (2, 1))
        for _ in range(8):
            state, obs, rew, term, trunc, info = step(state, down)
        x = np.asarray(state.gel.x[0])
        # the gel moved down with the tool and deformed (non-rigid motion)
        disp = x - rest_contact
        assert disp[:, 2].mean() < -1e-4
        assert disp[:, 2].std() > 1e-5  # non-uniform -> actual deformation
        assert float(info["indentation_depth"][0]) > 0.3

    def test_marker_flow_responds_to_contact(self, env):
        state = env.init_state(jax.random.PRNGKey(1))
        state, _ = env.reset_all(state)
        step = jax.jit(env.step)
        down = jnp.tile(jnp.array([[0.0, 0.0, -0.08, 0.0, 0.0, 0.0]]), (2, 1))
        for _ in range(8):
            state, obs, rew, term, trunc, info = step(state, down)
        mf = np.asarray(info["marker_flow"][0])
        flow_mag = np.abs(mf[1] - mf[0])
        assert flow_mag.max() > 0.05  # some markers moved in image space
