"""In-suite coverage of the driver's multi-chip gate.

Runs the exact `__graft_entry__.dryrun_multichip` path — `shard_env_tree` of
the full PPO train state over an 8-device ("env",) mesh, then one jitted
train step — on the 8-virtual-device CPU platform that conftest.py forces,
and asserts the sharded run produces the same metrics as a replicated
single-device run (data-parallel correctness, SURVEY §2.6: psum gradient
reduction must be a pure layout change).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tacex_tpu import envs
from tacex_tpu.parallel import env_mesh, shard_env_tree
from tacex_tpu.rl import PPO, PPOConfig


N_DEV = 8


@pytest.fixture(scope="module")
def _eight_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"needs {N_DEV} devices, have {len(jax.devices())}")


def _make_ppo(num_envs):
    env = envs.make("TacEx-Ball-Rolling-Taxim-Fots-v0", num_envs=num_envs)
    ppo = PPO(env, PPOConfig(rollouts=2, mini_batches=2, learning_epochs=1, hidden=(16,)))
    return ppo


class TestMultichipPPO:
    def test_dryrun_path_on_8_device_mesh(self, _eight_devices):
        num_envs = 2 * N_DEV
        ppo = _make_ppo(num_envs)
        mesh = env_mesh(N_DEV)
        ts = shard_env_tree(ppo.init(jax.random.PRNGKey(0)), mesh, num_envs)
        new_ts, metrics = jax.jit(ppo.train_step)(ts)
        jax.block_until_ready(metrics)
        assert bool(jnp.isfinite(metrics["loss"]))
        assert int(new_ts.steps) == 2 * num_envs

    def test_sharded_matches_replicated(self, _eight_devices):
        """Same seed, same step: metrics must agree whether the env axis is
        sharded over 8 devices or replicated on one."""
        num_envs = 2 * N_DEV
        mesh = env_mesh(N_DEV)

        ppo = _make_ppo(num_envs)
        ts_sharded = shard_env_tree(ppo.init(jax.random.PRNGKey(0)), mesh, num_envs)
        _, m_sharded = jax.jit(ppo.train_step)(ts_sharded)

        ppo2 = _make_ppo(num_envs)
        ts_rep = ppo2.init(jax.random.PRNGKey(0))
        _, m_rep = jax.jit(ppo2.train_step)(ts_rep)

        # Gradient reduction order differs across layouts (psum tree vs a
        # single-device sum), so allow float-reassociation noise only.
        for k in ("loss", "reward_per_step"):
            np.testing.assert_allclose(
                np.asarray(m_sharded[k]), np.asarray(m_rep[k]), rtol=5e-3, atol=1e-4
            )

    def test_env_state_leaves_actually_sharded(self, _eight_devices):
        num_envs = 2 * N_DEV
        ppo = _make_ppo(num_envs)
        mesh = env_mesh(N_DEV)
        ts = shard_env_tree(ppo.init(jax.random.PRNGKey(0)), mesh, num_envs)
        env_sharding = NamedSharding(mesh, P("env"))
        n_sharded = sum(
            1
            for leaf in jax.tree_util.tree_leaves(ts)
            if hasattr(leaf, "sharding")
            and leaf.ndim >= 1
            and leaf.shape[0] == num_envs
            and leaf.sharding == env_sharding
        )
        assert n_sharded > 0, "no leaf ended up sharded over the env axis"

    def test_graft_entry_dryrun(self, _eight_devices):
        """The literal driver entry point, in-process (platform already CPU)."""
        import __graft_entry__ as g

        g.dryrun_multichip(N_DEV)
