"""Grasp-and-lift RL env: the unified FEM<->ABD contact world at RL scale.

The env (envs/grasp_lift/env.py) wraps the round-3 coupled solver in the
DirectRLEnv protocol: batched, auto-resetting, with gel-deformation
tactile observations. These tests mirror tests/test_coupled.py's physics
assertions THROUGH the env API — the friction-carried lift and its mu=0
control — plus the random-action sweep the other env families get in
tests/test_environments.py (run here, at a scale that fits the file
budget: the coupled Newton solve is ~7 s/step at 32 envs on CPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu import envs


def _scripted_rollout(env, steps, squeeze_steps=30):
    """Squeeze for ``squeeze_steps``, then keep a light squeeze and lift.

    Returns (state, obs, cube-z trajectory (T, N), any-termination flag).
    """
    st = env.init_state(jax.random.PRNGKey(0))
    st, _ = env.reset_all(st)
    step = jax.jit(env.step)
    n = env.cfg.num_envs
    traj, any_term = [], False
    for i in range(steps):
        a = (
            jnp.tile(jnp.array([[1.0, 0.0]]), (n, 1))
            if i < squeeze_steps
            else jnp.tile(jnp.array([[0.3, 1.0]]), (n, 1))
        )
        st, obs, rew, term, trunc, info = step(st, a)
        traj.append(np.asarray(info["cube_z"]))
        any_term = any_term or bool(np.asarray(term).any())
    return st, obs, np.asarray(traj), any_term


class TestGraspLift:
    def test_scripted_grasp_lifts_cube(self):
        """Squeeze-then-lift carries the cube up by gel friction: the cube
        rises with the pads (slip allowed) well above its start height."""
        env = envs.make(
            "TacEx-Grasp-Lift-Uipc-v0", num_envs=2, squeeze_rate=4e-3,
            episode_length_s=3.0, stagger_initial_episodes=False,
        )
        st, obs, traj, _ = _scripted_rollout(env, steps=60)
        assert np.isfinite(traj).all()
        # during the squeeze phase friction HOLDS the cube (it never drops
        # more than ~3 mm), and the lift carries it up afterwards
        assert traj[:30].min() > -0.003, traj[:30].min()
        assert traj[-1].min() > 0.004, traj[-1]

    def test_frictionless_control_slips(self):
        """mu = 0: the same squeeze cannot hold the cube — it slides out
        while the pads rise, crossing drop_z (proves the lift above is
        friction-carried, and that the drop termination fires)."""
        env = envs.make(
            "TacEx-Grasp-Lift-Uipc-v0", num_envs=2, squeeze_rate=4e-3,
            friction_mu=0.0, episode_length_s=3.0, stagger_initial_episodes=False,
        )
        st, obs, traj, any_term = _scripted_rollout(env, steps=45)
        assert np.isfinite(traj).all()
        # slid below the drop threshold at some point (post-drop frames may
        # already be auto-reset, so check the trajectory minimum)
        assert traj.min() < -0.0075, traj.min()
        assert any_term, "drop never terminated an episode"

    def test_random_actions_and_auto_reset(self):
        """The test_environments.py sweep contract at this family's scale:
        random actions, finite outputs, at least one termination, and the
        masked in-graph reset re-zeroes the done envs' bookkeeping."""
        n = 4
        env = envs.make("TacEx-Grasp-Lift-Uipc-v0", num_envs=n)
        st = env.init_state(jax.random.PRNGKey(0))
        st, obs = env.reset_all(st)
        for k in obs:
            assert bool(jnp.isfinite(obs[k]).all())
        steps = 20
        actions = jax.random.uniform(
            jax.random.PRNGKey(1), (steps, n, 2), minval=-1.0, maxval=1.0
        )
        rollout = jax.jit(env.rollout_fn(steps))
        final_state, (obs_seq, rew_seq, term_seq, trunc_seq) = rollout(st, actions)
        for k, v in obs_seq.items():
            assert bool(jnp.isfinite(v).all()), f"obs[{k}] non-finite"
        assert bool(jnp.isfinite(rew_seq).all())
        # NOTE: random actions do NOT reliably drop the cube — with the
        # +-1 mm reset offset it can lean on a pad and the barrier's
        # friction holds its 0.07 N weight. Termination + masked reset are
        # asserted deterministically: inject a dropped cube and step once.
        import dataclasses as _dc

        q = final_state.cube.q.at[0, 0, 2].set(env.cfg.drop_z - 0.002)
        st2 = _dc.replace(
            final_state, cube=_dc.replace(final_state.cube, q=q)
        )
        st2, obs2, rew2, term2, trunc2, info2 = jax.jit(env.step)(
            st2, jnp.zeros((n, 2))
        )
        assert bool(np.asarray(term2)[0]), "injected drop did not terminate"
        # the done env was masked-reset in-graph: bookkeeping re-zeroed and
        # the cube back near the start pose
        assert int(np.asarray(st2.episode_length)[0]) == 0
        assert abs(float(np.asarray(st2.cube.q)[0, 0, 2])) < 1e-3

    def test_missed_barrier_metric_default_on_and_trips(self):
        """Default-on broad-phase observability (round-4 verdict item 5):
        a healthy grasp logs Metric/missed_barriers == 0 (no pair carrying
        meaningful barrier force was dropped), and an undersized capacity
        (coupling_k=1: a face-contact vertex needs BOTH face triangles)
        makes it fire nonzero during a hard squeeze."""
        kw = dict(
            num_envs=2, newton_iters=2, cg_iters=4, squeeze_rate=4e-3,
            stagger_initial_episodes=False,
        )
        env = envs.make("TacEx-Grasp-Lift-Uipc-v0", **kw)
        st = env.init_state(jax.random.PRNGKey(0))
        st, _ = env.reset_all(st)
        step = jax.jit(env.step)
        a = jnp.tile(jnp.array([[1.0, 0.0]]), (2, 1))
        healthy = []
        for _ in range(12):
            st, obs, rew, term, trunc, info = step(st, a)
            healthy.append(float(info["log"]["Metric/missed_barriers"]))
        assert max(healthy) == 0.0, healthy

        env1 = envs.make("TacEx-Grasp-Lift-Uipc-v0", coupling_k=1, **kw)
        st = env1.init_state(jax.random.PRNGKey(0))
        st, _ = env1.reset_all(st)
        step1 = jax.jit(env1.step)
        tripped = []
        for _ in range(12):
            st, obs, rew, term, trunc, info = step1(st, a)
            tripped.append(float(info["log"]["Metric/missed_barriers"]))
        assert max(tripped) > 0.0, tripped

    def test_staggered_initial_episode_phases(self):
        """Default: reset_all randomizes per-env episode counters so the
        batch truncates out of phase (grasp-lift episodes rarely terminate
        early, so synchronized resets would pin every rollout window at one
        episode phase — measured period-2 reward aliasing in the round-4
        PPO runs). Per-env masked resets still start at 0."""
        env = envs.make("TacEx-Grasp-Lift-Uipc-v0", num_envs=16)
        st = env.init_state(jax.random.PRNGKey(0))
        st, _ = env.reset_all(st)
        ep0 = np.asarray(st.episode_length)
        assert len(np.unique(ep0)) > 4, ep0  # phases actually spread
        assert (ep0 >= 0).all() and (ep0 < env.cfg.max_episode_length).all()
        # opt-out pins the old synchronized behavior
        env2 = envs.make(
            "TacEx-Grasp-Lift-Uipc-v0", num_envs=16, stagger_initial_episodes=False
        )
        st2 = env2.init_state(jax.random.PRNGKey(0))
        st2, _ = env2.reset_all(st2)
        assert (np.asarray(st2.episode_length) == 0).all()

    def test_tactile_depth_obs(self):
        """obs_mode='depth': per-pad compression images are real gel
        deformation — the cube's square footprint indents the face center
        clearly more than the (Poisson-bulged) face corners."""
        env = envs.make(
            "TacEx-Grasp-Lift-Uipc-Depth-v0", num_envs=1, squeeze_rate=4e-3,
            stagger_initial_episodes=False,
        )
        st = env.init_state(jax.random.PRNGKey(0))
        st, obs = env.reset_all(st)
        assert "vision_obs" in obs
        step = jax.jit(env.step)
        a = jnp.array([[1.0, 0.0]])
        for _ in range(25):
            st, obs, rew, term, trunc, info = step(st, a)
        img = np.asarray(obs["vision_obs"])[0]  # (gh, gw, 2)
        assert np.isfinite(img).all()
        gh, gw, _ = img.shape
        center = img[gh // 2, gw // 2]
        corners = img[[0, 0, -1, -1], [0, -1, 0, -1]]
        # the 15 mm cube presses the middle of the 30 mm face; the whole
        # pad is squeezed so corners carry SOME compression (global squeeze
        # + Poisson bulge) — the discriminating signal is center vs corners
        assert (center > 0.3).all(), center  # > 0.3 mm indentation
        assert (center > corners.mean(axis=0) + 0.25).all(), (center, corners)
