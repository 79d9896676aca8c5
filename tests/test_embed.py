"""Mixed-resolution FEM gel: dense embedded contact surface (judge item #6).

Solve the coarse mesh, sample a dense bound surface — depth and marker
flow then see thousands of surface points at coarse-solve cost
(physics/soft/embed.py; reference Gelpad_extremely_high_res tier,
SURVEY §2.3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu.physics.soft.embed import EmbeddedFaceGrid


def _coarse_grid(gh=4, gw=5):
    ids = np.arange(gh * gw).reshape(gh, gw)
    yy, xx = np.meshgrid(
        np.linspace(0.0, 1.0, gh), np.linspace(0.0, 2.0, gw), indexing="ij"
    )
    pts = np.stack([xx, yy, np.zeros_like(xx)], -1).reshape(-1, 3)
    return ids, pts.astype(np.float32)


class TestEmbeddedFaceGrid:
    def test_rest_positions_reproduce_regular_grid(self):
        ids, pts = _coarse_grid()
        emb = EmbeddedFaceGrid(ids, pts, (7, 9))
        ref_y, ref_x = np.meshgrid(
            np.linspace(0.0, 1.0, 7), np.linspace(0.0, 2.0, 9), indexing="ij"
        )
        np.testing.assert_allclose(
            emb.rest_points.reshape(7, 9, 3)[..., 0], ref_x, atol=1e-6
        )
        np.testing.assert_allclose(
            emb.rest_points.reshape(7, 9, 3)[..., 1], ref_y, atol=1e-6
        )

    def test_positions_are_bilinear_in_the_deformation(self):
        ids, pts = _coarse_grid()
        emb = EmbeddedFaceGrid(ids, pts, (9, 11))
        rng = np.random.default_rng(0)
        x = jnp.asarray((pts + 0.1 * rng.normal(size=pts.shape))[None], jnp.float32)
        dense = np.asarray(emb.positions(x))[0]
        # brute-force bilinear for a probe point
        w = np.asarray(emb.weights)
        cid = np.asarray(emb.corner_ids)
        ref = np.einsum("pk,pkd->pd", w, np.asarray(x[0])[cid])
        np.testing.assert_allclose(dense, ref, atol=1e-6)
        # an AFFINE deformation is reproduced exactly at every dense point
        A = rng.normal(size=(3, 3)).astype(np.float32)
        t = rng.normal(size=3).astype(np.float32)
        xa = jnp.asarray((pts @ A.T + t)[None])
        densea = np.asarray(emb.positions(xa))[0]
        expected = emb.rest_points @ A.T + t
        np.testing.assert_allclose(densea, expected, atol=1e-5)

    def test_triangulation_covers_the_grid(self):
        ids, pts = _coarse_grid()
        emb = EmbeddedFaceGrid(ids, pts, (6, 8))
        tris = emb.triangles
        assert tris.shape == ((6 - 1) * (8 - 1) * 2, 3)
        assert tris.min() == 0 and tris.max() == 6 * 8 - 1


class TestMixedResolutionEnv:
    @pytest.fixture(scope="class")
    def envs(self):
        from tacex_tpu.envs.ball_rolling.env_uipc import (
            BallRollingUipcEnv,
            BallRollingUipcEnvCfg,
        )

        cfg = BallRollingUipcEnvCfg(
            num_envs=2, obs_mode="rgb", with_markers=False,
            gel_resolution="low", gel_embed_surface="extremely_high",
        )
        return BallRollingUipcEnv(cfg)

    def test_env_steps_with_embedded_surface(self, envs):
        env = envs
        assert env.embed is not None
        assert env.embed.shape == (51, 41)  # extremely_high face grid
        state = env.init_state(jax.random.PRNGKey(0))
        state, _ = env.reset_all(state)
        step = jax.jit(env.step)
        act = jnp.zeros((2, env.cfg.action_space)).at[:, 2].set(-0.3)
        for _ in range(5):
            state, obs, rew, term, trunc, info = step(state, act)
        assert np.isfinite(np.asarray(obs["vision_obs"])).all()
        assert "marker_flow" in info
        mf = np.asarray(info["marker_flow"])
        assert np.isfinite(mf).all()

    def test_embedded_flow_matches_coarse_binding(self):
        """Golden: the embedded dense surface refines the SAME piecewise-
        linear FEM field the coarse surface carries, so marker flow bound
        to either must agree (up to the bilinear-vs-triangle split inside
        a quad — small where the field is smooth)."""
        from tacex_tpu.envs.ball_rolling.env_uipc import (
            BallRollingUipcEnv,
            BallRollingUipcEnvCfg,
        )

        def run(embed):
            cfg = BallRollingUipcEnvCfg(
                num_envs=1, obs_mode="rgb", with_markers=False,
                gel_resolution="low", gel_embed_surface=embed,
            )
            env = BallRollingUipcEnv(cfg)
            state = env.init_state(jax.random.PRNGKey(7))
            state, _ = env.reset_all(state)
            step = jax.jit(env.step)
            act = jnp.zeros((1, env.cfg.action_space)).at[:, 2].set(-0.4)
            flows = []
            for _ in range(6):
                state, obs, rew, term, trunc, info = step(state, act)
                flows.append(np.asarray(info["marker_flow"]))
            return flows[-1]

        f_embed = run("extremely_high")
        f_coarse = run(None)
        # same seed -> same marker material points; the embedding is
        # triangle-consistent with the coarse face split, so both bindings
        # sample the SAME piecewise-linear field — tight agreement.
        diff = np.abs(f_embed - f_coarse)
        assert diff.max() < 5e-3, diff.max()
        assert np.isfinite(f_embed).all()
