"""Shell/cloth solver tests (physics/soft/shell.py) — the NeoHookeanShell +
DiscreteShellBending constitution scope (reference bunny-cloth sample)."""

import numpy as np

import jax
import jax.numpy as jnp

from tacex_tpu.assets.meshes import icosphere
from tacex_tpu.physics.soft.ipc import RigidSdfScene, SoftBodyState
from tacex_tpu.physics.soft.shell import ShellModel, ShellSolverCfg, grid_cloth


def _ground(n=1):
    sc = RigidSdfScene.empty(n)
    return RigidSdfScene(
        sc.spheres, sc.boxes, sc.capsules,
        sc.planes.at[:, 0].set(jnp.array([0.0, 0.0, 1.0, 0.0])),
    )


class TestShell:
    def test_hinge_topology(self):
        P, T = grid_cloth(4, 4, size=0.3, z=0.1)
        m = ShellModel(P, T)
        # 4x4 grid: 18 triangles; hinges = 9 quad diagonals + 12 interior
        # grid edges (2 interior lines x 3 segments, each direction)
        assert m.tris.shape[0] == 18
        assert m.hinges.shape[0] == 21
        assert float(m.masses.sum()) > 0

    def test_falls_flat_on_ground(self):
        P, T = grid_cloth(6, 6, size=0.2, z=0.08)
        m = ShellModel(P, T, cfg=ShellSolverCfg(dt=1 / 60, d_hat=0.003))
        st = SoftBodyState.init(1, P)
        step = jax.jit(m.step)
        for _ in range(40):
            st = step(st, _ground())
        z = np.asarray(st.x[0, :, 2])
        assert not np.isnan(z).any()
        assert z.min() > -1e-3
        assert z.max() < 0.02, f"cloth should lie flat: {z.max()}"

    def test_pinned_corners_hang(self):
        """Two pinned corners -> the rest of the cloth sags below them."""
        P, T = grid_cloth(6, 6, size=0.2, z=0.2)
        pins = np.array([0, 30], np.int32)  # two corners (i=0 and i=5 rows)
        m = ShellModel(
            P, T, cfg=ShellSolverCfg(dt=1 / 60, d_hat=0.003),
            attachment_verts=pins, attachment_strength_ratio=1000.0,
        )
        st = SoftBodyState.init(1, P)
        aim = jnp.asarray(P[pins])[None]
        step = jax.jit(m.step)
        for _ in range(50):
            st = step(st, _ground(), aim)
        z = np.asarray(st.x[0, :, 2])
        assert z[pins].min() > 0.18, "pins did not hold"
        assert z.min() < 0.12, "cloth did not sag below the pins"

    def test_drapes_over_static_mesh(self):
        """Drop over a fixed trimesh sphere: drapes, no tunneling."""
        P, T = grid_cloth(10, 10, size=0.3, z=0.25)
        sphere = np.asarray(icosphere(0.08, 1)) + np.array([0.0, 0.0, 0.08])
        m = ShellModel(
            P, T, cfg=ShellSolverCfg(dt=1 / 60, d_hat=0.004), static_tris=sphere
        )
        st = SoftBodyState.init(1, P)
        step = jax.jit(m.step)
        for _ in range(80):
            st = step(st, _ground())
        x = np.asarray(st.x[0])
        r = np.linalg.norm(x - np.array([0.0, 0.0, 0.08]), axis=-1)
        z = x[:, 2]
        assert not np.isnan(x).any()
        assert r.min() > 0.07, f"tunneled into the static mesh: {r.min():.4f}"
        assert z.max() > 0.12, "cloth should rest on top of the sphere"
        assert z.max() - z.min() > 0.04, "no drape"

    def test_membrane_resists_stretch(self):
        """A cloth pinned at both ends sags less when its membrane is stiff."""

        def sag(E):
            P, T = grid_cloth(8, 4, size=0.3, z=0.2)
            # pin the two x-extreme columns
            pins = np.where((P[:, 0] < -0.149) | (P[:, 0] > 0.149))[0].astype(np.int32)
            m = ShellModel(
                P, T, youngs_modulus=E,
                cfg=ShellSolverCfg(dt=1 / 60, d_hat=0.003),
                attachment_verts=pins, attachment_strength_ratio=1000.0,
            )
            st = SoftBodyState.init(1, P)
            aim = jnp.asarray(P[pins])[None]
            step = jax.jit(m.step)
            for _ in range(40):
                st = step(st, _ground(), aim)
            return float(np.asarray(st.x[0, :, 2]).min())

        z_soft = sag(2e3)
        z_stiff = sag(1e6)
        assert z_stiff > z_soft + 0.005, (z_soft, z_stiff)

    def test_batched_envs(self):
        P, T = grid_cloth(5, 5, size=0.15, z=0.1)
        m = ShellModel(P, T, cfg=ShellSolverCfg(dt=1 / 60, d_hat=0.003))
        st = SoftBodyState.init(2, P)
        # env 1 starts higher
        st = SoftBodyState(x=st.x.at[1, :, 2].add(0.2), v=st.v)
        step = jax.jit(m.step)
        for _ in range(11):  # 0.18 s: env 0 (from 0.1 m) lands, env 1 (0.3 m) doesn't
            st = step(st, _ground(2))
        z = np.asarray(st.x[:, :, 2])
        assert z[0].max() < 0.05  # landed
        assert z[1].min() > 0.05  # still falling
