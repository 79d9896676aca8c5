"""Shells (cloth) inside the unified contact world.

libuipc runs cloth as FiniteElement constitutions in the SAME system as
tet FEM and affine bodies (reference uipc_sim.py:23-26 constitution list;
one world.advance resolves every pair type, uipc_sim.py:204-208). Round 3
of this rebuild matched that layout: shell objects join the nodal union
(codim elements over the shared vertex array), so cloth-vs-gel contact
rides the self-contact machinery and cloth meets DYNAMIC affine bodies
through the coupled cross barriers — the last constitution split from the
round-2 verdict ("dynamic ABD bodies never touch FEM/shell objects").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu.physics.soft.shell import grid_cloth
from tacex_tpu.uipc.objects import (
    AffineBodyConstitutionCfg,
    NeoHookeanShellCfg,
    StableNeoHookeanCfg,
    UipcObject,
    UipcObjectCfg,
)
from tacex_tpu.uipc.sim import UipcSim, UipcSimCfg


def _cube_mesh(half, center):
    P = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half) for z in (-half, half)],
        np.float64,
    ) + np.asarray(center)
    T = np.array(
        [
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        ],
        np.int64,
    )
    return P, T


class TestClothInUnion:
    def test_cloth_rests_on_gel(self):
        """Cloth falls onto a soft gel block: both are nodal objects of ONE
        union model; contact resolves through the vertex-triangle
        self-contact barrier (no special cloth-gel code path)."""
        from tacex_tpu.physics.soft.mesh import box_tet_mesh

        sim = UipcSim(
            UipcSimCfg(
                dt=1 / 100, num_envs=1, enable_ground=True,
                contact=UipcSimCfg.Contact(self_contact_k=4, coupling_k=0),
            )
        )
        gel_mesh = box_tet_mesh((0.04, 0.04, 0.02), (3, 3, 2), center=(0, 0, 0.01))
        gel = UipcObject(
            UipcObjectCfg(constitution=StableNeoHookeanCfg(youngs_modulus=0.1)),
            sim, mesh=gel_mesh,
        )
        cp, ct = grid_cloth(6, 6, size=0.03, z=0.028)
        cloth = UipcObject(
            UipcObjectCfg(constitution=NeoHookeanShellCfg(), mass_density=200.0),
            sim, points=cp, triangles=ct,
        )
        sim.setup_sim()
        # both became union views (one nodal system)
        assert gel._union_range is not None and cloth._union_range is not None
        assert sim._union_model.shell is not None
        for _ in range(50):
            sim.step()
        xz = np.asarray(cloth.nodal_pos_w)[0, :, 2]
        assert not np.isnan(xz).any()
        # the gel top face is at z=0.02; the cloth must rest ON it (above,
        # within a couple of d_hat gaps), not fall through to the ground
        assert xz.min() > 0.0185, xz.min()
        assert xz.max() < 0.03, xz.max()
        # the gel was not blasted away
        gz = np.asarray(gel.nodal_pos_w)[0, :, 2]
        assert gz.min() > -1e-4 and gz.max() < 0.025

    def test_cloth_trampoline_catches_dynamic_body(self):
        """Corner-pinned cloth catches a falling FREE affine body: the cloth
        is a codim part of the nodal union, the body is a dynamic ABD DOF —
        they meet through the coupled cross barriers (two-way: the body
        rests ON the cloth, the cloth SAGS under it)."""
        sim = UipcSim(
            UipcSimCfg(
                dt=1 / 100, num_envs=1, enable_ground=True,
                contact=UipcSimCfg.Contact(self_contact_k=0, coupling_k=4),
            )
        )
        cp, ct = grid_cloth(7, 7, size=0.06, z=0.03)
        cloth = UipcObject(
            UipcObjectCfg(
                constitution=NeoHookeanShellCfg(youngs_modulus=0.1),
                mass_density=200.0,
            ),
            sim, points=cp, triangles=ct,
        )
        # pin the four corners
        corners = [0, 6, 42, 48]
        cloth.set_attachments(np.asarray(corners, np.int32), strength_ratio=1e4)
        bp, bt = _cube_mesh(0.006, (0.0, 0.0, 0.045))
        body = UipcObject(
            UipcObjectCfg(
                constitution=AffineBodyConstitutionCfg(m_kappa=100.0),
                mass_density=1000.0,
            ),
            sim, points=bp, triangles=bt,
        )
        sim.setup_sim()
        assert cloth._union_range is not None  # shell joined the union
        assert sim._coupled is not None  # ... and the union coupled to ABD
        for _ in range(80):
            sim.step()
        q = np.asarray(sim.abd_body_pose(body))[0]
        cz = np.asarray(cloth.nodal_pos_w)[0, :, 2]
        assert not np.isnan(q).any() and not np.isnan(cz).any()
        # body rests ON the cloth: caught well above the ground. q[:3] is
        # the TRANSLATION from the rest pose (centered at 0.045); falling
        # through would put the world center at ~0.006
        body_ctr_z = 0.045 + q[2]
        assert body_ctr_z > 0.02, body_ctr_z
        # cloth sags under the body's weight but the pins hold
        center = 3 * 7 + 3
        assert cz[center] < 0.0295, cz[center]
        assert cz[corners].min() > 0.028, cz[corners]
        # and the sag is where the body is: center below the corner mean
        assert cz[center] < cz[corners].mean() - 1e-4

    def test_lone_shell_still_standalone(self):
        """A single cloth with a kinematic collider keeps the cheaper
        standalone ShellModel path (bunny-cloth sample pattern). Note
        self_contact_k must be 0 (the default): requesting self-contact on
        a lone cloth routes it through the union model so its own
        vertex-triangle pairs resolve (TestClothSelfCollision)."""
        from tacex_tpu.physics.soft.shell import ShellModel

        sim = UipcSim(
            UipcSimCfg(
                dt=1 / 100, num_envs=1, enable_ground=True,
                contact=UipcSimCfg.Contact(self_contact_k=0, coupling_k=4),
            )
        )
        cp, ct = grid_cloth(5, 5, size=0.04, z=0.02)
        cloth = UipcObject(
            UipcObjectCfg(constitution=NeoHookeanShellCfg()),
            sim, points=cp, triangles=ct,
        )
        bp, bt = _cube_mesh(0.008, (0.0, 0.0, 0.008))
        UipcObject(
            UipcObjectCfg(
                constitution=AffineBodyConstitutionCfg(kinematic=True)
            ),
            sim, points=bp, triangles=bt,
        )
        sim.setup_sim()
        # a lone shell with only KINEMATIC affine bodies keeps the cheap
        # standalone path (the body is its static trimesh collider) even
        # with coupling enabled — there are no dynamic DOFs to couple to
        assert sim._coupled is None
        assert isinstance(cloth.model, ShellModel)
        for _ in range(30):
            sim.step()
        cz = np.asarray(cloth.nodal_pos_w)[0, :, 2]
        assert not np.isnan(cz).any()
        # rests on the kinematic cube's top (z=0.016) over the contact
        # region, hangs lower off the sides, never below the ground
        assert cz.max() > 0.014 and cz.min() > -1e-4


class TestClothSelfCollision:
    """A lone cloth with contact.self_contact_k > 0 routes through the
    union model so its OWN vertex-triangle pairs resolve — cloth folding
    onto itself is the canonical shell case the standalone solver (static
    and scene colliders only) cannot handle."""

    def _hairpin(self, self_k, steps=25):
        """Hairpin strip: bottom layer on the ground plane, top layer
        folded back 3 mm above it. The top layer is pushed onto the
        bottom layer (soft bending so the fold can close: bending must
        not be the thing holding the layers apart — the self_k=0
        control below verifies contact is load-bearing)."""
        n, w, h = 6, 3, 0.01  # segments along, across; cell size
        gap = 0.003
        pts, quads = [], []
        # bottom layer i=0..n, then top layer folded back (shared fold edge)
        for i in range(n + 1):
            for j in range(w):
                pts.append([i * h, j * h, 0.001])
        for i in range(1, n + 1):  # top layer: x runs back from the fold
            for j in range(w):
                pts.append([(n - i) * h, j * h, 0.001 + gap])
        def vid(layer, i, j):
            return (layer * (n + 1) + i) * w + j if layer == 0 else (n + 1) * w + (i - 1) * w + j
        T = []
        for i in range(n):
            for j in range(w - 1):
                a, b = vid(0, i, j), vid(0, i + 1, j)
                c, d = vid(0, i + 1, j + 1), vid(0, i, j + 1)
                T += [[a, b, c], [a, c, d]]
        # fold edge connects bottom row i=n to top row i=1
        for j in range(w - 1):
            a, b = vid(0, n, j), vid(1, 1, j)
            c, d = vid(1, 1, j + 1), vid(0, n, j + 1)
            T += [[a, b, c], [a, c, d]]
        for i in range(1, n):
            for j in range(w - 1):
                a, b = vid(1, i, j), vid(1, i + 1, j)
                c, d = vid(1, i + 1, j + 1), vid(1, i, j + 1)
                T += [[a, b, c], [a, c, d]]
        pts = np.asarray(pts, np.float64)
        T = np.asarray(T, np.int64)

        sim = UipcSim(
            UipcSimCfg(
                dt=1 / 100, num_envs=1, enable_ground=True,
                contact=UipcSimCfg.Contact(
                    self_contact_k=self_k, coupling_k=0, d_hat=0.0008,
                ),
            )
        )
        cloth = UipcObject(
            UipcObjectCfg(
                constitution=NeoHookeanShellCfg(youngs_modulus=0.01, bending_E=0.01),
                mass_density=500.0,
            ),
            sim, points=pts, triangles=T,
        )
        # pin the bottom layer's far end so the strip cannot just slide
        pins = np.asarray([vid(0, 0, j) for j in range(w)], np.int32)
        cloth.set_attachments(pins, strength_ratio=1e4)
        sim.setup_sim()
        # launch the top layer downward: from rest, the cantilever-rotation
        # mode's first Newton step is below the convergence tolerance and
        # the solve (correctly) reports equilibrium — the test is about
        # CONTACT, so inject the approach velocity directly
        import dataclasses as _dc

        import jax.numpy as jnp

        n_bot = (n + 1) * w
        if cloth._union_range is not None:
            lo, hi = cloth._union_range
            u = sim._union_state
            v = u.v.at[:, lo + n_bot : hi, 2].set(-0.1)
            sim._union_state = _dc.replace(u, v=v)
            cloth._refresh_union_slice()
        else:
            st = cloth.state
            v = st.v.at[:, n_bot:, 2].set(-0.1)
            cloth.state = _dc.replace(st, v=v)
        for _ in range(steps):
            sim.step()
        x = np.asarray(cloth.nodal_pos_w)[0]
        n_bot = (n + 1) * w
        bot_z = x[:n_bot, 2]
        top_z = x[n_bot:, 2]
        return sim, cloth, bot_z, top_z

    def test_self_contact_keeps_layers_apart(self):
        sim, cloth, bot_z, top_z = self._hairpin(self_k=4)
        assert cloth._union_range is not None  # routed through the union
        assert np.isfinite(top_z).all()
        # top layer rests ON the bottom layer: every top vertex stays above
        # the bottom layer's plane (no interpenetration)
        assert top_z.min() > bot_z.mean() + 2e-4, (top_z.min(), bot_z.mean())

    def test_without_self_contact_layers_interpenetrate(self):
        """Control: self_contact_k=0 keeps the standalone path and the top
        layer falls THROUGH the bottom one to the ground."""
        from tacex_tpu.physics.soft.shell import ShellModel

        sim, cloth, bot_z, top_z = self._hairpin(self_k=0)
        assert isinstance(cloth.model, ShellModel)
        # interleaved/through: top layer midline reaches the bottom plane
        assert top_z.min() < bot_z.mean() + 1e-4, (top_z.min(), bot_z.mean())
