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
        standalone ShellModel path (bunny-cloth sample pattern)."""
        from tacex_tpu.physics.soft.shell import ShellModel

        sim = UipcSim(
            UipcSimCfg(
                dt=1 / 100, num_envs=1, enable_ground=True,
                contact=UipcSimCfg.Contact(self_contact_k=4, coupling_k=4),
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
