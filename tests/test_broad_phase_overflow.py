"""Broad-phase saturation accounting.

libuipc's linear-BVH broad phase never misses a contact pair (reference
source/tacex_uipc/tacex_uipc/sim/uipc_sim.py:121,
``collision_detection_method="linear_bvh"``). This rebuild's fixed-capacity
K-nearest candidate sets silently drop pairs past K — an undetectable
failure mode at densities above the tested ones (round-3 verdict item #4).
``UipcSim.check_health()`` now counts, per pair family and env, the
candidates within the narrow phase's own reach cut (3·d_hat + support
radius) that fell OUTSIDE the top-K sets, warns on any nonzero count
(raises with ``contact.overflow_errors=True``), and returns the counters.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tacex_tpu.uipc import (
    StableNeoHookeanCfg,
    UipcObject,
    UipcObjectCfg,
    UipcSim,
    UipcSimCfg,
)
from tacex_tpu.uipc.objects import TetMeshCfg


def _two_gels(self_contact_k: int, overflow_errors: bool = False, gap: float = 5e-4):
    """Two gel slabs stacked ``gap`` apart: every interface vertex sees
    several opposing triangles within barrier reach, so a K=1 candidate
    set must drop some of them."""
    sim = UipcSim(
        UipcSimCfg(
            num_envs=2,
            newton=UipcSimCfg.Newton(max_iter=2),
            contact=UipcSimCfg.Contact(
                d_hat=5e-4,
                self_contact_k=self_contact_k,
                overflow_errors=overflow_errors,
            ),
        )
    )
    mk = lambda cz: UipcObjectCfg(
        mesh_cfg=TetMeshCfg(
            size=(0.02, 0.02, 0.004), resolution=(4, 4, 1), center=(0, 0, cz)
        ),
        constitution=StableNeoHookeanCfg(youngs_modulus=0.145, poisson_rate=0.45),
    )
    lo = UipcObject(mk(0.002), sim)
    hi = UipcObject(mk(0.006 + gap), sim)
    # anchor the lower slab's bottom face so the stack holds still
    bottom = np.where(lo.mesh.points[:, 2] < 1e-6)[0].astype(np.int32)
    lo.set_attachments(bottom, strength_ratio=200.0)
    sim.setup_sim()
    return sim


class TestBroadPhaseOverflow:
    def test_saturated_scene_trips_the_flag(self):
        """K=1 on a dense interface: check_health warns and the vt_self
        counter is nonzero in every env."""
        sim = _two_gels(self_contact_k=1)
        sim.step()
        with pytest.warns(RuntimeWarning, match="broad-phase overflow"):
            report = sim.check_health()
        assert "vt_self" in report
        assert (report["vt_self"] > 0).all(), report

    def test_overflow_errors_raises(self):
        sim = _two_gels(self_contact_k=1, overflow_errors=True)
        sim.step()
        with pytest.raises(RuntimeError, match="raise the matching contact"):
            sim.check_health()

    def test_adequate_capacity_is_clean(self):
        """With K sized to the interface density the counters are zero and
        check_health is silent (the grasp-lift / gel scenes' regime)."""
        import warnings as _w

        sim = _two_gels(self_contact_k=24)
        sim.step()
        with _w.catch_warnings():
            _w.simplefilter("error", RuntimeWarning)
            report = sim.check_health()
        assert all(int(v.sum()) == 0 for v in report.values()), report

    def test_counters_count_real_drops(self):
        """The counter equals (within-reach candidates) − K per vertex,
        summed: recompute it directly from the narrow phase's own reach
        definition and compare."""
        sim = _two_gels(self_contact_k=1)
        sim.step()
        report = sim.broad_phase_overflow()
        model = sim._union_model
        x = np.asarray(sim._union_state.x[0])
        xs = x[np.asarray(model.surface_verts)]
        cent = x[np.asarray(model.surface_tris)].mean(1)
        d2 = ((xs[:, None, :] - cent[None]) ** 2).sum(-1)
        d2[np.asarray(model._vt_exclude)] = np.inf
        cut = 3.0 * model.cfg.d_hat + model._tri_radius_max
        within = (d2 < cut * cut).sum(-1)
        expect = np.maximum(within - model.cfg.self_contact_k, 0).sum()
        assert int(report["vt_self"][0]) == int(expect)
