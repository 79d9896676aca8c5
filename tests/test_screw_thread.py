"""Threaded contact WITH friction: the round-2 limitations are gone.

Round-2 STATUS recorded two solver limitations: (a) lagged Coulomb
friction self-locked multi-point conforming (threaded) contact, so the
screw-and-nut sample had to run frictionless; (b) vertex-sampled contact
hopped the thread crest between vertex rings (~50% of ideal advance).
Round 3 fixes both for the screw scenario: friction re-lags every Newton
iteration (implicit fixed point), and the nut is the analytic internal-
thread SDF (ops/sdf.py sdf_threads) — smooth at every screw vertex.

Reference semantics: libuipc 8_screw_and_nut.py runs its motor-driven
screw WITH the engine's implicit friction enabled (Contact.friction,
reference uipc_sim.py:87-95).
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]
_spec = importlib.util.spec_from_file_location(
    "screw_sample", REPO / "examples" / "libuipc_samples" / "screw_and_nut.py"
)
screw_sample = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(screw_sample)


def _run(mu: float, steps: int):
    from tacex_tpu.physics.soft.ipc import RigidSdfScene
    from tacex_tpu.uipc import UipcObject, UipcObjectCfg, UipcSim, UipcSimCfg
    from tacex_tpu.uipc.objects import AffineBodyConstitutionCfg

    sim = UipcSim(
        UipcSimCfg(
            num_envs=1, dt=1 / 60, enable_ground=False,
            newton=UipcSimCfg.Newton(max_iter=8),
            contact=UipcSimCfg.Contact(
                friction=mu > 0, default_friction_ratio=mu,
                d_hat=0.0004, resistance=2e4,
            ),
        )
    )
    sp, st = screw_sample.screw_mesh()
    screw = UipcObject(
        UipcObjectCfg(constitution=AffineBodyConstitutionCfg(m_kappa=100.0)),
        sim, points=sp, triangles=st,
    )
    screw.set_rotating_motor(axis=(0.0, 0.0, 1.0), rot_vel=-np.pi, strength=2000.0)
    sim.setup_sim()
    bz = screw_sample.assemble_phase(sp)
    sc = RigidSdfScene.empty(1)
    scene = RigidSdfScene(
        sc.spheres, sc.boxes, sc.capsules, sc.planes,
        threads=jnp.asarray(screw_sample.nut_thread(bz))[None],
    )
    z0 = float(sim.abd_body_pose(screw)[0, 2])
    for _ in range(steps):
        sim.step(scene)
    sim.check_health()  # raises on divergence
    q = np.asarray(sim.abd_body_pose(screw)[0])
    return q, q[2] - z0


class TestThreadedFriction:
    def test_mu_05_advance_matches_kinematics(self):
        """Half a turn at mu=0.5: advance within 10% of -pitch/2 (the
        round-2 self-lock would leave it near zero; vertex hopping would
        leave ~50%)."""
        steps = 60  # 1 s at -pi rad/s = half turn
        q, dz = _run(0.5, steps)
        expected = -screw_sample.PITCH / 2
        assert abs(dz - expected) < 0.1 * abs(expected), (dz, expected)

    def test_mu_001_stays_stable(self):
        """Small-mu threaded contact no longer destabilizes (round-2: the
        mu=0.01 screw escaped its nut)."""
        steps = 60
        q, dz = _run(0.01, steps)
        assert np.isfinite(q).all()
        expected = -screw_sample.PITCH / 2
        # still threading (advance in the right direction, same order)
        assert dz < 0.5 * expected, (dz, expected)
        assert abs(dz) < 1.5 * abs(expected)
        # still centered in the nut (didn't escape radially)
        assert abs(q[0]) < 0.002 and abs(q[1]) < 0.002
