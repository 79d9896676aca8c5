"""Screw and nut: a motor-driven thread converts rotation into translation.

Counterpart of reference examples/libuipc-samples/8_screw_and_nut.py (an
AffineBodyConstitution screw with RotatingMotor(motor_axis=Y,
motor_rot_vel=-pi) threads itself through a fixed nut — the axial advance
is NOT scripted, it emerges from thread-flank contact). The reference's
screw/nut .obj meshes are git-lfs pointers upstream, so the screw here is a
procedural closed surface of revolution with a helical thread bump
(r(theta, z) = r_core + depth * bump(helix phase)), and the "nut" is a ring
of fixed sphere colliders seated in the thread groove. The motor constrains
only the ROTATIONAL DOFs (per-DOF SoftTransformConstraint weights), so the
screw is axially free: each turn must advance it by one pitch through
contact alone.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

import jax.numpy as jnp

from tacex_tpu.physics.soft.ipc import RigidSdfScene
from tacex_tpu.uipc import UipcObject, UipcObjectCfg, UipcSim, UipcSimCfg
from tacex_tpu.uipc.objects import AffineBodyConstitutionCfg

R_CORE = 0.006
DEPTH = 0.0022
PITCH = 0.006
LENGTH = 0.04
N_THETA, N_Z = 64, 72


THREAD_Z = (0.010, 0.030)  # threaded section; smooth ends carry the bushings


def screw_mesh():
    """Closed threaded-rod surface: radius bumps along the helix in the
    threaded mid-section, smooth cylindrical ends (the guided shank)."""
    thetas = np.linspace(0, 2 * np.pi, N_THETA, endpoint=False)
    zs = np.linspace(0, LENGTH, N_Z)
    pts = []
    for j, z in enumerate(zs):
        for i, th in enumerate(thetas):
            # helix phase in [0,1): 0 = thread crest
            phase = (th / (2 * np.pi) - z / PITCH) % 1.0
            bump = np.clip(1.0 - 6.0 * min(phase, 1.0 - phase), 0.0, 1.0)
            if not (THREAD_Z[0] <= z <= THREAD_Z[1]):
                bump = 0.0
            r = R_CORE + DEPTH * bump
            pts.append([r * np.cos(th), r * np.sin(th), z])
    pts = np.asarray(pts, np.float64)
    tris = []
    for j in range(N_Z - 1):
        for i in range(N_THETA):
            a = j * N_THETA + i
            b = j * N_THETA + (i + 1) % N_THETA
            c = a + N_THETA
            d = b + N_THETA
            tris += [[a, b, d], [a, d, c]]
    # caps (fans) to close the surface
    lo_c = len(pts)
    pts = np.vstack([pts, [[0, 0, 0]], [[0, 0, LENGTH]]])
    hi_c = lo_c + 1
    for i in range(N_THETA):
        a, b = i, (i + 1) % N_THETA
        tris.append([lo_c, b, a])  # bottom cap, outward -z
        a2 = (N_Z - 1) * N_THETA + i
        b2 = (N_Z - 1) * N_THETA + (i + 1) % N_THETA
        tris.append([hi_c, a2, b2])  # top cap, outward +z
    return pts, np.asarray(tris, np.int64)


def main() -> None:
    # Friction is OFF: thread contact on a multi-point rigid body with the
    # lagged-Coulomb model self-locks (the lag ratchets the normal forces up
    # while the motor winds in, so the static cone is never escaped) — a
    # known limitation recorded in STATUS.md. The frictionless thread still
    # demonstrates the sample's point: rotation -> translation via contact.
    sim = UipcSim(
        UipcSimCfg(
            num_envs=1, dt=1 / 60, enable_ground=False,
            newton=UipcSimCfg.Newton(max_iter=8),
            contact=UipcSimCfg.Contact(
                friction=False, d_hat=0.0006, resistance=2e4
            ),
        )
    )
    sp, st = screw_mesh()
    screw = UipcObject(
        UipcObjectCfg(constitution=AffineBodyConstitutionCfg(m_kappa=100.0)),
        sim, points=sp, triangles=st,
    )
    # reference: rm.apply_to(screw_mesh, 100, motor_axis=UnitY, rot_vel=-pi);
    # our screw axis is +z
    screw.set_rotating_motor(axis=(0.0, 0.0, 1.0), rot_vel=-np.pi, strength=2000.0)
    sim.setup_sim()

    # "nut": 3 fixed sphere colliders seated mid-groove around the shaft
    # (groove center: phase 0.5 -> th/2pi - z/PITCH = 0.5 + k), plus two
    # BUSHING rings of spheres around the smooth shank ends — a real nut
    # guides the screw radially; without them the free-floating screw
    # wiggles its crest past the pegs and ratchets down
    peg_r = 0.0013  # must FIT the groove flat (4 mm at crest factor 6)
    pegs = []
    for k, th in enumerate(np.linspace(0, 2 * np.pi, 3, endpoint=False)):
        z = PITCH * (th / (2 * np.pi) - 0.5) + PITCH * (2.5 + k)  # inside THREAD_Z
        pegs.append([(R_CORE + DEPTH + peg_r * 0.4) * np.cos(th),
                     (R_CORE + DEPTH + peg_r * 0.4) * np.sin(th), z, peg_r])
    bush_r = 0.0014
    for zb in (0.004, 0.036):
        for th in np.linspace(0, 2 * np.pi, 4, endpoint=False) + 0.3:
            rr = R_CORE + bush_r + 0.0004
            pegs.append([rr * np.cos(th), rr * np.sin(th), zb, bush_r])
    sc = RigidSdfScene.empty(1, s=len(pegs))
    scene = RigidSdfScene(
        jnp.asarray(np.asarray(pegs, np.float32))[None], sc.boxes, sc.capsules, sc.planes
    )

    z0 = float(screw.abd_pose()[0, 2]) if hasattr(screw, "abd_pose") else float(
        sim.abd_body_pose(screw)[0, 2]
    )
    steps = 120  # 2 s at -pi rad/s = 1 turn
    for i in range(steps):
        sim.step(scene)
        if i % 30 == 0:
            q = np.asarray(sim.abd_body_pose(screw)[0])
            ang = np.arctan2(q[6], q[3])
            print(f"step {i:3d}: z {q[2]:+.4f} angle {ang:+.2f}")
    sim.check_health()
    q = np.asarray(sim.abd_body_pose(screw)[0])
    dz = q[2] - z0
    # -1.5 turns x 6 mm pitch -> the thread must drive the screw axially.
    # Sign: crest phase = th/2pi - z/PITCH; rotating by -dth keeps a fixed
    # material crest at a peg when dz = -PITCH * dth/2pi -> z DECREASES.
    expected = -1.0 * PITCH
    print(f"screw advanced {dz * 1000:+.2f} mm (ideal thread kinematics {expected * 1000:+.1f} mm)")
    # vertex-sampled thread contact slips part of the ideal advance (the
    # crest can hop a peg between vertex rings); assert the MECHANISM:
    # meaningful advance in the thread direction, bounded by the ideal
    assert dz < 0.3 * expected, (dz, expected)
    assert abs(dz) < 2.0 * abs(expected), dz
    print("screw and nut: rotation converted to axial advance through contact")


if __name__ == "__main__":
    main()
