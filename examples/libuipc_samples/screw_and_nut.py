"""Screw and nut: a motor-driven thread converts rotation into translation.

Counterpart of reference examples/libuipc-samples/8_screw_and_nut.py (an
AffineBodyConstitution screw with RotatingMotor(motor_axis, rot_vel=-pi)
threads itself through a fixed nut — the axial advance is NOT scripted, it
emerges from thread-flank contact). The reference's screw/nut .obj meshes
are git-lfs pointers upstream, so both parts are procedural here:

  * the screw is a closed surface of revolution with a TRIANGULAR thread
    profile (the ISO-like sawtooth of ops/sdf.py sdf_threads) swept along
    the helix;
  * the nut is the ANALYTIC internal-thread SDF (sdf_threads side=-1) —
    a smooth implicit surface, so thread contact is resolved at every
    screw vertex without the thin-feature vertex-hopping that a
    triangulated nut would suffer.

FRICTION IS ON (mu = 0.5): the per-Newton-iteration friction re-lag
(physics/soft/abd.py friction_lag) converges to the fully-implicit
Coulomb fixed point, so multi-point conforming thread contact no longer
self-locks (the round-2 limitation). One motor turn must advance the
screw by one pitch within ~10% of ideal thread kinematics.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

import jax.numpy as jnp

from tacex_tpu.ops import sdf as sdf_ops
from tacex_tpu.physics.soft.ipc import RigidSdfScene
from tacex_tpu.uipc import UipcObject, UipcObjectCfg, UipcSim, UipcSimCfg
from tacex_tpu.uipc.objects import AffineBodyConstitutionCfg

R_MID = 0.006  # thread mid radius (m)
DEPTH = 0.002  # radial thread depth crest-to-root
PITCH = 0.006
LENGTH = 0.036
CLEAR = 0.0005  # radial clearance screw thread -> nut thread
N_THETA, N_Z = 40, 73


def screw_mesh():
    """Fully-threaded rod: triangular profile (sdf_threads convention —
    r from r_mid+depth/2 at the crest to r_mid-depth/2 at the root,
    linear in the folded helical coordinate), closed with end caps."""
    thetas = np.linspace(0, 2 * np.pi, N_THETA, endpoint=False)
    zs = np.linspace(0, LENGTH, N_Z)
    pts = []
    for z in zs:
        for th in thetas:
            f = ((z - PITCH * th / (2 * np.pi)) / PITCH) % 1.0
            uf = min(f, 1.0 - f) * PITCH
            r = (R_MID + DEPTH / 2) - DEPTH * (uf / (PITCH / 2))
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
    lo_c = len(pts)
    pts = np.vstack([pts, [[0, 0, 0]], [[0, 0, LENGTH]]])
    hi_c = lo_c + 1
    for i in range(N_THETA):
        a, b = i, (i + 1) % N_THETA
        tris.append([lo_c, b, a])
        a2 = (N_Z - 1) * N_THETA + i
        b2 = (N_Z - 1) * N_THETA + (i + 1) % N_THETA
        tris.append([hi_c, a2, b2])
    return pts, np.asarray(tris, np.int64)


def nut_thread(base_z: float) -> np.ndarray:
    """One internal-thread row for RigidSdfScene.threads: a long threaded
    sleeve (span covers the whole travel) with mid radius R_MID + CLEAR.
    ``base_z`` sets the helix phase — the assembly alignment."""
    return np.asarray(
        [[0, 0, base_z, 0, 0, 1, R_MID + CLEAR, DEPTH, PITCH,
          -0.05 - base_z, 0.09 - base_z, -1.0]],
        np.float32,
    )


def assemble_phase(screw_pts: np.ndarray) -> float:
    """Thread the screw into the nut: scan the nut helix phase over one
    pitch and keep the offset with the largest minimum clearance (what a
    human does by turning the parts until they mate)."""
    P = jnp.asarray(screw_pts, jnp.float32)
    best, best_d = 0.0, -1.0
    for bz in np.linspace(0, PITCH, 48, endpoint=False):
        d = float(sdf_ops.sdf_threads(P, jnp.asarray(nut_thread(bz))).min())
        if d > best_d:
            best, best_d = float(bz), d
    assert best_d > 0, "screw cannot be assembled into the nut without overlap"
    return best


def main() -> None:
    sim = UipcSim(
        UipcSimCfg(
            num_envs=1, dt=1 / 60, enable_ground=False,
            newton=UipcSimCfg.Newton(max_iter=8),
            contact=UipcSimCfg.Contact(
                friction=True, default_friction_ratio=0.5,
                d_hat=0.0004, resistance=2e4,
            ),
        )
    )
    sp, st = screw_mesh()
    screw = UipcObject(
        UipcObjectCfg(constitution=AffineBodyConstitutionCfg(m_kappa=100.0)),
        sim, points=sp, triangles=st,
    )
    # reference: rm.apply_to(screw_mesh, 100, motor_axis=UnitY, rot_vel=-pi);
    # our screw axis is +z. The motor constrains only rotational DOFs; the
    # axial advance must come from thread contact.
    screw.set_rotating_motor(axis=(0.0, 0.0, 1.0), rot_vel=-np.pi, strength=2000.0)
    sim.setup_sim()

    bz = assemble_phase(sp)
    sc = RigidSdfScene.empty(1)
    scene = RigidSdfScene(
        sc.spheres, sc.boxes, sc.capsules, sc.planes,
        threads=jnp.asarray(nut_thread(bz))[None],
    )

    z0 = float(sim.abd_body_pose(screw)[0, 2])
    steps = 120  # 2 s at -pi rad/s = 1 full turn
    for i in range(steps):
        sim.step(scene)
        if i % 30 == 0:
            q = np.asarray(sim.abd_body_pose(screw)[0])
            ang = np.arctan2(q[6], q[3])
            print(f"step {i:3d}: z {q[2]:+.5f} angle {ang:+.2f}")
    sim.check_health()
    q = np.asarray(sim.abd_body_pose(screw)[0])
    dz = q[2] - z0
    # 1 turn at pitch 6 mm: u = z - pitch*theta/2pi is invariant on the
    # mating surfaces, so rotating by -2pi must translate by -pitch.
    expected = -PITCH
    print(f"screw advanced {dz * 1000:+.3f} mm "
          f"(ideal thread kinematics {expected * 1000:+.1f} mm)")
    assert abs(dz - expected) < 0.1 * abs(expected), (dz, expected)
    print("screw and nut: rotation -> translation through threaded contact "
          "WITH friction (mu=0.5)")


if __name__ == "__main__":
    main()
