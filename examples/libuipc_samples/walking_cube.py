"""Walking cube: a RotatingMotor-driven affine cube tumbles across a board.

Counterpart of reference examples/libuipc-samples/
5_walking_cube_moving_board.py: an ABD cube (100 MPa) with a RotatingMotor
(strength 100, motor_rot_vel = pi) walks over a free board that is itself an
affine body under a SoftTransformConstraint (lower board fixed). Here the
fixed board is the ground plane, the free board is an ABD box the cube lands
on and pushes around through body-body barrier contact + friction.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

from tacex_tpu.assets.meshes import box_mesh, weld_soup
from tacex_tpu.uipc import UipcObject, UipcObjectCfg, UipcSim, UipcSimCfg
from tacex_tpu.uipc.objects import AffineBodyConstitutionCfg


def main() -> None:
    sim = UipcSim(
        UipcSimCfg(
            num_envs=1, dt=1 / 60, enable_ground=True,
            newton=UipcSimCfg.Newton(max_iter=8),
            contact=UipcSimCfg.Contact(
                default_friction_ratio=0.5, d_hat=0.002, resistance=1e4
            ),
        )
    )
    # free board resting on the ground
    bp, bt = weld_soup(box_mesh(0.15, 0.08, 0.01))
    board = UipcObject(
        UipcObjectCfg(constitution=AffineBodyConstitutionCfg(m_kappa=10.0), mass_density=500.0),
        sim, points=bp + np.array([0.0, 0.0, 0.0125], np.float32), triangles=bt,
    )
    # motor cube on top of the board
    cp, ct = weld_soup(box_mesh(0.04, 0.04, 0.04))
    cube = UipcObject(
        UipcObjectCfg(constitution=AffineBodyConstitutionCfg(m_kappa=100.0)),
        sim, points=cp + np.array([-0.08, 0.0, 0.068], np.float32), triangles=ct,
    )
    # RotatingMotor (reference rm.apply_to(cube_mesh, 100, motor_rot_vel=pi));
    # omega = +y tumbles the cube toward +x (verified by the bare-ground
    # experiment: +pi/2 -> +0.16 m in 2 s, mirror-symmetric for -pi/2)
    cube.set_rotating_motor(axis=(0.0, 1.0, 0.0), rot_vel=0.5 * np.pi, strength=300.0)
    sim.setup_sim()

    x0_cube = float(cube.root_pos_w[0, 0])
    x0_board = float(board.root_pos_w[0, 0])
    for i in range(240):
        sim.step()
        if i % 25 == 0:
            print(
                f"step {i:3d}: cube x {float(cube.root_pos_w[0, 0]):+.4f} "
                f"board x {float(board.root_pos_w[0, 0]):+.4f} "
                f"cube z {float(cube.root_pos_w[0, 2]):.4f}"
            )
    sim.check_health()
    dx_cube = float(cube.root_pos_w[0, 0]) - x0_cube
    dx_board = float(board.root_pos_w[0, 0]) - x0_board
    z_cube = float(cube.root_pos_w[0, 2])
    # rotating about +y with friction drives the cube in +x; the board feels
    # the reaction through body-body friction. No tunneling allowed.
    assert dx_cube > 0.03, f"cube did not walk: dx={dx_cube:.4f}"
    assert z_cube > 0.02, f"cube fell through: z={z_cube:.4f}"
    print(f"walking cube: cube advanced {dx_cube:.3f} m, board reacted {dx_board:+.4f} m")


if __name__ == "__main__":
    main()
