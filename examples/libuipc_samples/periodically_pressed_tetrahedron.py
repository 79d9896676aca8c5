"""Periodically pressed tetrahedron: an animated SoftPositionConstraint.

Counterpart of reference examples/libuipc-samples/
3_periodically_pressed_tetrahedron.py: a soft tet rests on the ground while
an Animation closure drives its apex vertex with aim_position =
rest + sin(pi t) along the vertical (reference :95-106). Here the animation
is an ``aim_provider`` on the attachment — called each step, jit-compatible.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

import jax.numpy as jnp

from tacex_tpu.uipc import StableNeoHookeanCfg, UipcObject, UipcObjectCfg, UipcSim, UipcSimCfg


def main() -> None:
    n = 2
    dt = 0.02
    sim = UipcSim(
        UipcSimCfg(
            num_envs=n, dt=dt, enable_ground=True,
            contact=UipcSimCfg.Contact(default_friction_ratio=0.1),
        )
    )
    # tet with apex (vertex 0) up, base on the ground
    points = np.array(
        [[0.0, 0.0, 0.12], [0.08, 0.0, 0.0], [-0.04, 0.06, 0.0], [-0.04, -0.06, 0.0]],
        np.float32,
    )
    tets = np.array([[1, 0, 2, 3]], np.int32)
    tet = UipcObject(
        UipcObjectCfg(constitution=StableNeoHookeanCfg(youngs_modulus=0.05)),
        sim, points=points, tets=tets,
    )
    frame = {"i": 0}
    rest_apex = jnp.asarray(points[0])

    def animate_apex():
        # reference animate_tet: aim = rest + sin(pi * t) * unit-vertical
        t = frame["i"] * dt
        y = -np.sin(np.pi * t) * 0.05
        return jnp.broadcast_to(rest_apex + jnp.array([0.0, 0.0, y]), (n, 1, 3))

    tet.set_attachments(np.array([0]), aim_provider=animate_apex, strength_ratio=100.0)
    sim.setup_sim()

    apex_hist = []
    for i in range(120):
        frame["i"] = i
        sim.step()
        apex_hist.append(float(tet.nodal_pos_w[0, 0, 2]))
        if i % 20 == 0:
            print(f"step {i:3d}: apex z {apex_hist[-1]:.4f}")

    apex = np.asarray(apex_hist)
    z = np.asarray(tet.nodal_pos_w[..., 2])
    assert z.min() > -1e-4, "tet penetrated the ground"
    # the apex must actually follow the periodic press: significant range,
    # and it must come back up (periodicity, not collapse)
    assert apex.max() - apex.min() > 0.02, (apex.min(), apex.max())
    # periodic recovery: the second half of the run must reach back up
    # (not "ends up", which depends on where in the sine the run stops)
    assert apex[60:].max() > apex.min() + 0.015, "apex never recovered"
    print(f"pressed tet: apex oscillated over {apex.max() - apex.min():.3f} m")


if __name__ == "__main__":
    main()
