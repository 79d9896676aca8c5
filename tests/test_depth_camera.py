"""Tests for the analytic depth camera (TiledCamera replacement)."""

import numpy as np

import jax.numpy as jnp

from tacex_tpu.core import maths
from tacex_tpu.render.depth_camera import SdfScene, render_depth, render_depth_batch


def _downward_cam(height=0.1):
    """Camera at z=height looking straight down (-z world = +z camera)."""
    pos = jnp.array([0.0, 0.0, height])
    # rotate camera +Z onto world -Z: rotation by pi about x
    quat = maths.quat_from_angle_axis(jnp.asarray(jnp.pi), jnp.array([1.0, 0.0, 0.0]))
    return pos, quat


class TestPrimitives:
    def test_plane_depth(self):
        pos, quat = _downward_cam(0.1)
        scene = SdfScene.empty(1)
        scene = SdfScene(
            spheres=scene.spheres,
            boxes=scene.boxes,
            capsules=scene.capsules,
            planes=jnp.array([[[0.0, 0.0, 1.0, 0.0]]]),  # ground z=0
        )
        d = render_depth_batch(pos[None], quat[None], scene, (16, 16), (0.02, 0.02), far=1.0)
        np.testing.assert_allclose(np.asarray(d), 0.1, atol=1e-6)

    def test_sphere_depth_profile(self):
        pos, quat = _downward_cam(0.1)
        scene = SdfScene.empty(1)
        scene = SdfScene(
            spheres=jnp.array([[[0.0, 0.0, 0.0, 0.02]]]),  # r=2cm at origin
            boxes=scene.boxes,
            capsules=scene.capsules,
            planes=scene.planes,
        )
        d = np.asarray(
            render_depth_batch(pos[None], quat[None], scene, (64, 64), (0.08, 0.08), far=0.5)
        )[0]
        # center pixel: distance to sphere top = 0.1 - 0.02
        assert abs(d[32, 32] - 0.08) < 1e-3
        # corners: miss -> far
        assert d[0, 0] == 0.5
        # radially symmetric
        assert abs(d[32, 40] - d[40, 32]) < 1e-5

    def test_box_depth(self):
        pos, quat = _downward_cam(0.05)
        scene = SdfScene.empty(1)
        box = jnp.concatenate(
            [jnp.array([0.0, 0.0, -0.01]), maths.quat_identity(), jnp.array([0.05, 0.05, 0.02])]
        )
        scene = SdfScene(
            spheres=scene.spheres,
            boxes=box[None, None, :],
            capsules=scene.capsules,
            planes=scene.planes,
        )
        d = np.asarray(render_depth_batch(pos[None], quat[None], scene, (8, 8), (0.02, 0.02), far=1.0))
        # box top face at z=0.01 -> depth 0.04
        np.testing.assert_allclose(d, 0.04, atol=1e-5)

    def test_capsule_depth(self):
        pos, quat = _downward_cam(0.1)
        scene = SdfScene.empty(1)
        cap = jnp.array([[-0.03, 0.0, 0.0, 0.03, 0.0, 0.0, 0.01, 1.0]])  # x-axis capsule r=1cm
        scene = SdfScene(
            spheres=scene.spheres, boxes=scene.boxes, capsules=cap[None], planes=scene.planes
        )
        d = np.asarray(
            render_depth_batch(pos[None], quat[None], scene, (64, 64), (0.1, 0.1), far=0.5)
        )[0]
        # above the cylinder mid: top at z = 0.01 -> depth 0.09
        assert abs(d[32, 32] - 0.09) < 1e-3
        # off to the side in y: miss
        assert d[0, 32] == 0.5

    def test_nearest_of_multiple(self):
        pos, quat = _downward_cam(0.1)
        scene = SdfScene(
            spheres=jnp.array([[[0.0, 0.0, 0.0, 0.02]]]),
            boxes=jnp.zeros((1, 1, 10)),
            capsules=jnp.zeros((1, 1, 8)),
            planes=jnp.array([[[0.0, 0.0, 1.0, -0.05]]]),  # ground z=-0.05
        )
        d = np.asarray(render_depth_batch(pos[None], quat[None], scene, (32, 32), (0.08, 0.08), far=1.0))[0]
        assert abs(d[16, 16] - 0.08) < 1e-3  # sphere top
        assert abs(d[0, 0] - 0.15) < 1e-5  # plane

    def test_batched_envs(self):
        pos, quat = _downward_cam(0.1)
        spheres = jnp.array([[[0.0, 0.0, 0.0, 0.02]], [[0.0, 0.0, 0.0, 0.01]]])
        scene = SdfScene(
            spheres=spheres,
            boxes=jnp.zeros((2, 1, 10)),
            capsules=jnp.zeros((2, 1, 8)),
            planes=jnp.zeros((2, 1, 4)),
        )
        d = np.asarray(
            render_depth_batch(
                jnp.broadcast_to(pos, (2, 3)), jnp.broadcast_to(quat, (2, 4)), scene, (32, 32), (0.08, 0.08), 0.5
            )
        )
        assert abs(d[0, 16, 16] - 0.08) < 1e-3
        assert abs(d[1, 16, 16] - 0.09) < 1e-3
