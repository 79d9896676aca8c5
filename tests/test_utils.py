"""Tests for profiling/visualizer utilities and tooling."""

import numpy as np

import jax.numpy as jnp

from tacex_tpu.utils import LiveVisualizer, Timer


class TestTimer:
    def test_nested_scopes_report(self):
        t = Timer()
        with t.scope("step"):
            with t.scope("physics"):
                x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            with t.scope("tactile", fence=x):
                pass
        rep = t.report(as_json=True)
        assert "step" in rep and "step/physics" in rep and "step/tactile" in rep
        assert rep["step"]["total_ms"] >= rep["step/physics"]["total_ms"]
        assert isinstance(t.report(), str)

    def test_reset(self):
        t = Timer()
        with t.scope("a"):
            pass
        t.reset()
        assert t.report(as_json=True) == {}


class TestVisualizer:
    def test_scalars_and_frames(self, tmp_path):
        v = LiveVisualizer(tmp_path)
        for i in range(5):
            v.add_scalars(i, {"reward": i * 0.5, "loss": 1.0 / (i + 1)})
            v.add_frame("tactile", np.random.rand(24, 32, 3))
        p1 = v.save_plots()
        p2 = v.save_frame_strip("tactile")
        assert p1.exists() and p2.exists()
