"""Pallas dir-row LUT kernel + the compacted shading path.

The kernel (ops/pallas_lut.py) runs the Taxim halo lookups at VPU rate on
TPU (measured 15.7 us/img vs 328 us/img XLA at 320x240, exact); on CPU it
runs in the Pallas interpreter. The compacted shade path must be exact vs
the dense gather whenever the contact region fits the capacity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacex_tpu.ops.pallas_lut import dir_row_shade, dir_row_shade_reference


class TestDirRowShade:
    def test_interpreter_matches_reference(self):
        rng = np.random.default_rng(0)
        n, P = 3, 2048
        idir = jnp.asarray(rng.integers(0, 125, (n, P)), jnp.int32)
        feats = jnp.asarray(rng.normal(size=(6, P)).astype(np.float32))
        tabs = jnp.asarray(rng.normal(size=(18, 128)).astype(np.float32))
        out = dir_row_shade(idir, feats, tabs, interpret=True)
        ref = dir_row_shade_reference(idir, feats, tabs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_unaligned_pixel_count_padded(self):
        rng = np.random.default_rng(1)
        n, P = 2, 768  # 32x24 sensor image; not a multiple of 1024
        idir = jnp.asarray(rng.integers(0, 125, (n, P)), jnp.int32)
        feats = jnp.asarray(rng.normal(size=(6, P)).astype(np.float32))
        tabs = jnp.asarray(rng.normal(size=(18, 128)).astype(np.float32))
        out = dir_row_shade(idir, feats, tabs, interpret=True)
        ref = dir_row_shade_reference(idir, feats, tabs)
        assert out.shape == (n, P, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestCompactShade:
    def test_compact_exact_at_capacity(self):
        """shade(compact_capacity=hw) == dense shade (every contact pixel
        fits, filler slots rewrite identical values)."""
        from tacex_tpu.sensors.gelsight.taxim import optical
        from tacex_tpu.sensors.gelsight.taxim.calib import load_calib

        calib = load_calib().at_resolution((60, 80))
        h, w = 60, 80
        yy, xx = np.meshgrid(
            np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
            indexing="ij",
        )
        r = np.sqrt((yy - 30) ** 2 + (xx - 40) ** 2) * 0.24
        z = np.where(r < 4, 4 - np.sqrt(np.maximum(16 - r * r, 0)), 4.0)
        hm = jnp.asarray((z - 0.8)[None].astype(np.float32))

        dense = optical.render(calib, hm)
        compact = optical.render(calib, hm, compact_capacity=h * w)
        np.testing.assert_allclose(
            np.asarray(compact), np.asarray(dense), atol=1e-5
        )

    def test_compact_partial_capacity_background_ok(self):
        """With a small capacity, background/halo pixels are still correct;
        only overflowed contact pixels may differ."""
        from tacex_tpu.sensors.gelsight.taxim import optical
        from tacex_tpu.sensors.gelsight.taxim.calib import load_calib

        calib = load_calib().at_resolution((60, 80))
        h, w = 60, 80
        yy, xx = np.meshgrid(
            np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
            indexing="ij",
        )
        r = np.sqrt((yy - 30) ** 2 + (xx - 40) ** 2) * 0.24
        z = np.where(r < 4, 4 - np.sqrt(np.maximum(16 - r * r, 0)), 4.0)
        hm = jnp.asarray((z - 0.8)[None].astype(np.float32))
        dense = np.asarray(optical.render(calib, hm))
        compact = np.asarray(optical.render(calib, hm, compact_capacity=64))
        # far-from-contact pixels identical
        corner = (slice(None), slice(0, 8), slice(0, 8))
        np.testing.assert_allclose(compact[corner], dense[corner], atol=1e-5)
