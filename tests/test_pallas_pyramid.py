"""Pallas fused deformation pyramid vs the XLA path (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from tacex_tpu.ops.blur import gaussian_blur
from tacex_tpu.ops.pallas_pyramid import deformation_pyramid_pallas

SIGMAS = ((3.0, 2.2), (1.5, 1.1), (0.8, 0.6), (1.0, 0.75))


def _xla(joined, mask):
    x = joined
    for i, s in enumerate(SIGMAS):
        x = gaussian_blur(x, s)
        if i < len(SIGMAS) - 1:
            x = jnp.where(mask, joined, x)
    return x


class TestPallasPyramid:
    def test_matches_xla_path(self):
        rng = np.random.default_rng(0)
        joined = jnp.asarray(rng.uniform(-1, 2, (3, 48, 64)).astype(np.float32))
        mask = jnp.asarray(rng.random((3, 48, 64)) < 0.2)
        ref = _xla(joined, mask)
        out = deformation_pyramid_pallas(joined, mask, SIGMAS, block=2, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_ragged_batch_padding(self):
        rng = np.random.default_rng(1)
        joined = jnp.asarray(rng.uniform(-1, 2, (5, 32, 32)).astype(np.float32))
        mask = jnp.asarray(rng.random((5, 32, 32)) < 0.2)
        out = deformation_pyramid_pallas(joined, mask, SIGMAS, block=4, interpret=True)
        assert out.shape == (5, 32, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(_xla(joined, mask)), atol=1e-5)
