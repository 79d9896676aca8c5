"""VPU-rate LUT row lookup for the Taxim shading halo (Pallas/Mosaic).

The Taxim polynomial LUT is (num_bins x num_bins) rows over (gradient
magnitude, direction). The per-pixel XLA row gather is issue-bound at
~3.4 ns/index (measured cost model in sensors/gelsight/taxim/optical.py),
which caps the 320x240 sensor pipeline. But the pixels that dominate a
real frame are the deformation HALO: gradient magnitude in bin 0, only
the direction varies — i.e. lookups into a 125-row subtable that fits in
ONE 128-lane vector register.

Mosaic lowers ``jnp.take_along_axis`` on matching (R, 128) operands to
``tpu.dynamic_gather`` (jax/_src/pallas/mosaic/lowering.py:2517-2523):
an in-register lane shuffle, one instruction per (8, 128) vreg — about
3 orders of magnitude cheaper per index than the HBM row gather. This
kernel evaluates the full quadratic shading for every pixel AS IF its
magnitude bin were 0:

    out[ch] = sum_k feats[k] * lut0[dir_idx, k, ch]

Pixels with magnitude bin >= 1 get a wrong (halo) value here and are
overwritten by the compacted exact gather in optical.shade.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLK = 1024  # pixels per program: (8, 128) int32 fits vregs; 8 sublane rows


def _kernel(idir_ref, feats_ref, tabs_ref, out0_ref, out1_ref, out2_ref):
    idx = idir_ref[0]  # (R, 128) int32, values in [0, 125)
    R = idx.shape[0]
    acc = [jnp.zeros((R, 128), jnp.float32) for _ in range(3)]
    for k in range(6):
        f_k = feats_ref[k]  # (R, 128)
        for ch in range(3):
            tab = tabs_ref[k * 3 + ch]  # (128,)
            rows = jnp.broadcast_to(tab[None, :], (R, 128))
            c = jnp.take_along_axis(rows, idx, axis=1, mode="promise_in_bounds")
            acc[ch] = acc[ch] + f_k * c
    out0_ref[0] = acc[0]
    out1_ref[0] = acc[1]
    out2_ref[0] = acc[2]


def _pick_rows_per_block(stripes: int, cap: int = 64) -> int:
    """Largest multiple-of-8 divisor of ``stripes`` up to ``cap`` (Mosaic
    requires the sublane block dim divisible by 8)."""
    for r in range(min(cap, stripes) // 8 * 8, 0, -8):
        if stripes % r == 0:
            return r
    return 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def dir_row_shade(
    idir: jax.Array,  # (n, P) int32 direction-bin indices
    feats: jax.Array,  # (6, P) float32 quadratic pixel features
    tabs: jax.Array,  # (18, 128) float32: lut[mag=0] as [k*3+ch, dir]
    interpret: bool = False,
) -> jax.Array:
    """(n, P, 3) shading of every pixel with its magnitude-0 LUT row.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests); pixel counts not divisible by 128 are padded internally.
    """
    n, P = idir.shape
    assert feats.shape == (6, P) and tabs.shape == (18, 128)
    P_pad = ((P + 1023) // 1024) * 1024  # stripes divisible by 8
    if P_pad != P:
        idir = jnp.pad(idir, ((0, 0), (0, P_pad - P)))
        feats = jnp.pad(feats, ((0, 0), (0, P_pad - P)))
    stripes = P_pad // 128
    R = _pick_rows_per_block(stripes)

    grid = (n, stripes // R)
    out_shape = [jax.ShapeDtypeStruct((n, stripes, 128), jnp.float32)] * 3
    outs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, 128), lambda i, j: (i, j, 0)),
            pl.BlockSpec((6, R, 128), lambda i, j: (0, j, 0)),
            pl.BlockSpec((18, 128), lambda i, j: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, R, 128), lambda i, j: (i, j, 0))] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(
        idir.reshape(n, stripes, 128),
        feats.reshape(6, stripes, 128),
        tabs,
    )
    out = jnp.stack([o.reshape(n, P_pad) for o in outs], axis=-1)
    return out[:, :P]


def dir_row_shade_reference(idir, feats, tabs):
    """XLA reference (and CPU fallback): same contract as dir_row_shade."""
    c = jnp.take(tabs.T, idir, axis=0)  # (n, P, 18)
    c = c.reshape(c.shape[:-1] + (6, 3))
    return jnp.einsum("kp,npkc->npc", feats, c)
