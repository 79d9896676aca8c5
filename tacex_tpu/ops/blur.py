"""Separable Gaussian blur, TPU-first.

The reference Taxim implementation blurs with full 2-D FFT convolutions
(reference source/tacex/.../gpu_taxim/sim/taxim_jax.py:328-374). On TPU a
Gaussian is better expressed as two 1-D depthwise convolutions along H and W:
XLA lowers them onto the VPU/MXU with fused reflect-padded windows and no
FFT round-trips through HBM. Kernel sizes replicate the reference rule
(outermost weight < 1e-5, forced odd) so outputs match to float tolerance.

All entry points are shape-static and jit/vmap-safe.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def kernel_size_for_sigma(sigma: float, eps: float = 1e-5) -> int:
    """Odd kernel size such that the outermost tap weight is below ``eps``.

    Mirrors the sizing rule of the reference (taxim_jax.py:335-342).
    """
    sigma = float(sigma)
    if sigma <= 0:
        return 1
    arg = -2.0 * math.log(eps * math.sqrt(2.0 * math.pi) * sigma)
    if arg <= 0:
        return 1
    return int(round(math.sqrt(arg) * sigma)) // 2 * 2 + 1


@functools.lru_cache(maxsize=256)
def _gaussian_kernel1d(sigma: float, ksize: int) -> np.ndarray:
    x = np.linspace(-(ksize - 1) * 0.5, (ksize - 1) * 0.5, num=ksize)
    pdf = np.exp(-0.5 * (x / max(sigma, 1e-12)) ** 2)
    return (pdf / pdf.sum()).astype(np.float32)


def _conv1d_along(img: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    """Reflect-padded 1-D convolution along ``axis`` of a (B, H, W) array."""
    k = kernel.shape[0]
    if k == 1:
        return img
    p = (k - 1) // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (p, p)
    img = jnp.pad(img, pad, mode="reflect")
    # lax conv wants NCHW; fold everything but H,W into N.
    b = img.shape[0]
    x = img[:, None]  # (B, 1, H', W')
    if axis == 1:
        rhs = kernel.reshape(1, 1, k, 1)
    else:
        rhs = kernel.reshape(1, 1, 1, k)
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        rhs.astype(jnp.float32),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0].reshape((b,) + out.shape[-2:])


def gaussian_blur(
    img: jax.Array,
    sigma_xy: tuple[float, float],
    kernel_size: tuple[int, int] | None = None,
) -> jax.Array:
    """Blur ``img`` with a separable Gaussian.

    Args:
      img: ``(..., H, W)`` or ``(..., H, W, C)`` array. A trailing axis of
        size <= 4 is treated as channels.
      sigma_xy: ``(sigma_x, sigma_y)`` — x blurs along W, y along H
        (matching the reference's ``(w_val, h_val)`` convention,
        taxim_impl.py:38-44).
      kernel_size: optional ``(k_x, k_y)``; derived from sigma when omitted.

    Returns: blurred array, same shape/dtype family (float32).
    """
    sx, sy = float(sigma_xy[0]), float(sigma_xy[1])
    if kernel_size is None:
        kx, ky = kernel_size_for_sigma(sx), kernel_size_for_sigma(sy)
    else:
        kx, ky = int(kernel_size[0]), int(kernel_size[1])

    has_channels = img.ndim >= 3 and img.shape[-1] <= 4
    if has_channels:
        ch = img.shape[-1]
        spatial = img.shape[-3:-1]
        lead = img.shape[:-3]
        # channels become batch: (..., H, W, C) -> (B*C, H, W)
        x = jnp.moveaxis(img.reshape((-1,) + spatial + (ch,)), -1, 1)
        x = x.reshape((-1,) + spatial)
    else:
        spatial = img.shape[-2:]
        lead = img.shape[:-2]
        x = img.reshape((-1,) + spatial)

    x = _conv1d_along(x, jnp.asarray(_gaussian_kernel1d(sy, ky)), axis=1)
    x = _conv1d_along(x, jnp.asarray(_gaussian_kernel1d(sx, kx)), axis=2)

    if has_channels:
        x = x.reshape((-1, ch) + spatial)
        x = jnp.moveaxis(x, 1, -1)
        return x.reshape(lead + spatial + (ch,))
    return x.reshape(lead + spatial)


def box_dilate(mask: jax.Array, kernel_hw: tuple[int, int]) -> jax.Array:
    """Binary dilation by a (kh, kw) box via max-pooling (VPU reduce-window).

    Replaces the reference's two-round ones-kernel convolution used to grow the
    shadow attachment area (taxim_jax.py:206-218) — a max-window is the
    TPU-native formulation of the same ``!= 0`` test.
    """
    kh, kw = int(kernel_hw[0]), int(kernel_hw[1])
    kh, kw = max(kh, 1), max(kw, 1)
    if kh == 1 and kw == 1:
        return mask
    x = mask.astype(jnp.float32)
    lead = x.shape[:-2]
    x = x.reshape((-1,) + x.shape[-2:])
    # Pad so output size matches 'same' convolution with an (kh, kw) kernel.
    ph0, ph1 = (kh - 1) // 2, kh - 1 - (kh - 1) // 2
    pw0, pw1 = (kw - 1) // 2, kw - 1 - (kw - 1) // 2
    out = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kh, kw),
        window_strides=(1, 1, 1),
        padding=((0, 0), (ph0, ph1), (pw0, pw1)),
    )
    return (out > 0).reshape(lead + mask.shape[-2:])
