"""Separable Gaussian blur.

Reference semantics (`alg::convolveWithGauss`, algorithms.cpp:10-22): Vigra
`Kernel1D::initGaussian(sigma)` — a *sampled* Gaussian with radius
``round(3*sigma)``, normalized to unit sum — applied separably in X then Y
with reflective (mirror, edge-not-repeated) border treatment. That is exactly
``scipy.ndimage.gaussian_filter(img, sigma, truncate=3.0, mode="mirror")``,
which the unit tests use as the oracle.

TPU design: the blur is expressed as two 1-D convolutions via
`lax.conv_general_dilated` over an explicit mirror pad. XLA lowers these to
MXU/VPU-friendly fused loops; the kernel taps are compile-time constants
(sigma is static config), so each pyramid level compiles to a fixed-tap
stencil. No Pallas version: the banded-matmul formulation already runs at
73-193 GB/s on v5e (BENCH.md) and a hand kernel has nothing left to fuse.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def gaussian_radius(sigma: float) -> int:
    """Vigra's kernel radius: round(3*sigma) (windowSize = 2*radius+1)."""
    return max(1, int(3.0 * float(sigma) + 0.5))


def gaussian_kernel_1d(sigma: float, radius: int | None = None,
                       dtype=np.float32) -> np.ndarray:
    """Sampled, sum-normalized 1-D Gaussian (static numpy array).

    Matches Vigra initGaussian(sigma) and scipy's gaussian_filter1d kernel
    (truncate=3.0): taps exp(-x^2 / (2 sigma^2)) at integer offsets,
    normalized to sum 1.
    """
    if radius is None:
        radius = gaussian_radius(sigma)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    taps = np.exp(-0.5 * (x / float(sigma)) ** 2)
    taps /= taps.sum()
    return taps.astype(dtype)


def _mirror_pad_1d(img: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Reflect-without-edge-duplication padding along one axis.

    Handles radius >= dim by repeated reflection (rare: tiny top-octave
    images with large sigma), matching scipy's 'mirror' mode behaviour.
    """
    dim = img.shape[axis]
    while radius >= dim:
        pad = [(0, 0)] * img.ndim
        pad[axis] = (dim - 1, dim - 1)
        img = jnp.pad(img, pad, mode="reflect")
        radius -= dim - 1
        dim = img.shape[axis]
        if dim <= 1:
            break
    if radius > 0:
        pad = [(0, 0)] * img.ndim
        pad[axis] = (radius, radius)
        img = jnp.pad(img, pad, mode="reflect")
    return img


def _conv_1d(img: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """VALID 1-D convolution of a (..., H, W) stack along H or W."""
    radius = (len(taps) - 1) // 2
    lead = img.shape[:-2]
    h, w = img.shape[-2], img.shape[-1]
    x = img.reshape((-1, 1, h, w))
    x = _mirror_pad_1d(x, radius, axis=2 + (axis % 2))
    k = jnp.asarray(taps, img.dtype)
    if axis % 2 == 0:  # along H
        kern = k.reshape((1, 1, -1, 1))
    else:              # along W
        kern = k.reshape((1, 1, 1, -1))
    y = lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y.reshape(lead + (h, w))


def _mirror_index(j: int, n: int) -> int:
    """scipy 'mirror' (reflect-without-edge-duplication) index folding."""
    if n == 1:
        return 0
    period = 2 * n - 2
    j = j % period
    return j if j < n else period - j


@functools.lru_cache(maxsize=None)
def blur_matrix(n: int, sigma: float, radius: int | None = None) -> np.ndarray:
    """(n, n) banded blur operator with mirror border folded into the band.

    Row i holds the Gaussian taps centred at i, with out-of-range taps
    reflected back inside — multiplying by this matrix is *exactly* the
    mirror-padded 1-D convolution. The payoff: a 1-channel convolution is
    VPU work XLA runs at a few GFLOP/s, but `A_h @ img @ A_w` is two dense
    matmuls that tile straight onto the MXU (the pyramid's whole cost).
    Matrices are compile-time constants (sigma and sizes are static config),
    cached per (size, sigma).
    """
    taps = gaussian_kernel_1d(sigma, radius=radius, dtype=np.float64)
    r = (len(taps) - 1) // 2
    A = np.zeros((n, n), np.float64)
    for i in range(n):
        for k, t in enumerate(taps):
            A[i, _mirror_index(i + k - r, n)] += t
    return A.astype(np.float32)


# Below this size the matmul wins outright; above it the O(n) band conv wins
# (the band is ~13-30 wide, so the dense matmul does ~n/30x extra FLOPs —
# cheap on the MXU up to ~2k-sized images, which covers every pyramid level
# of VGA- and KITTI-class (1241x376) inputs).
_MATMUL_MAX_DIM = 2048


def gaussian_blur(img: jnp.ndarray, sigma: float,
                  radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur of a (..., H, W) image stack.

    `sigma` is a static Python float (pyramid schedules are config-derived,
    so every tap vector is a compile-time constant).
    """
    h, w = img.shape[-2], img.shape[-1]
    if max(h, w) <= _MATMUL_MAX_DIM:
        Ah = jnp.asarray(blur_matrix(h, float(sigma), radius))
        Aw = jnp.asarray(blur_matrix(w, float(sigma), radius))
        # Reference order X then Y (algorithms.cpp:18-19); exact either way.
        out = jnp.einsum("...hw,wW->...hW", img, Aw.T,
                         precision=lax.Precision.HIGHEST)
        out = jnp.einsum("Hh,...hw->...Hw", Ah, out,
                         precision=lax.Precision.HIGHEST)
        return out
    taps = gaussian_kernel_1d(sigma, radius=radius)
    out = _conv_1d(img, taps, axis=1)
    out = _conv_1d(out, taps, axis=0)
    return out


def incremental_sigma(sigma_prev: float, sigma_target: float) -> float:
    """Blur increment so blur(blur(I, s_prev), delta) == blur(I, s_target).

    Used by the lowe-mode pyramid (the reference instead re-blurs with the
    *full* new sigma, sift.cpp:395-397 — a quirk the parity pyramid keeps).
    """
    d2 = sigma_target * sigma_target - sigma_prev * sigma_prev
    assert d2 > 0, (sigma_prev, sigma_target)
    return math.sqrt(d2)
