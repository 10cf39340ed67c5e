"""Nearest-neighbour resize matching Vigra's `resizeImageNoInterpolation`.

Reference semantics (`alg::reduceToNextLevel` / `increaseToNextLevel`,
algorithms.cpp:24-49): blur, then per-axis nearest resampling where
destination index i maps to source index ``int(i * (ssize-1)/(dsize-1) + 0.5)``
(Vigra's resizeLineNoInterpolation rounding rule). Down: dsize=(ssize+1)//2;
up: dsize=2*ssize.

Implemented as a static gather (indices are compile-time numpy constants), so
XLA compiles it to pure data movement — no dynamic shapes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _nearest_indices(ssize: int, dsize: int) -> np.ndarray:
    if dsize == 1:
        return np.zeros((1,), np.int32)
    ratio = (ssize - 1) / (dsize - 1)
    idx = (np.arange(dsize) * ratio + 0.5).astype(np.int64)
    return np.clip(idx, 0, ssize - 1).astype(np.int32)


def resize_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest resize of a (..., H, W) stack to (..., out_h, out_w)."""
    h, w = img.shape[-2], img.shape[-1]
    iy = _nearest_indices(h, out_h)
    ix = _nearest_indices(w, out_w)
    return img[..., iy, :][..., :, ix]


def downsample_half(img: jnp.ndarray) -> jnp.ndarray:
    """Reference octave step: resize to ((H+1)//2, (W+1)//2) (algorithms.cpp:28)."""
    h, w = img.shape[-2], img.shape[-1]
    return resize_nearest(img, (h + 1) // 2, (w + 1) // 2)


def upsample_double(img: jnp.ndarray) -> jnp.ndarray:
    """Reference subpixel step: resize to (2H, 2W) (algorithms.cpp:41)."""
    h, w = img.shape[-2], img.shape[-1]
    return resize_nearest(img, 2 * h, 2 * w)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize (used by the lowe-mode pipeline and dataset loaders)."""
    import jax
    return jax.image.resize(img, img.shape[:-2] + (out_h, out_w), method="bilinear")
