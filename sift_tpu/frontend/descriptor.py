"""128-D descriptors (lowe mode).

TPU-first redesign of the reference's descriptor stage
(`Sift::_createDecriptors`, sift.cpp:60-110): instead of a per-keypoint C++
loop with in-place pyramid mutation and a *full-image* convolution per
keypoint (the reference's quadratic-blowup hot spot, sift.cpp:87 /
README.md:68-71), we:

  * sample a rotation-normalized 16x16 grid per keypoint (4x4 cells x 4x4
    samples) by bilinearly interpolating the octave's *gradient vector* maps
    (computed once per level, shared by all keypoints);
  * soft-assign each sample's orientation (relative to the keypoint) to the
    two nearest of 8 bins, weighted by gradient magnitude and a Gaussian
    window (sigma = half the descriptor window, Lowe 2004 §6.1);
  * accumulate the (K, 16, 16)-sample x 8-bin histograms as one-hot matmuls
    (MXU), then L2-normalize, clamp at `descriptor_max_component` (0.2),
    renormalize.

Everything is a fixed-shape batched tensor op; the whole stage is O(K·256)
gathers + a couple of matmuls, not O(K·H·W) convolutions.

The parity-mode descriptor (with the reference's pyramid-mutation ordering
quirk) lives in frontend/parity.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sift_tpu.config import SiftConfig

GRID = 16          # samples per side
CELLS = 4          # cells per side
BINS = 8           # orientation bins


def _bilinear_gather(map3d: jnp.ndarray, l: jnp.ndarray, y: jnp.ndarray,
                     x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of a (L, H, W) stack at float (y, x) on level l.

    l: (K,) int; y, x: (K, S) float. Out-of-range samples clamp (callers mask
    their weights). Returns (K, S).
    """
    L, H, W = map3d.shape
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    lb = jnp.broadcast_to(l[:, None], y0.shape)

    def g(yy, xx):
        return map3d[lb, yy, xx]

    v00 = g(y0, x0)
    v01 = g(y0, x0 + 1)
    v10 = g(y0 + 1, x0)
    v11 = g(y0 + 1, x0 + 1)
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def descriptors_lowe(kp: dict, dx_maps: jnp.ndarray, dy_maps: jnp.ndarray,
                     gl: jnp.ndarray, sigma_within: jnp.ndarray,
                     cfg: SiftConfig) -> jnp.ndarray:
    """Descriptors for one octave's keypoint buffer.

    kp: dict with x, y (octave coords, float), orientation (deg).
    dx_maps/dy_maps: (Lg, H, W) gradient component maps of the octave.
    gl: (K,) gaussian level per keypoint. sigma_within: (K,) within-octave sigma.
    Returns (K, 128) float32.
    """
    K = kp["x"].shape[0]
    H, W = dx_maps.shape[-2:]

    # Descriptor-frame sample offsets in cell units, centre-of-sample grid.
    s = (np.arange(GRID, dtype=np.float32) + 0.5) / GRID * CELLS - CELLS / 2
    cy, cx = np.meshgrid(s, s, indexing="ij")            # (16, 16)
    cy = jnp.asarray(cy.reshape(-1))                     # (256,)
    cx = jnp.asarray(cx.reshape(-1))

    theta = jnp.deg2rad(kp["orientation"])               # (K,)
    cos_t = jnp.cos(theta)[:, None]
    sin_t = jnp.sin(theta)[:, None]
    hist_width = 3.0 * sigma_within                      # pixels per cell unit

    # rotate descriptor frame into image frame
    ox = (cx[None, :] * cos_t - cy[None, :] * sin_t) * hist_width[:, None]
    oy = (cx[None, :] * sin_t + cy[None, :] * cos_t) * hist_width[:, None]
    px = kp["x"][:, None] + ox                           # (K, 256)
    py = kp["y"][:, None] + oy

    in_img = (px >= 1) & (px <= W - 2) & (py >= 1) & (py <= H - 2)

    gx = _bilinear_gather(dx_maps, gl, py, px)
    gy = _bilinear_gather(dy_maps, gl, py, px)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.degrees(jnp.arctan2(gy, gx))               # (-180, 180]
    rel = jnp.mod(ang - kp["orientation"][:, None], 360.0)

    # Gaussian window over the descriptor frame (sigma = half window = 2 cells)
    wsig = 0.5 * CELLS
    wgt = jnp.exp(-(cx * cx + cy * cy)[None, :] / (2.0 * wsig * wsig))
    wgt = wgt * mag * in_img.astype(mag.dtype)

    # soft orientation binning: two nearest of 8 bins
    ob = rel / (360.0 / BINS) - 0.5
    b0 = jnp.floor(ob)
    frac = ob - b0
    b0i = jnp.mod(b0.astype(jnp.int32), BINS)
    b1i = jnp.mod(b0i + 1, BINS)
    bins_iota = jnp.arange(BINS, dtype=jnp.int32)
    onehot = ((b0i[..., None] == bins_iota) * (1.0 - frac)[..., None]
              + (b1i[..., None] == bins_iota) * frac[..., None])  # (K,256,8)

    contrib = wgt[..., None] * onehot                    # (K, 256, 8)
    # samples are grid-ordered: reshape to (K, 4, 4, 4, 4, 8) = (cy, sy, cx, sx)
    contrib = contrib.reshape(K, CELLS, GRID // CELLS, CELLS, GRID // CELLS, BINS)
    cells = contrib.sum(axis=(2, 4))                     # (K, 4, 4, 8)
    desc = cells.reshape(K, CELLS * CELLS * BINS)        # (K, 128)

    # normalize -> clamp -> renormalize (Lowe 2004 §6.1)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-7)
    desc = jnp.minimum(desc, cfg.descriptor_max_component)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-7)
    return desc
