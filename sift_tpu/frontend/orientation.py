"""Orientation assignment.

Replaces the reference's per-keypoint loop (`Sift::_orientationAssignment` +
`_findPeaks` + `_findNearestGaussian`, sift.cpp:163-286) with batched window
gathers and one-hot-matmul histograms over the fixed keypoint buffer.

parity semantics: because the reference's `vertexParabola` solves a singular
system, every peak refines to NaN (see kernels/histogram.py), the peak *set*
collapses to a single NaN, and every keypoint's orientation is NaN with no
duplicates ever spawned (sift.cpp:191-200). What still matters behaviourally:
  * the nearest-Gaussian lookup: global argmin over ALL recorded Gaussian
    sigmas, scan order octave-major (sift.cpp:205-218) — with default config
    every keypoint maps to Gaussian (0,0) while its coordinates stay in
    octave-downsampled space (the coordinate-mismatch quirk, SURVEY §3.3);
  * the boundary filter in that Gaussian's frame, `>=` form
    (sift.cpp:173-178).
Both are reproduced; the NaN orientation is reproduced literally.

lowe semantics: 36-bin Gaussian-weighted (sigma = 1.5*scale) histogram on the
keypoint's own octave, circular smoothing, peaks >= 0.8*max refined by
parabola; the strongest `max_peaks` peaks produce (duplicated) keypoints.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sift_tpu.config import SiftConfig
from sift_tpu.kernels.histogram import weighted_histogram, parabola_vertex

R = 8  # window radius: 16x16 windows, the reference's `region` (sift.cpp:164)


def nearest_gaussian_index(scale: jnp.ndarray, gauss_sigmas: np.ndarray):
    """Reference `_findNearestGaussian` (sift.cpp:205-218): first argmin of
    |recorded sigma - scale| in octave-major scan order. Diffs >= the initial
    `lowest_diff = 100` sentinel can never win (kept for fidelity)."""
    flat = jnp.asarray(gauss_sigmas.reshape(-1), jnp.float32)
    diffs = jnp.abs(flat[None, :] - scale[:, None])
    diffs = jnp.where(diffs < 100.0, diffs, jnp.inf)
    idx = jnp.argmin(diffs, axis=-1)  # first occurrence wins, like the scan
    n_levels = gauss_sigmas.shape[1]
    return idx // n_levels, idx % n_levels


def gather_window(stack_2d: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray,
                  radius: int = R) -> jnp.ndarray:
    """(2r, 2r) window [y-r, y+r) x [x-r, x+r) from a 2-D map (vmap over kps)."""
    return lax.dynamic_slice(stack_2d, (y - radius, x - radius),
                             (2 * radius, 2 * radius))


def parity_bounds_ok(x, y, widths, heights):
    """>= form boundary check (sift.cpp:173-178); widths/heights per keypoint."""
    return ((x >= R) & (x < widths - R) & (y >= R) & (y < heights - R))


def assign_orientation_parity(kp: dict, mag_stack, ori_stack, gauss_stack,
                              gauss_sigmas: np.ndarray, shapes: np.ndarray,
                              cfg: SiftConfig) -> dict:
    """kp: concatenated buffer dict. *_stack: (O, Lg, Hmax, Wmax) padded.

    shapes: static (O, 2) array of (H_o, W_o). Returns kp with `orientation`
    (= NaN), `gauss_o`, `gauss_l` fields and boundary-filtered validity.
    """
    go, gl = nearest_gaussian_index(kp["scale"], gauss_sigmas)
    hs = jnp.asarray(shapes[:, 0], jnp.int32)[go]
    ws = jnp.asarray(shapes[:, 1], jnp.int32)[go]
    xi = kp["x"].astype(jnp.int32)
    yi = kp["y"].astype(jnp.int32)
    ok = parity_bounds_ok(xi, yi, ws, hs)

    out = dict(kp)
    out["gauss_o"] = go.astype(jnp.int32)
    out["gauss_l"] = gl.astype(jnp.int32)
    out["valid"] = kp["valid"] & ok
    # vertexParabola is unconditionally NaN in parity (algorithms.cpp:165-177).
    out["orientation"] = jnp.full_like(kp["scale"], jnp.nan)
    return out


def _circular_smooth(hist: jnp.ndarray, passes: int = 1) -> jnp.ndarray:
    """[1,4,6,4,1]/16 circular smoothing along the last axis."""
    for _ in range(passes):
        hm2 = jnp.roll(hist, 2, axis=-1)
        hm1 = jnp.roll(hist, 1, axis=-1)
        hp1 = jnp.roll(hist, -1, axis=-1)
        hp2 = jnp.roll(hist, -2, axis=-1)
        hist = (hm2 + hp2 + 4.0 * (hm1 + hp1) + 6.0 * hist) / 16.0
    return hist


def peaks_from_histogram(hist: jnp.ndarray, max_peaks: int, rel: float = 0.8):
    """Top `max_peaks` circular local maxima >= rel*max, parabola-refined.

    hist: (K, 36). Returns (orientations_deg (K, P), peak_valid (K, P)).
    """
    left = jnp.roll(hist, 1, axis=-1)
    right = jnp.roll(hist, -1, axis=-1)
    hmax = jnp.max(hist, axis=-1, keepdims=True)
    is_peak = (hist >= left) & (hist > right) & (hist >= rel * hmax) & (hmax > 0)

    score = jnp.where(is_peak, hist, -jnp.inf)
    top_vals, top_idx = lax.top_k(score, max_peaks)
    pvalid = jnp.isfinite(top_vals)

    centers = top_idx.astype(jnp.float32) * 10.0 + 5.0
    yl = jnp.take_along_axis(left, top_idx, axis=-1)
    yp = jnp.take_along_axis(hist, top_idx, axis=-1)
    yr = jnp.take_along_axis(right, top_idx, axis=-1)
    v = parabola_vertex(centers - 10.0, yl, centers, yp, centers + 10.0, yr)
    return jnp.mod(v, 360.0), pvalid
