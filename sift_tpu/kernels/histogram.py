"""Fixed-bin weighted orientation histograms + parabola vertex refinement.

Reference histograms (`alg::orientationHistogram36` / `orientationHistogram8`,
algorithms.cpp:118-150): bin = floor(value / bin_width) % fold — with the
quirk that fold is nbins-1 (35 and 7), so the last bin folds into bin 0.
Lowe mode uses fold = nbins.

TPU design: histograms over K-element windows are one-hot matmuls — the
(N, K) weight matrix times a (N, K, B) one-hot lands on the MXU and batches
over all keypoints at once, instead of the reference's per-pixel scalar loop.

Reference parabola vertex (`alg::vertexParabola`, algorithms.cpp:153-178):
fits y = ax^2 + bx + c through 3 points via a 3x3 solve whose third column is
all zeros — always singular, so `linearSolve` fails, leaves the zero-
initialized result untouched, and the returned vertex is -0/0 = NaN. Parity
mode reproduces the NaN; lowe mode uses the closed-form vertex.
"""

from __future__ import annotations

import jax.numpy as jnp


def weighted_histogram(values: jnp.ndarray, weights: jnp.ndarray,
                       nbins: int, bin_width: float,
                       parity_fold: bool = False) -> jnp.ndarray:
    """Histogram over the last axis.

    values:  (..., K) bin-domain values (degrees).
    weights: (..., K) non-negative weights.
    returns: (..., nbins) float32.

    In parity mode the modulus is nbins-1 (reference quirk: `% 35` / `% 7`).
    NaN values truncate to bin 0 — matching x86 float->int conversion of NaN
    (cvttss2si -> 0x80000000, truncated to u16 = 0) in the reference binary.
    """
    fold = (nbins - 1) if parity_fold else nbins
    idx = jnp.floor(values / bin_width)
    idx = jnp.where(jnp.isfinite(idx), idx, 0.0)
    idx = jnp.mod(idx.astype(jnp.int32), fold)
    onehot = (idx[..., None] == jnp.arange(nbins, dtype=jnp.int32))
    # (..., K) x (..., K, B) -> (..., B): contraction over K uses the MXU.
    return jnp.einsum("...k,...kb->...b", weights, onehot.astype(weights.dtype))


def parabola_vertex(x_left, y_left, x_peak, y_peak, x_right, y_right,
                    parity: bool = False) -> jnp.ndarray:
    """Vertex abscissa of the parabola through three points.

    parity=True reproduces the reference's degenerate solve: always NaN
    (algorithms.cpp:165-177; see module docstring).
    """
    if parity:
        return jnp.full(jnp.shape(x_peak), jnp.nan, jnp.float32)
    # Closed form for the vertex of the interpolating parabola. With
    # equally-spaced x this reduces to the familiar
    #   x_peak + 0.5*h*(y_left - y_right) / (y_left - 2*y_peak + y_right).
    denom = (x_left - x_peak) * (x_left - x_right) * (x_peak - x_right)
    a = (x_right * (y_peak - y_left) + x_peak * (y_left - y_right)
         + x_left * (y_right - y_peak)) / denom
    b = (x_right * x_right * (y_left - y_peak)
         + x_peak * x_peak * (y_right - y_left)
         + x_left * x_left * (y_peak - y_right)) / denom
    safe = jnp.abs(a) > 1e-12
    return jnp.where(safe, -b / (2.0 * jnp.where(safe, a, 1.0)), x_peak)
