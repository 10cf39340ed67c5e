"""Linear (DLT) two-view triangulation, batched over correspondences.

Each point solves a 4x4 homogeneous system; the batch is one vmapped
`eigh` over (N, 4, 4) — fixed shape, no per-point control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray,
                    x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Triangulate N correspondences.

    Args:
      P1, P2: (3, 4) projection matrices (already include K for pixel inputs,
              or are [R|t] for normalized-coordinate inputs).
      x1, x2: (N, 2) observations in the respective image/normalized frames.

    Returns (N, 3) points in the frame P1/P2 project from.
    """
    # DLT rows: u * P[2] - P[0], v * P[2] - P[1], for both views.
    a0 = x1[:, 0:1] * P1[2][None] - P1[0][None]
    a1 = x1[:, 1:2] * P1[2][None] - P1[1][None]
    a2 = x2[:, 0:1] * P2[2][None] - P2[0][None]
    a3 = x2[:, 1:2] * P2[2][None] - P2[1][None]
    A = jnp.stack([a0, a1, a2, a3], axis=1)           # (N, 4, 4)

    M = jnp.einsum("nij,nik->njk", A, A)              # (N, 4, 4) normal eqs
    _, vecs = jnp.linalg.eigh(M)
    Xh = vecs[..., 0]                                  # (N, 4)
    w = Xh[..., 3:]
    return Xh[..., :3] / jnp.where(jnp.abs(w) < _EPS, _EPS, w)


def reprojection_depths(R: jnp.ndarray, t: jnp.ndarray,
                        X: jnp.ndarray):
    """Depths of camera-A-frame points X in cameras A and B (x_b = R x_a + t)."""
    za = X[..., 2]
    zb = (X @ R.T + t)[..., 2]
    return za, zb
