"""Homography estimation: weighted DLT + batched RANSAC.

One fit routine serves both the minimal solver (weights = 0/1 mask over the
4-point sample) and the inlier refit (weights = inlier mask): the weighted
normal matrix A^T W A is a fixed-shape 9x9 regardless of how many points
participate, and its smallest eigenvector is the model — `jnp.linalg.eigh`
on a 9x9 is cheap and batches cleanly under vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sift_tpu.config import RansacConfig
from sift_tpu.geometry.ransac import ransac
from sift_tpu.types import TwoViewEstimate

_EPS = 1e-12


def _normalization(pts: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Hartley normalization transform (3, 3) for weighted points."""
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, _EPS)
    return jnp.asarray([[s, 0.0, -s * mean[0]],
                        [0.0, s, -s * mean[1]],
                        [0.0, 0.0, 1.0]], pts.dtype)


def _apply_h(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    q = ph @ T.T
    return q[..., :2] / jnp.where(jnp.abs(q[..., 2:]) < _EPS, _EPS, q[..., 2:])


def fit_homography(pa: jnp.ndarray, pb: jnp.ndarray,
                   weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted DLT: H with pb ~ H pa. pa/pb: (N, 2); weights: (N,) or None."""
    n = pa.shape[0]
    w = jnp.ones((n,), pa.dtype) if weights is None else weights

    Ta = _normalization(pa, w)
    Tb = _normalization(pb, w)
    na = _apply_h(Ta, pa)
    nb = _apply_h(Tb, pb)

    x, y = na[:, 0], na[:, 1]
    u, v = nb[:, 0], nb[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # Two DLT rows per correspondence.
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # (2N, 9)

    M = A.T @ A                                   # 9x9 normal matrix
    _, vecs = jnp.linalg.eigh(M)
    h = vecs[:, 0]                                # smallest eigenvalue
    Hn = h.reshape(3, 3)
    H = jnp.linalg.solve(Tb, Hn @ Ta)             # denormalize: Tb^-1 Hn Ta
    return H / jnp.where(jnp.abs(H[2, 2]) < _EPS, _EPS, H[2, 2])


def symmetric_transfer_error(H: jnp.ndarray, pa: jnp.ndarray,
                             pb: jnp.ndarray) -> jnp.ndarray:
    """Squared symmetric transfer error |H pa - pb|^2 + |H^-1 pb - pa|^2."""
    Hinv = jnp.linalg.inv(H)
    fwd = jnp.sum((_apply_h(H, pa) - pb) ** 2, axis=-1)
    bwd = jnp.sum((_apply_h(Hinv, pb) - pa) ** 2, axis=-1)
    return fwd + bwd


def ransac_homography(key: jax.Array, pa: jnp.ndarray, pb: jnp.ndarray,
                      valid: jnp.ndarray, cfg: RansacConfig) -> TwoViewEstimate:
    """Batched-hypothesis RANSAC homography (4-point minimal samples)."""
    return ransac(
        key, pa, pb, valid,
        solve_fn=fit_homography,
        error_fn=symmetric_transfer_error,
        sample_size=4,
        cfg=cfg,
        refit_fn=fit_homography,
    )


def decompose_homography(H: jnp.ndarray, na: jnp.ndarray, nb: jnp.ndarray,
                         weights: jnp.ndarray):
    """Faugeras decomposition of a *calibrated* homography into (R, t, n).

    H relates normalized coordinates: x_b ~ H x_a for points on a plane
    n^T X = d (camera-A frame); H = R + t n^T / d. Eight candidate
    (R, t, n) triples arise from the SVD construction; the winner is picked
    by cheirality (triangulated points in front of both cameras) — the same
    masked-reduction pattern as `decompose_essential`, so the whole
    function jits and runs branch-free.

    Returns (R (3,3), t (3,) |t|=1 (or 0 for pure rotation), n (3,),
    num_good (int32)).
    """
    from sift_tpu.geometry.triangulation import triangulate_dlt

    U, D, Vt = jnp.linalg.svd(H)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = D[0], D[1], D[2]

    eps = 1e-9
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) /
                              jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) /
                              jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))

    # Case d'2 > 0 (translation "across" the plane normal).
    sin_t = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3),
                                 0.0)) / jnp.maximum((d1 + d3) * d2, eps)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    # Case d'2 < 0 (reflection branch).
    sin_p = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3),
                                 0.0)) / jnp.maximum(jnp.abs(d1 - d3) * d2, eps)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum(jnp.abs(d1 - d3) * d2, eps)

    Rs, ts, ns = [], [], []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            st = e1 * e3 * sin_t
            Rp = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                              [0.0, 0.0, 1.0]])
            Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-st)
            Rp = Rp.at[2, 0].set(st).at[2, 2].set(cos_t)
            tp = (d1 - d3) * jnp.asarray([e1 * x1, 0.0, -e3 * x3])
            np_ = jnp.asarray([e1 * x1, 0.0, e3 * x3])
            Rs.append(s * U @ Rp @ Vt)
            ts.append(U @ tp)
            ns.append(V @ np_)

            sp = e1 * e3 * sin_p
            Rn = jnp.zeros((3, 3))
            Rn = Rn.at[0, 0].set(cos_p).at[0, 2].set(sp)
            Rn = Rn.at[1, 1].set(-1.0)
            Rn = Rn.at[2, 0].set(sp).at[2, 2].set(-cos_p)
            tn = (d1 + d3) * jnp.asarray([e1 * x1, 0.0, e3 * x3])
            Rs.append(s * U @ Rn @ Vt)
            ts.append(U @ tn)
            ns.append(V @ np_)

    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    ns = jnp.stack(ns)
    norms = jnp.linalg.norm(ts, axis=-1, keepdims=True)
    ts = ts / jnp.maximum(norms, eps)

    def count_good(R, t):
        P1 = jnp.concatenate([jnp.eye(3, dtype=H.dtype),
                              jnp.zeros((3, 1), H.dtype)], axis=1)
        P2 = jnp.concatenate([R, t[:, None]], axis=1)
        X = triangulate_dlt(P1, P2, na, nb)
        za = X[:, 2]
        zb = (X @ R.T + t)[:, 2]
        return jnp.sum(jnp.where(weights > 0, (za > 0) & (zb > 0), False))

    counts = jax.vmap(count_good)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], ns[best], counts[best].astype(jnp.int32)
