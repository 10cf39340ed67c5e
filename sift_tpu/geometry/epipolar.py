"""Epipolar geometry: 8-point fundamental/essential + RANSAC + decomposition.

Conventions: for a correspondence (xa in view A, xb in view B),
``xb_h^T F xa_h = 0``. The essential matrix relates *normalized* coordinates
(pixels premultiplied by K^-1) the same way: E = [t]x R with
``x_b = R x_a + t`` mapping camera-A-frame points into camera B's frame —
i.e. (R, t) is the camera-B-from-camera-A rigid transform.

Like the homography module, one weighted fit serves minimal samples and
refits; rank-2 (and for E, equal-singular-value) projection uses a batched
3x3 SVD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sift_tpu.config import RansacConfig
from sift_tpu.geometry.ransac import ransac
from sift_tpu.geometry.homography import _normalization, _apply_h
from sift_tpu.geometry.triangulation import triangulate_dlt
from sift_tpu.geometry import lie
from sift_tpu.types import TwoViewEstimate

_EPS = 1e-12


def _epipolar_rows(na: jnp.ndarray, nb: jnp.ndarray) -> jnp.ndarray:
    """DLT rows for xb^T F xa = 0: (N, 9)."""
    x, y = na[:, 0], na[:, 1]
    u, v = nb[:, 0], nb[:, 1]
    one = jnp.ones_like(x)
    return jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, one], -1)


def fit_fundamental_8pt(pa: jnp.ndarray, pb: jnp.ndarray,
                        weights: jnp.ndarray | None = None,
                        essential: bool = False) -> jnp.ndarray:
    """Weighted normalized 8-point fit of F (or E if `essential`).

    pa/pb: (N, 2) (pixels for F, normalized coords for E); weights: (N,).
    """
    n = pa.shape[0]
    w = jnp.ones((n,), pa.dtype) if weights is None else weights

    Ta = _normalization(pa, w)
    Tb = _normalization(pb, w)
    na = _apply_h(Ta, pa)
    nb = _apply_h(Tb, pb)

    A = _epipolar_rows(na, nb) * w[:, None]
    M = A.T @ A
    _, vecs = jnp.linalg.eigh(M)
    F = vecs[:, 0].reshape(3, 3)

    # Project to the model manifold: rank 2 (F), or (s, s, 0) (E).
    U, S, Vt = jnp.linalg.svd(F)
    if essential:
        s = (S[0] + S[1]) * 0.5
        S_proj = jnp.asarray([1.0, 1.0, 0.0], F.dtype) * s
    else:
        S_proj = S * jnp.asarray([1.0, 1.0, 0.0], F.dtype)
    F = U @ jnp.diag(S_proj) @ Vt

    F = Tb.T @ F @ Ta                      # denormalize
    norm = jnp.linalg.norm(F)
    return F / jnp.where(norm < _EPS, _EPS, norm)


def sampson_error(F: jnp.ndarray, pa: jnp.ndarray,
                  pb: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) squared error per correspondence."""
    pa_h = jnp.concatenate([pa, jnp.ones_like(pa[..., :1])], -1)
    pb_h = jnp.concatenate([pb, jnp.ones_like(pb[..., :1])], -1)
    Fa = pa_h @ F.T          # (N, 3) = F xa
    Ftb = pb_h @ F           # (N, 3) = F^T xb
    num = jnp.sum(pb_h * Fa, axis=-1) ** 2
    den = Fa[..., 0] ** 2 + Fa[..., 1] ** 2 + Ftb[..., 0] ** 2 + Ftb[..., 1] ** 2
    return num / jnp.maximum(den, _EPS)


def ransac_fundamental(key: jax.Array, pa: jnp.ndarray, pb: jnp.ndarray,
                       valid: jnp.ndarray, cfg: RansacConfig) -> TwoViewEstimate:
    """RANSAC fundamental matrix from pixel correspondences."""
    return ransac(
        key, pa, pb, valid,
        solve_fn=lambda a, b: fit_fundamental_8pt(a, b),
        error_fn=sampson_error,
        sample_size=8,
        cfg=cfg,
        refit_fn=lambda a, b, w: fit_fundamental_8pt(a, b, w),
    )


def ransac_essential(key: jax.Array, na: jnp.ndarray, nb: jnp.ndarray,
                     valid: jnp.ndarray, cfg: RansacConfig,
                     focal: float = 1.0) -> TwoViewEstimate:
    """RANSAC essential matrix from *normalized* correspondences.

    `cfg.inlier_threshold` is interpreted in pixels; `focal` converts it to
    the normalized-coordinate scale (threshold_norm = threshold_px / focal).
    """
    cfg_norm = cfg.replace(inlier_threshold=cfg.inlier_threshold / focal)
    return ransac(
        key, na, nb, valid,
        solve_fn=lambda a, b: fit_fundamental_8pt(a, b, essential=True),
        error_fn=sampson_error,
        sample_size=8,
        cfg=cfg_norm,
        refit_fn=lambda a, b, w: fit_fundamental_8pt(a, b, w, essential=True),
    )


def decompose_essential(E: jnp.ndarray, na: jnp.ndarray, nb: jnp.ndarray,
                        weights: jnp.ndarray):
    """Recover the camera-B-from-camera-A pose (R, t) from E by cheirality.

    Tests the four (R, t) candidates by triangulating all weighted
    correspondences and counting points in front of both cameras — a masked
    reduction over a fixed (4, N) tensor, no branching.

    Returns (R (3,3), t (3,), num_good (int32)); |t| = 1 (scale is
    unobservable from E).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Ensure proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0],
                     [1.0, 0.0, 0.0],
                     [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]

    Rs = jnp.stack([R1, R1, R2, R2])            # (4, 3, 3)
    ts = jnp.stack([t, -t, t, -t])              # (4, 3)

    def count_good(R, t):
        # Camera A at identity; camera B projects x_b = R x_a + t.
        P1 = jnp.concatenate([jnp.eye(3, dtype=E.dtype),
                              jnp.zeros((3, 1), E.dtype)], axis=1)
        P2 = jnp.concatenate([R, t[:, None]], axis=1)
        X = triangulate_dlt(P1, P2, na, nb)     # (N, 3) in camera-A frame
        za = X[:, 2]
        zb = (X @ R.T + t)[:, 2]
        good = (za > 0) & (zb > 0)
        return jnp.sum(jnp.where(weights > 0, good, False))

    counts = jax.vmap(count_good)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], counts[best].astype(jnp.int32)


def relative_pose_from_essential(E, na, nb, weights):
    """(R, t) as a 6-dof se(3) tangent (camera-B-from-camera-A)."""
    R, t, n = decompose_essential(E, na, nb, weights)
    return lie.se3_log(R, t), n


def _tangent_basis(t: jnp.ndarray) -> jnp.ndarray:
    """(3, 2) orthonormal basis of the plane orthogonal to unit vector t."""
    k = jnp.argmin(jnp.abs(t))
    e = jax.nn.one_hot(k, 3, dtype=t.dtype)
    b1 = jnp.cross(t, e)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), _EPS)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=-1)


def _sampson_residuals(E, na, nb):
    """Signed first-order geometric residuals (N,)."""
    na_h = jnp.concatenate([na, jnp.ones_like(na[..., :1])], -1)
    nb_h = jnp.concatenate([nb, jnp.ones_like(nb[..., :1])], -1)
    Ea = na_h @ E.T
    Etb = nb_h @ E
    num = jnp.sum(nb_h * Ea, axis=-1)
    den = Ea[..., 0] ** 2 + Ea[..., 1] ** 2 + Etb[..., 0] ** 2 + Etb[..., 1] ** 2
    return num / jnp.sqrt(jnp.maximum(den, _EPS))


def refine_relative_pose(R0: jnp.ndarray, t0: jnp.ndarray,
                         na: jnp.ndarray, nb: jnp.ndarray,
                         weights: jnp.ndarray, iters: int = 10,
                         damping: float = 1e-8):
    """Gauss-Newton refinement of (R, t) on weighted Sampson error.

    The linear 8-point fit saturates at float32 eigensolver accuracy
    (~1e-4 relative); production accuracy comes from this 5-dof nonlinear
    polish (3 rotation + 2 translation-direction parameters — the epipolar
    scale is unobservable). Fixed iteration count, fixed shapes; Jacobians
    via `jax.jacfwd` over a 5-vector, so each step is one (N, 5) linearization
    and a 5x5 solve.
    """
    sw = jnp.sqrt(jnp.maximum(weights, 0.0))

    def residuals(params, R_base, t_base, B):
        R = lie.so3_exp(params[:3]) @ R_base
        t = t_base + B @ params[3:]
        t = t / jnp.maximum(jnp.linalg.norm(t), _EPS)
        E = lie.hat(t) @ R
        return _sampson_residuals(E, na, nb) * sw

    def step(carry, _):
        R, t = carry
        B = _tangent_basis(t)
        zero = jnp.zeros((5,), R.dtype)
        r = residuals(zero, R, t, B)
        J = jax.jacfwd(residuals)(zero, R, t, B)      # (N, 5)
        H = J.T @ J + damping * jnp.eye(5, dtype=R.dtype)
        delta = -jnp.linalg.solve(H, J.T @ r)
        R_new = lie.so3_exp(delta[:3]) @ R
        t_new = t + B @ delta[3:]
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new), _EPS)
        # Keep the update only if it reduces the cost (damped-GN safeguard).
        B2 = _tangent_basis(t_new)
        better = jnp.sum(residuals(jnp.zeros((5,), R.dtype), R_new, t_new, B2) ** 2) \
            < jnp.sum(r ** 2)
        R = jnp.where(better, R_new, R)
        t = jnp.where(better, t_new, t)
        return (R, t), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=iters)
    return R, t


def estimate_relative_pose(key, na, nb, valid, cfg: RansacConfig,
                           focal: float = 1.0, refine_iters: int = 10):
    """RANSAC essential -> cheirality decomposition -> Gauss-Newton polish.

    Returns (R, t, TwoViewEstimate) with (R, t) the camera-B-from-camera-A
    pose, |t| = 1.
    """
    est = ransac_essential(key, na, nb, valid, cfg, focal=focal)
    w = est.inliers.astype(na.dtype)
    R0, t0, _ = decompose_essential(est.model, na, nb, w)
    R, t = refine_relative_pose(R0, t0, na, nb, w, iters=refine_iters)
    return R, t, est
