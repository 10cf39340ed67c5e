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


# ----------------------------------------------------------- 5-point solver
#
# Minimal essential-matrix solver from 5 correspondences (Nister's problem),
# formulated for an accelerator: the classic solvers finish with the
# eigenvalues of a nonsymmetric 10x10 action/companion matrix, which XLA has
# no TPU kernel for (jnp.linalg.eig is CPU-only). Instead we use the
# hidden-variable resultant:
#
#   E = x E1 + y E2 + z E3 + E4          (4-dim null space of the 5 epipolar
#                                         constraints; w normalized to 1)
#   det(E) = 0, 2 E E^T E - tr(E E^T) E = 0   -> 10 cubic equations.
#
# Grouped by the 10 (x, y)-monomials [x^3, x^2 y, x y^2, y^3, x^2, x y,
# y^2, x, y, 1], the system is A(z) m(x, y) = 0 with A(z) a 10x10 matrix
# polynomial in z (degree <= 3). A solution exists iff det A(z) = 0 — a
# degree-10 polynomial whose real roots we isolate by SIGN CHANGES of
# det A(z) on a fixed tan-spaced grid and refine with fixed-count bisection:
# every step is a batched 10x10 determinant (LU), fully vmappable, no
# data-dependent shapes. Each root's (x, y) comes from the null vector of
# A(z*). Solutions with w = 0 (E4 coefficient vanishing) and roots beyond
# the grid range are lost — both are measure-zero cases RANSAC absorbs.


def _null_basis_4(na: jnp.ndarray, nb: jnp.ndarray):
    """(5,2)x(5,2) -> four (3,3) basis matrices of the constraint nullspace."""
    A = _epipolar_rows(na, nb)              # (5, 9)
    M = A.T @ A
    _, vecs = jnp.linalg.eigh(M)            # ascending eigenvalues
    return [vecs[:, i].reshape(3, 3) for i in range(4)]


def _poly_mul(p: dict, q: dict) -> dict:
    out = {}
    for e1, c1 in p.items():
        for e2, c2 in q.items():
            e = (e1[0] + e2[0], e1[1] + e2[1], e1[2] + e2[2])
            out[e] = out.get(e, 0.0) + c1 * c2
    return out


def _poly_add(p: dict, q: dict, qs: float = 1.0) -> dict:
    out = dict(p)
    for e, c in q.items():
        out[e] = out.get(e, 0.0) + qs * c
    return out


_XY_MONOMIALS = [(3, 0), (2, 1), (1, 2), (0, 3), (2, 0), (1, 1), (0, 2),
                 (1, 0), (0, 1), (0, 0)]


def _constraint_tensor(E1, E2, E3, E4):
    """(10 eq, 10 xy-monomial, 4 z-power) coefficient tensor of the cubic
    constraint system. Built by trace-time polynomial arithmetic over the
    exponent dictionary representation — hundreds of scalar ops that XLA
    fuses (and that vmap over hypotheses batches into (H,) lanes)."""
    # E entries as polynomials in (x, y, z).
    Ep = [[{(1, 0, 0): E1[i, j], (0, 1, 0): E2[i, j],
            (0, 0, 1): E3[i, j], (0, 0, 0): E4[i, j]}
           for j in range(3)] for i in range(3)]

    # det(E): sum over permutations.
    def mul3(a, b, c):
        return _poly_mul(_poly_mul(a, b), c)

    det = {}
    for (p0, p1, p2), s in ((((0, 1, 2)), 1), (((1, 2, 0)), 1),
                            (((2, 0, 1)), 1), (((2, 1, 0)), -1),
                            (((1, 0, 2)), -1), (((0, 2, 1)), -1)):
        det = _poly_add(det, mul3(Ep[0][p0], Ep[1][p1], Ep[2][p2]), s)

    # P = E E^T (degree 2), Q = P E (degree 3), tr(P) (degree 2).
    P = [[{} for _ in range(3)] for _ in range(3)]
    for i in range(3):
        for j in range(3):
            for k in range(3):
                P[i][j] = _poly_add(P[i][j], _poly_mul(Ep[i][k], Ep[j][k]))
    trP = _poly_add(_poly_add(P[0][0], P[1][1]), P[2][2])
    eqs = [det]
    for i in range(3):
        for j in range(3):
            q = {}
            for k in range(3):
                q = _poly_add(q, _poly_mul(P[i][k], Ep[k][j]))
            eq = _poly_add({e: 2.0 * c for e, c in q.items()},
                           _poly_mul(trP, Ep[i][j]), -1.0)
            eqs.append(eq)

    zeros = jnp.zeros_like(E1[0, 0])
    rows = []
    for eq in eqs:
        row = []
        for (a, b) in _XY_MONOMIALS:
            zc = [eq.get((a, b, c), zeros) + zeros for c in range(4)]
            row.append(jnp.stack(zc))
        rows.append(jnp.stack(row))
    return jnp.stack(rows)                  # (10, 10, 4)


def _detA_signs(C, z):
    """Row-normalized det A(z) for a (G,) batch of z values -> (G,)."""
    zp = jnp.stack([jnp.ones_like(z), z, z * z, z * z * z], -1)   # (G, 4)
    A = jnp.einsum("ijc,gc->gij", C, zp)                          # (G, 10, 10)
    # Positive row scaling keeps the determinant's sign and tames the
    # z^3-per-row growth that would overflow float32.
    norm = jnp.linalg.norm(A, axis=-1, keepdims=True)
    A = A / jnp.maximum(norm, _EPS)
    return jnp.linalg.det(A)


_GRID = 128
_MAX_ROOTS = 10
_BISECT = 40


def fit_essential_5pt(na: jnp.ndarray, nb: jnp.ndarray):
    """Minimal 5-point solver: (5,2)x(5,2) normalized correspondences ->
    ((10, 3, 3) essential candidates, (10,) validity mask).

    Cites SURVEY.md §2.2 ("batched minimal solvers (8-pt/5-pt)"); see the
    module-level solver comment for the accelerator-native formulation.
    """
    E1, E2, E3, E4 = _null_basis_4(na, nb)
    C = _constraint_tensor(E1, E2, E3, E4)

    theta = jnp.linspace(-jnp.pi / 2 + 0.02, jnp.pi / 2 - 0.02, _GRID)
    zg = jnp.tan(theta)
    s = _detA_signs(C, zg)

    flips = s[:-1] * s[1:] < 0                       # (G-1,)
    # Up to _MAX_ROOTS bracketing intervals, earliest-first.
    score = jnp.where(flips, -jnp.arange(_GRID - 1, dtype=jnp.float32),
                      -jnp.inf)
    top, idx = jax.lax.top_k(score, _MAX_ROOTS)
    has_root = jnp.isfinite(top)
    lo = zg[idx]
    hi = zg[jnp.minimum(idx + 1, _GRID - 1)]
    s_lo = s[idx]

    def bisect(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        s_mid = _detA_signs(C, mid)
        left = s_lo * s_mid > 0          # root is in the right half
        lo = jnp.where(left, mid, lo)
        hi = jnp.where(left, hi, mid)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(bisect, (lo, hi), None, length=_BISECT)
    roots = 0.5 * (lo + hi)                          # (10,)

    # Null vector of A(z*) -> monomial vector -> (x, y).
    zp = jnp.stack([jnp.ones_like(roots), roots, roots ** 2, roots ** 3], -1)
    A = jnp.einsum("ijc,rc->rij", C, zp)             # (10, 10, 10)
    M = jnp.einsum("rki,rkj->rij", A, A)
    _, vecs = jnp.linalg.eigh(M)
    m = vecs[..., 0]                                 # (10, 10) null monomials
    w0 = m[:, 9]                                     # coefficient of "1"
    ok = has_root & (jnp.abs(w0) > 1e-8 * jnp.linalg.norm(m, axis=-1))
    safe = jnp.where(jnp.abs(w0) < _EPS, _EPS, w0)
    x = m[:, 7] / safe
    y = m[:, 8] / safe

    E = (x[:, None, None] * E1 + y[:, None, None] * E2
         + roots[:, None, None] * E3 + E4)
    nrm = jnp.linalg.norm(E, axis=(-2, -1), keepdims=True)
    E = E / jnp.maximum(nrm, _EPS)
    return E, ok


def ransac_essential_5pt(key: jax.Array, na: jnp.ndarray, nb: jnp.ndarray,
                         valid: jnp.ndarray, cfg: RansacConfig,
                         focal: float = 1.0) -> TwoViewEstimate:
    """RANSAC with the minimal 5-point solver (multi-root hypotheses).

    Each 5-correspondence sample yields up to 10 essential candidates; all
    `num_hypotheses x 10` are scored together, and the winner is refit on
    its inliers with the weighted 8-point (standard practice: the minimal
    solver buys sample efficiency and planar robustness, the linear refit
    polishes on the consensus set).
    """
    from sift_tpu.geometry.ransac import sample_minimal_sets

    cfg_norm = cfg.replace(inlier_threshold=cfg.inlier_threshold / focal)
    idx = sample_minimal_sets(key, valid, cfg.num_hypotheses, 5)
    sa, sb = na[idx], nb[idx]                        # (H, 5, 2)

    models, ok = jax.vmap(fit_essential_5pt)(sa, sb)  # (H,10,3,3), (H,10)
    models = models.reshape(-1, 3, 3)
    ok = ok.reshape(-1)

    errors = jax.vmap(lambda m: sampson_error(m, na, nb))(models)
    thresh2 = cfg_norm.inlier_threshold ** 2
    inlier_mask = (errors < thresh2) & valid[None, :] & ok[:, None]
    counts = jnp.sum(inlier_mask, axis=-1)
    err_sum = jnp.sum(jnp.where(inlier_mask, errors, 0.0), axis=-1)
    order = counts.astype(jnp.float32) - err_sum / (err_sum.max() + 1.0)
    best = jnp.argmax(order)

    model = models[best]
    inliers = inlier_mask[best]
    num_inliers = counts[best]

    if cfg.refit:
        refit_model = fit_fundamental_8pt(na, nb, inliers.astype(na.dtype),
                                          essential=True)
        refit_err = sampson_error(refit_model, na, nb)
        refit_inliers = (refit_err < thresh2) & valid
        refit_count = jnp.sum(refit_inliers)
        better = refit_count >= num_inliers
        model = jnp.where(better, refit_model, model)
        inliers = jnp.where(better, refit_inliers, inliers)
        num_inliers = jnp.where(better, refit_count, num_inliers)

    return TwoViewEstimate(
        model=model, inliers=inliers,
        num_inliers=num_inliers.astype(jnp.int32),
        success=num_inliers >= cfg.min_inliers,
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

    The RANSAC stage uses the solver named by `cfg.essential_solver`:
    "5pt" (minimal Nister-style, default — smaller samples survive higher
    outlier rates and planar scenes do not collapse the fit) or "8pt"
    (linear normalized fit).

    Returns (R, t, TwoViewEstimate) with (R, t) the camera-B-from-camera-A
    pose, |t| = 1.
    """
    if cfg.essential_solver == "5pt":
        est = ransac_essential_5pt(key, na, nb, valid, cfg, focal=focal)
    else:
        est = ransac_essential(key, na, nb, valid, cfg, focal=focal)
    w = est.inliers.astype(na.dtype)
    R0, t0, _ = decompose_essential(est.model, na, nb, w)
    R, t = refine_relative_pose(R0, t0, na, nb, w, iters=refine_iters)
    return R, t, est
