"""Sim(3) Lie group operations (rotation + translation + scale).

Monocular SLAM accumulates SCALE drift as well as pose drift; closing a
loop therefore needs the 7-dof similarity group: correcting only SE(3)
leaves the map fighting a scale step at the seam (Strasdat et al., "Scale
Drift-Aware Large Scale Monocular SLAM", RSS 2010 — the standard
treatment; formulas below follow the Sophus library's Sim(3)).

Tangent layout: xi = (omega (3), v (3), sigma (1)) — the first six
components coincide with `lie.py`'s se(3) layout, and sigma = 0 reduces
every map here to its SE(3) counterpart (tested).

Group action: x -> s R x + t. Composition
(s1,R1,t1) o (s2,R2,t2) = (s1 s2, R1 R2, s1 R1 t2 + t1).

All maps are branch-free (jnp.where with Taylor guards) and batched over
leading axes, like `lie.py`.
"""

from __future__ import annotations

import jax.numpy as jnp

from sift_tpu.geometry import lie

_EPS = 1e-6


def _calc_w(omega: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) 'W' matrix: exp translation = W v (Sophus calc_W).

    W = C I + A hat(omega) + B hat(omega)^2, with A, B, C functions of
    theta = |omega| and sigma, each with small-theta / small-sigma Taylor
    fallbacks so every branch is finite (and differentiable) everywhere.
    """
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    s = jnp.exp(sigma)

    small_t = theta2 < _EPS
    small_s = jnp.abs(sigma) < _EPS
    # guarded denominators
    sig = jnp.where(small_s, 1.0, sigma)
    th = jnp.where(small_t, 1.0, theta)
    th2 = th * th

    # sigma ~ 0 branch
    A_s0 = jnp.where(small_t, 0.5 - theta2 / 24.0,
                     (1.0 - jnp.cos(th)) / th2)
    B_s0 = jnp.where(small_t, 1.0 / 6.0 - theta2 / 120.0,
                     (th - jnp.sin(th)) / (th2 * th))
    C_s0 = jnp.ones_like(sigma)

    # generic sigma
    C_g = (s - 1.0) / sig
    # theta ~ 0 sub-branch
    A_t0 = ((sig - 1.0) * s + 1.0) / (sig * sig)
    B_t0 = ((0.5 * sig * sig - sig + 1.0) * s - 1.0) / (sig * sig * sig)
    # generic theta
    a = s * jnp.sin(th)
    b = s * jnp.cos(th)
    c = th2 + sig * sig
    A_g = (a * sig + (1.0 - b) * th) / (th * c)
    B_g = (C_g - ((b - 1.0) * sig + a * th) / c) / th2

    A = jnp.where(small_s, A_s0, jnp.where(small_t, A_t0, A_g))
    B = jnp.where(small_s, B_s0, jnp.where(small_t, B_t0, B_g))
    C = jnp.where(small_s, C_s0, C_g)

    W = lie.hat(omega)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return (C[..., None, None] * eye + A[..., None, None] * W
            + B[..., None, None] * W2)


def sim3_exp(xi: jnp.ndarray):
    """(..., 7) tangent -> (s (...,), R (..., 3, 3), t (..., 3))."""
    omega, v, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = lie.so3_exp(omega)
    t = (_calc_w(omega, sigma) @ v[..., None])[..., 0]
    return s, R, t


def sim3_log(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(s, R, t) -> (..., 7) tangent."""
    sigma = jnp.log(s)
    omega = lie.so3_log(R)
    W = _calc_w(omega, sigma)
    v = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([omega, v, sigma[..., None]], axis=-1)


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    inv_s = 1.0 / s
    return inv_s, Rt, -(inv_s[..., None] * (Rt @ t[..., None])[..., 0])


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    return (sa * sb, Ra @ Rb,
            sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta)


def sim3_transform(s, R, t, x):
    """Apply the similarity to points x (..., 3): s R x + t."""
    return s[..., None] * (R @ x[..., None])[..., 0] + t


def boxplus(xi: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Right-perturbation retraction on Sim(3)."""
    s1, R1, t1 = sim3_exp(xi)
    s2, R2, t2 = sim3_exp(delta)
    return sim3_log(*sim3_compose(s1, R1, t1, s2, R2, t2))


def from_se3(xi6: jnp.ndarray) -> jnp.ndarray:
    """se(3) tangent -> Sim(3) tangent with sigma = 0.

    NOTE: this embeds the TANGENT coordinates, which is exact because the
    Sim(3) exponential at sigma = 0 reduces to the SE(3) exponential
    (W |_{sigma=0} is the SE(3) left Jacobian)."""
    return jnp.concatenate(
        [xi6, jnp.zeros(xi6.shape[:-1] + (1,), xi6.dtype)], axis=-1)


def umeyama_alignment(src: jnp.ndarray, dst: jnp.ndarray,
                      weights: jnp.ndarray):
    """Weighted Umeyama: similarity (s, R, t) minimizing
    sum w |s R src + t - dst|^2. src/dst (N, 3); weights (N,) >= 0.

    Used at loop closure to estimate the accumulated scale drift from
    duplicate-landmark 3D-3D correspondences."""
    w = jnp.maximum(weights, 0.0)
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    mu_s = jnp.sum(w[:, None] * src, axis=0) / wsum
    mu_d = jnp.sum(w[:, None] * dst, axis=0) / wsum
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc / wsum               # (3, 3)
    U, D, Vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], cov.dtype).at[2].set(sgn))
    R = U @ S @ Vt
    var_s = jnp.sum(w[:, None] * sc * sc) / wsum
    s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_s, _EPS)
    t = mu_d - s * (R @ mu_s)
    return s, R, t
