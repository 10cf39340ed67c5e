"""SO(3) / SE(3) Lie group operations.

Used by two-view pose recovery, triangulation, bundle adjustment, and
pose-graph optimization. All functions are elementwise-batched (leading axes
broadcast), branch-free (small-angle handling via `jnp.where` on Taylor
expansions, never Python conditionals), and differentiable — BA Jacobians
come from `jax.jacfwd`/custom linearization over these maps.

Conventions:
  * rotations act on column vectors: x_world = R @ x_cam + t for a
    world-from-camera pose.
  * se(3) tangent vectors are (omega, v) — rotation first, translation
    second — with the *left* trivialization: exp([w, v]) = [exp(w^), V(w) v].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat map: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def _sinc_cos_terms(theta2: jnp.ndarray):
    """Branch-free (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3) with Taylor fallbacks."""
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    return a, b, c


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    W2 = W @ W
    a, b, _ = _sinc_cos_terms(theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 3) axis-angle (theta in [0, pi]).

    Differentiable everywhere the log is (jacfwd-safe): theta comes from
    atan2(|skew|, cos) — never arccos, whose derivative blows up at
    theta = 0, the *common* case (zero-residual edges in pose graphs). Each
    `jnp.where` branch is computed from guarded inputs so no branch's
    primal or tangent is NaN at another branch's operating point.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_skew = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5   # = sin(theta) * axis

    s2 = jnp.sum(w_skew * w_skew, axis=-1)            # sin(theta)^2
    small = (s2 < 1e-10) & (cos_t > 0.0)
    safe_s2 = jnp.where(small, 1.0, s2)
    sin_t = jnp.sqrt(safe_s2)
    theta = jnp.arctan2(sin_t, cos_t)
    generic = (theta / sin_t)[..., None] * w_skew
    # theta/sin(theta) ~ 1 + theta^2/6, theta^2 ~ s2 for small angles.
    small_branch = (1.0 + s2 / 6.0)[..., None] * w_skew
    generic = jnp.where(small[..., None], small_branch, generic)

    # Near theta = pi, sin(theta) -> 0: recover the axis from the symmetric
    # part. R = cos t I + sin t [n]x + (1 - cos t) nn^T, so
    # (R + R^T)/2 - cos t I = (1 - cos t) nn^T; the row of nn^T with the
    # largest diagonal entry is n_k * n with the largest |n_k| (best
    # conditioned). Branch-free row pick via one-hot matmul.
    near_pi = theta > 3.0
    S = (R + jnp.swapaxes(R, -1, -2)) * 0.5
    nnT = (S - cos_t[..., None, None] * jnp.eye(3, dtype=R.dtype)) / \
        jnp.maximum(1.0 - cos_t[..., None, None], _EPS)
    diag = jnp.stack([nnT[..., 0, 0], nnT[..., 1, 1], nnT[..., 2, 2]], -1)
    k = jnp.argmax(diag, axis=-1)
    row = jnp.sum(nnT * jax.nn.one_hot(k, 3, dtype=R.dtype)[..., None], axis=-2)
    axis = row / jnp.sqrt(jnp.maximum(
        jnp.sum(row * row, axis=-1, keepdims=True), _EPS * _EPS))
    # Align the sign with the skew part (sin t > 0 for t < pi); at exactly
    # pi both signs are equivalent.
    dot = jnp.sum(axis * w_skew, axis=-1, keepdims=True)
    axis = axis * jnp.where(dot < 0, -1.0, 1.0)
    # Tangent-safe theta for this branch (s2 -> 0 at pi; the +tiny keeps the
    # sqrt's derivative finite, and d s2 -> 0 there anyway).
    theta_pi = jnp.arctan2(jnp.sqrt(s2 + 1e-20), cos_t)
    pi_branch = theta_pi[..., None] * axis

    return jnp.where(near_pi[..., None], pi_branch, generic)


def _left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V(w): exp([w, v]) translation = V(w) v."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    W2 = W @ W
    _, b, c = _sinc_cos_terms(theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b * W + c * W2


def _left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.sin(half_theta)) / theta2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term * W2


def se3_exp(xi: jnp.ndarray):
    """(..., 6) tangent (omega, v) -> (R (..., 3, 3), t (..., 3))."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = (_left_jacobian(w) @ v[..., None])[..., 0]
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> (..., 6) tangent (omega, v)."""
    w = so3_log(R)
    v = (_left_jacobian_inv(w) @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def se3_matrix(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 4, 4) homogeneous transform."""
    R, t = se3_exp(xi)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], xi.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(R: jnp.ndarray, t: jnp.ndarray):
    """Inverse of (R, t): (R^T, -R^T t)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_compose(Ra, ta, Rb, tb):
    """(Ra, ta) o (Rb, tb): first apply b, then a."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def transform(R: jnp.ndarray, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply (R, t) to points x (..., 3)."""
    return (R @ x[..., None])[..., 0] + t


def boxplus(xi: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Right-perturbation retraction: log(exp(xi) o exp(delta)).

    Optimizers linearize residuals wrt a *local* delta at 0 and retract with
    this map — the global tangent chart's singularity at rotation angle pi
    never enters the linearization (deltas are always small).
    """
    R1, t1 = se3_exp(xi)
    R2, t2 = se3_exp(delta)
    R, t = se3_compose(R1, t1, R2, t2)
    return se3_log(R, t)
