"""Pose-only optimization: refine one camera against fixed landmarks.

The tracking step of incremental SfM (frame-to-map localization): given
2D-3D correspondences, Gauss-Newton on the 6-dof pose with Cauchy IRLS
weights. Fixed iteration count, manifold (right-perturbation) updates —
one 6x6 solve per iteration, so it vmaps cheaply over a batch of frames.

Also provides a batched-hypothesis P3P-style RANSAC replacement: because a
minimal P3P solver is quartic and branchy, we instead run the same GN from
a few perturbed initializations seeded by Gumbel-sampled minimal subsets
and keep the hypothesis with most inliers — the accelerator-native shape
(fixed batch + argmax) from SURVEY.md §7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sift_tpu.geometry import lie

_EPS = 1e-12


def _project_rt(R, t, intrinsics, X):
    """World-from-camera (R, t); X (..., 3) world -> pixel uv, depth."""
    x_c = (X - t) @ R          # == (R^T (X - t)) batched over leading axes
    z = x_c[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    uv = jnp.stack([fx * x_c[..., 0] * inv_z + cx,
                    fy * x_c[..., 1] * inv_z + cy], -1)
    return uv, z


def pose_only_refine(pose: jnp.ndarray, intrinsics: jnp.ndarray,
                     landmarks: jnp.ndarray, uv: jnp.ndarray,
                     valid: jnp.ndarray,
                     iters: int = 10, delta: float = 2.0,
                     damping: float = 1e-4):
    """Refine a single (6,) se(3) pose on K fixed 2D-3D correspondences.

    Returns (pose, inlier_mask, rmse) where inliers are residuals < 3*delta.
    """
    def residuals(d, pose_base):
        R0, t0 = lie.se3_exp(pose_base)
        R, t = lie.se3_compose(R0, t0, *lie.se3_exp(d))
        pred, z = _project_rt(R, t, intrinsics, landmarks)
        r = pred - uv
        ok = valid & (z > 1e-6)
        return r, ok

    def step(carry, _):
        pose_c, lam = carry
        zero = jnp.zeros((6,), pose_c.dtype)
        r, ok = residuals(zero, pose_c)
        n2 = jnp.sum(r * r, -1)
        w = jnp.where(ok, 1.0 / (1.0 + n2 / (delta * delta)), 0.0)
        J = jax.jacfwd(lambda d: residuals(d, pose_c)[0])(zero)   # (K, 2, 6)
        Jw = J * w[:, None, None]
        H = jnp.einsum("kij,kil->jl", Jw, J) + lam * jnp.eye(6, dtype=J.dtype)
        g = jnp.einsum("kij,ki->j", Jw, r)
        d = -jnp.linalg.solve(H, g)
        pose_new = lie.boxplus(pose_c, d)
        # Accept only if weighted cost decreases. Points that lose
        # cheirality at the new pose keep their *old* residual in c_new
        # (rather than dropping out) so a step that pushes points behind
        # the camera earns no spurious cost decrease.
        r2, ok2 = residuals(zero, pose_new)
        n2_new = jnp.sum(r2 * r2, -1)
        c_old = jnp.sum(w * n2)
        c_new = jnp.sum(w * jnp.where(ok2, n2_new, n2))
        accept = c_new < c_old
        pose_c = jnp.where(accept, pose_new, pose_c)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (pose_c, lam), None

    (pose, _), _ = lax.scan(step, (pose, jnp.asarray(damping, pose.dtype)),
                            None, length=iters)

    r, ok = residuals(jnp.zeros((6,), pose.dtype), pose)
    n2 = jnp.sum(r * r, -1)
    inliers = ok & (n2 < (3.0 * delta) ** 2)
    cnt = jnp.maximum(jnp.sum(inliers), 1)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inliers, n2, 0.0)) / cnt)
    return pose, inliers, rmse


def pose_ransac_refine(key: jax.Array, pose_init: jnp.ndarray,
                       intrinsics: jnp.ndarray,
                       landmarks: jnp.ndarray, uv: jnp.ndarray,
                       valid: jnp.ndarray,
                       num_hypotheses: int = 8,
                       subset: int = 8,
                       iters: int = 8, delta: float = 2.0):
    """Robust localization: GN from the init plus H hypotheses fitted on
    random minimal-ish subsets, scored by inlier count, winner re-refined on
    all inliers. All hypotheses run as one vmap."""
    from sift_tpu.geometry.ransac import sample_minimal_sets

    idx = sample_minimal_sets(key, valid, num_hypotheses, subset)   # (H, S)

    def fit_subset(sub_idx):
        sub_valid = jnp.zeros_like(valid).at[sub_idx].set(True) & valid
        p, _, _ = pose_only_refine(pose_init, intrinsics, landmarks, uv,
                                   sub_valid, iters=iters, delta=delta)
        return p

    poses = jax.vmap(fit_subset)(idx)                               # (H, 6)
    poses = jnp.concatenate([pose_init[None], poses], axis=0)

    def score(p):
        pred, z = _project_rt(*lie.se3_exp(p), intrinsics, landmarks)
        n2 = jnp.sum((pred - uv) ** 2, -1)
        return jnp.sum(valid & (z > 1e-6) & (n2 < (3.0 * delta) ** 2))

    counts = jax.vmap(score)(poses)
    best = poses[jnp.argmax(counts)]
    return pose_only_refine(best, intrinsics, landmarks, uv, valid,
                            iters=iters, delta=delta)
