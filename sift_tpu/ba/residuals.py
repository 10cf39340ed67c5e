"""Reprojection residuals and per-observation Jacobians.

The parameter space is (poses (C, 6) se(3) world-from-camera, landmarks
(L, 3)); each observation o contributes a 2-vector residual
``r_o = project(pose[cam_o], K, X[lm_o]) - uv_o``.

`linearize` returns the per-observation Jacobian blocks — (O, 2, 6) wrt the
observed camera and (O, 2, 3) wrt the observed landmark — via one vmapped
`jax.jacfwd`. That is the whole "sparse Jacobian assembly" of a classic BA
library: the block lists plus the (obs_cam, obs_lm) index arrays fully
describe J, and every downstream product is a segment reduction over them.

Robustness: Huber IRLS weights on the residual norm, applied as sqrt-weights
to residuals and Jacobian blocks so the normal equations see the weighted
problem.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sift_tpu.geometry import lie
from sift_tpu.geometry.camera import project

_EPS = 1e-12


def _residual_one(pose, intrinsics, landmark, uv):
    pred, depth = project(pose, intrinsics, landmark)
    return pred - uv, depth


def reprojection_residuals(poses, intrinsics, landmarks,
                           obs_cam, obs_lm, obs_uv):
    """(O, 2) residuals and (O,) depths for all observations."""
    def one(c, l, uv):
        return _residual_one(poses[c], intrinsics, landmarks[l], uv)
    return jax.vmap(one)(obs_cam, obs_lm, obs_uv)


def robust_weights(r: jnp.ndarray, delta: float,
                   obs_valid: jnp.ndarray,
                   depths: jnp.ndarray | None = None,
                   loss: str = "huber") -> jnp.ndarray:
    """IRLS weights (O,) for the chosen robust loss.

    huber:  1 inside the delta region, delta/|r| outside (bounded influence).
    cauchy: 1 / (1 + (|r|/delta)^2) — influence decays to zero, which is what
            actually suppresses gross outliers (Huber's constant influence
            leaves a bias proportional to the outlier fraction).

    Observations that are invalid (masked) or behind the camera get weight 0
    — masking by weight keeps every shape static.
    """
    n2 = jnp.maximum(jnp.sum(r * r, axis=-1), _EPS)
    if loss == "cauchy":
        w = 1.0 / (1.0 + n2 / (delta * delta))
    elif loss == "huber":
        w = jnp.minimum(1.0, delta / jnp.sqrt(n2))
    else:  # "none"
        w = jnp.ones_like(n2)
    w = jnp.where(obs_valid, w, 0.0)
    if depths is not None:
        w = jnp.where(depths > 1e-6, w, 0.0)
    return w


def linearize(poses, intrinsics, landmarks, obs_cam, obs_lm, obs_uv,
              obs_valid, huber_delta: float, loss: str = "huber"):
    """Weighted residuals and Jacobian blocks at the current estimate.

    Returns:
      r:  (O, 2) sqrt-weighted residuals
      Jc: (O, 2, 6) sqrt-weighted d r / d pose[obs_cam]
      Jl: (O, 2, 3) sqrt-weighted d r / d landmark[obs_lm]
      w:  (O,) the IRLS weights used (for masking/diagnostics)
    """
    def one(c, l, uv):
        pose, landmark = poses[c], landmarks[l]
        R0, t0 = lie.se3_exp(pose)

        def f(delta, lm):
            # Local right-perturbation of the pose: T = T0 exp(delta). The
            # camera Jacobian is wrt delta at 0 (manifold linearization —
            # no global-chart singularity; updates retract via lie.boxplus).
            dR, dt = lie.se3_exp(delta)
            R, t = lie.se3_compose(R0, t0, dR, dt)
            Rt, tt = lie.se3_inverse(R, t)
            x_c = lie.transform(Rt, tt, lm)
            z = x_c[2]
            inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
            fx, fy, cx, cy = (intrinsics[0], intrinsics[1],
                              intrinsics[2], intrinsics[3])
            pred = jnp.stack([fx * x_c[0] * inv_z + cx,
                              fy * x_c[1] * inv_z + cy])
            return pred - uv, z

        zero = jnp.zeros((6,), poses.dtype)
        (r, depth) = f(zero, landmark)
        Jc, Jl = jax.jacfwd(lambda d, lm: f(d, lm)[0],
                            argnums=(0, 1))(zero, landmark)
        return r, Jc, Jl, depth

    r, Jc, Jl, depths = jax.vmap(one)(obs_cam, obs_lm, obs_uv)
    w = robust_weights(r, huber_delta, obs_valid, depths, loss)
    sw = jnp.sqrt(w)[:, None]
    return r * sw, Jc * sw[..., None], Jl * sw[..., None], w


def cost_parts(poses, intrinsics, landmarks, obs_cam, obs_lm, obs_uv,
               obs_valid, huber_delta: float, loss: str = "huber"):
    """Robust cost pieces over valid, in-front observations.

    Returns (total_rho, sq_sum, count) — keeping the sum of squared
    residuals and the valid count separate lets distributed callers psum
    both before dividing, so the global RMSE weights every observation
    equally instead of every shard (shards carry uneven padding).
    """
    r, depths = reprojection_residuals(poses, intrinsics, landmarks,
                                       obs_cam, obs_lm, obs_uv)
    valid = obs_valid & (depths > 1e-6)
    n2 = jnp.sum(r * r, axis=-1)
    norm = jnp.sqrt(jnp.maximum(n2, _EPS))
    d2 = huber_delta * huber_delta
    if loss == "cauchy":
        rho = 0.5 * d2 * jnp.log1p(n2 / d2)
    elif loss == "huber":
        # Huber rho: 0.5 r^2 inside, delta (|r| - 0.5 delta) outside.
        rho = jnp.where(norm <= huber_delta, 0.5 * n2,
                        huber_delta * (norm - 0.5 * huber_delta))
    else:
        rho = 0.5 * n2
    total = jnp.sum(jnp.where(valid, rho, 0.0))
    sq_sum = jnp.sum(jnp.where(valid, n2, 0.0))
    cnt = jnp.sum(valid)
    return total, sq_sum, cnt


def cost(poses, intrinsics, landmarks, obs_cam, obs_lm, obs_uv, obs_valid,
         huber_delta: float, loss: str = "huber"):
    """Robust total cost and RMSE over valid, in-front observations."""
    total, sq_sum, cnt = cost_parts(poses, intrinsics, landmarks, obs_cam,
                                    obs_lm, obs_uv, obs_valid, huber_delta,
                                    loss)
    rmse = jnp.sqrt(sq_sum / jnp.maximum(cnt, 1))
    return total, rmse
