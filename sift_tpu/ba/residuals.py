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


def huber_weights(r: jnp.ndarray, delta: float,
                  obs_valid: jnp.ndarray,
                  depths: jnp.ndarray | None = None) -> jnp.ndarray:
    """IRLS weights (O,): 1 inside the Huber region, delta/|r| outside.

    Observations that are invalid (masked) or behind the camera get weight 0
    — masking by weight keeps every shape static.
    """
    norm = jnp.sqrt(jnp.maximum(jnp.sum(r * r, axis=-1), _EPS))
    w = jnp.minimum(1.0, delta / norm)
    w = jnp.where(obs_valid, w, 0.0)
    if depths is not None:
        w = jnp.where(depths > 1e-6, w, 0.0)
    return w


def linearize(poses, intrinsics, landmarks, obs_cam, obs_lm, obs_uv,
              obs_valid, huber_delta: float):
    """Weighted residuals and Jacobian blocks at the current estimate.

    Returns:
      r:  (O, 2) sqrt-weighted residuals
      Jc: (O, 2, 6) sqrt-weighted d r / d pose[obs_cam]
      Jl: (O, 2, 3) sqrt-weighted d r / d landmark[obs_lm]
      w:  (O,) the IRLS weights used (for masking/diagnostics)
    """
    def one(c, l, uv):
        def f(pose, landmark):
            r, _ = _residual_one(pose, intrinsics, landmark, uv)
            return r
        pose, landmark = poses[c], landmarks[l]
        r, depth = _residual_one(pose, intrinsics, landmark, uv)
        Jc, Jl = jax.jacfwd(f, argnums=(0, 1))(pose, landmark)
        return r, Jc, Jl, depth

    r, Jc, Jl, depths = jax.vmap(one)(obs_cam, obs_lm, obs_uv)
    w = huber_weights(r, huber_delta, obs_valid, depths)
    sw = jnp.sqrt(w)[:, None]
    return r * sw, Jc * sw[..., None], Jl * sw[..., None], w


def cost(poses, intrinsics, landmarks, obs_cam, obs_lm, obs_uv, obs_valid,
         huber_delta: float):
    """Robust total cost and RMSE over valid, in-front observations."""
    r, depths = reprojection_residuals(poses, intrinsics, landmarks,
                                       obs_cam, obs_lm, obs_uv)
    valid = obs_valid & (depths > 1e-6)
    n2 = jnp.sum(r * r, axis=-1)
    norm = jnp.sqrt(jnp.maximum(n2, _EPS))
    # Huber rho: 0.5 r^2 inside, delta (|r| - 0.5 delta) outside.
    rho = jnp.where(norm <= huber_delta, 0.5 * n2,
                    huber_delta * (norm - 0.5 * huber_delta))
    total = jnp.sum(jnp.where(valid, rho, 0.0))
    cnt = jnp.maximum(jnp.sum(valid), 1)
    rmse = jnp.sqrt(jnp.sum(jnp.where(valid, n2, 0.0)) / cnt)
    return total, rmse
