"""Intrinsics refinement (self-calibration).

The pinhole (fx, fy, cx, cy) block couples every observation, which would
densify the Schur structure if solved jointly; instead it is refined by
outer-loop coordinate descent — Gauss-Newton on the 4 intrinsic parameters
with poses and landmarks held fixed (a (4, 4) solve over all observations),
alternated with standard BA. Converges fast because intrinsics are nearly
orthogonal to the pose/structure gauge on wide-baseline problems.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from sift_tpu.geometry import lie


def _residuals(intrinsics, poses, landmarks, obs_cam, obs_lm, obs_uv):
    def one(c, l, uv):
        R, t = lie.se3_exp(poses[c])
        Rt, tt = lie.se3_inverse(R, t)
        x_c = lie.transform(Rt, tt, landmarks[l])
        z = x_c[2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        pred = jnp.stack([intrinsics[0] * x_c[0] * inv_z + intrinsics[2],
                          intrinsics[1] * x_c[1] * inv_z + intrinsics[3]])
        return pred - uv, z

    return jax.vmap(one)(obs_cam, obs_lm, obs_uv)


def refine_intrinsics(intrinsics, poses, landmarks,
                      obs_cam, obs_lm, obs_uv, obs_valid,
                      iters: int = 10, huber_delta: float = 3.0,
                      damping: float = 1e-4,
                      axis_name: Optional[str] = None):
    """Gauss-Newton on (fx, fy, cx, cy) with structure fixed.

    Returns (intrinsics (4,), rmse). Under `shard_map` the observation
    arrays are local shards and `axis_name` psums the 4x4 normal equations.
    """
    def weighted_system(K):
        r, z = _residuals(K, poses, landmarks, obs_cam, obs_lm, obs_uv)
        ok = obs_valid & (z > 1e-6)
        n2 = jnp.sum(r * r, -1)
        w = jnp.where(ok, jnp.minimum(1.0, huber_delta /
                                      jnp.sqrt(jnp.maximum(n2, 1e-12))), 0.0)
        J = jax.jacfwd(lambda k: _residuals(
            k, poses, landmarks, obs_cam, obs_lm, obs_uv)[0])(K)  # (O, 2, 4)
        Jw = J * w[:, None, None]
        H = jnp.einsum("oij,oil->jl", Jw, J)
        g = jnp.einsum("oij,oi->j", Jw, r)
        cost = jnp.sum(w * n2)
        if axis_name is not None:
            H = lax.psum(H, axis_name)
            g = lax.psum(g, axis_name)
            cost = lax.psum(cost, axis_name)
        return H, g, cost

    def step(carry, _):
        K, lam = carry
        H, g, cost = weighted_system(K)
        dK = -jnp.linalg.solve(H + lam * jnp.eye(4, dtype=K.dtype), g)
        K_new = K + dK
        _, _, cost_new = weighted_system(K_new)
        accept = cost_new < cost
        K = jnp.where(accept, K_new, K)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (K, lam), None

    (K, _), _ = lax.scan(step, (intrinsics,
                                jnp.asarray(damping, intrinsics.dtype)),
                         None, length=iters)
    r, z = _residuals(K, poses, landmarks, obs_cam, obs_lm, obs_uv)
    ok = obs_valid & (z > 1e-6)
    n2 = jnp.where(ok, jnp.sum(r * r, -1), 0.0)
    cnt = jnp.maximum(jnp.sum(ok), 1)
    if axis_name is not None:
        n2s = lax.psum(jnp.sum(n2), axis_name)
        cnt = lax.psum(cnt, axis_name)
        rmse = jnp.sqrt(n2s / cnt)
    else:
        rmse = jnp.sqrt(jnp.sum(n2) / cnt)
    return K, rmse


def self_calibrate(intrinsics, poses, landmarks, obs_cam, obs_lm, obs_uv,
                   obs_valid, cfg, fixed_cam_mask, rounds: int = 3):
    """Alternate intrinsics refinement with bundle adjustment."""
    from sift_tpu.ba.solver import run_ba

    K = intrinsics
    st = None
    for _ in range(rounds):
        st = run_ba(poses, K, landmarks, obs_cam, obs_lm, obs_uv, obs_valid,
                    cfg, fixed_cam_mask)
        poses, landmarks = st.poses, st.landmarks
        K, _ = refine_intrinsics(K, poses, landmarks, obs_cam, obs_lm,
                                 obs_uv, obs_valid,
                                 huber_delta=cfg.huber_delta)
    return K, poses, landmarks, st
