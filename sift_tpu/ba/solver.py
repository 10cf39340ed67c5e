"""Levenberg-Marquardt driver for Schur-complement bundle adjustment.

One jit-compiled `lax.while_loop`: each iteration linearizes, solves the
reduced camera system with matrix-free PCG, back-substitutes landmarks, and
accepts/rejects the step with multiplicative damping control — all
branch-free (`jnp.where` on the accept decision), so the whole optimizer is
a single XLA computation that also runs unchanged inside `shard_map` for the
distributed path (observations sharded, `axis_name` threaded through).

Gauge: callers pass `fixed_cam_mask` (first camera — or first two for
monocular scale — fixed). Updates for fixed cameras are structurally zero.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from flax import struct

from sift_tpu.config import BAConfig
from sift_tpu.geometry import lie
from sift_tpu.ba.residuals import cost_parts, reprojection_residuals
from sift_tpu.ba.schur import (
    build_system, schur_rhs, back_substitute, pcg, dense_schur_solve,
)


import numpy as _np

# Log-spaced histogram edges for the approximate-median residual (the
# graduated-robust-loss driver in `run_ba`): 0.01..10^4 px covers any
# realistic residual scale at better-than-13% bin resolution.
_MED_EDGES = _np.geomspace(1e-2, 1e4, 97).astype(_np.float32)


@struct.dataclass
class BAState:
    poses: jnp.ndarray        # (C, 6)
    landmarks: jnp.ndarray    # (L, 3)
    cost: jnp.ndarray         # () robust cost
    rmse: jnp.ndarray         # () reprojection RMSE (pixels)
    damping: jnp.ndarray      # () current LM lambda
    iterations: jnp.ndarray   # () int32 iterations executed
    cg_iters: jnp.ndarray     # () int32 total CG iterations


def run_ba(poses, intrinsics, landmarks, obs_cam, obs_lm, obs_uv, obs_valid,
           cfg: BAConfig, fixed_cam_mask,
           axis_name: Optional[str] = None,
           landmark_axis: Optional[str] = None,
           v_mode: str = "psum") -> BAState:
    """Optimize poses and landmarks; returns the final `BAState`.

    Under `shard_map`, obs_* are the device-local shards and `axis_name` is
    the mesh axis; poses/landmarks/intrinsics are replicated. The scalar
    cost is already globally consistent because the block sums are psum'd.
    """
    f32 = jnp.float32

    def total_cost(p, l, delta=None):
        c, sq, cnt = cost_parts(p, intrinsics, l, obs_cam, obs_lm, obs_uv,
                                obs_valid,
                                cfg.huber_delta if delta is None else delta,
                                cfg.loss)
        if axis_name is not None:
            # psum the squared-residual sum and the valid count separately:
            # pmean of per-shard rmse^2 would weight shards equally even
            # with uneven valid-observation counts (padding skew).
            c = lax.psum(c, axis_name)
            sq = lax.psum(sq, axis_name)
            cnt = lax.psum(cnt, axis_name)
        rmse = jnp.sqrt(sq / jnp.maximum(cnt, 1))
        return c, rmse

    def median_residual(p, l):
        """Approximate median |r| over valid observations: psum'd
        fixed-log-bin histogram (exact counts -> mesh-shape-invariant)."""
        r_all, _ = reprojection_residuals(p, intrinsics, l, obs_cam,
                                          obs_lm, obs_uv)
        rn = jnp.linalg.norm(r_all, axis=-1)
        rn = jnp.where(jnp.isfinite(rn), rn, 1e6)
        edges = jnp.asarray(_MED_EDGES, f32)
        bidx = jnp.sum((rn[:, None] >= edges[None, :]).astype(jnp.int32),
                       axis=1)
        v = obs_valid.astype(f32)
        counts = jnp.zeros(edges.shape[0] + 1, f32).at[bidx].add(v)
        cnt = jnp.sum(v)
        if axis_name is not None:
            counts = lax.psum(counts, axis_name)
            cnt = lax.psum(cnt, axis_name)
        cum = jnp.cumsum(counts)
        med_bin = jnp.argmax(cum >= 0.5 * cnt)
        return edges[jnp.clip(med_bin, 0, edges.shape[0] - 1)]

    med0 = median_residual(poses, landmarks)

    c0, rmse0 = total_cost(poses, landmarks)
    init = BAState(
        poses=poses, landmarks=landmarks, cost=c0, rmse=rmse0,
        damping=jnp.asarray(cfg.damping_init, f32),
        iterations=jnp.asarray(0, jnp.int32),
        cg_iters=jnp.asarray(0, jnp.int32),
    )

    def cond(st: BAState):
        return (st.iterations < cfg.max_iterations) & \
               (st.damping < cfg.damping_max)

    def body(st: BAState):
        # Graduated robust loss (r5, GNC schedule): with a robust kernel
        # and a BAD init (typical residual >> delta) nearly every residual
        # sits in the down-weighted regime, and IRLS can reduce the robust
        # cost while letting a subset blow up — measured DIVERGENCE at map
        # scale (benchmarks/ba_scale.py: huber 161->97 px while
        # loss="none" reached 2.6). The schedule starts the kernel at
        # robust_anneal x the INITIAL median residual and halves it every
        # iteration down to huber_delta — early iterations are
        # quasi-quadratic, the kernel tightens monotonically (a
        # current-median feedback loop measured unstable: it re-widened on
        # its own damage and wandered). The median (not RMSE) keeps
        # true-outlier problems unchanged — gross outliers dominate RMSE
        # but not the median, so those runs start near huber_delta. It is
        # a psum'd fixed-bin histogram: exact integer counts, identical
        # across mesh shapes (determinism invariant). The accept test
        # compares old/new cost at the SAME delta_eff (costs at different
        # deltas are incomparable).
        if cfg.loss != "none" and cfg.robust_anneal > 0.0:
            delta_eff = jnp.maximum(
                f32(cfg.huber_delta),
                f32(cfg.robust_anneal) * med0
                * jnp.power(f32(0.5), st.iterations.astype(f32)))
        else:
            delta_eff = f32(cfg.huber_delta)
        sys = build_system(st.poses, intrinsics, st.landmarks,
                           obs_cam, obs_lm, obs_uv, obs_valid,
                           delta_eff, st.damping, fixed_cam_mask,
                           axis_name, cfg.loss, landmark_axis, v_mode)
        b = schur_rhs(sys)
        use_dense = cfg.solver == "dense" or \
            (cfg.solver == "auto" and poses.shape[0] <= 16)
        if use_dense:
            dc = dense_schur_solve(sys, b)
            k = jnp.asarray(0, jnp.int32)
        else:
            dc, k = pcg(sys, b, cfg.cg_iterations, cfg.cg_tol,
                        jacobi=cfg.jacobi_precond)
        dc = jnp.where(fixed_cam_mask[:, None], 0.0, dc)
        dl = back_substitute(sys, dc)
        # Non-finite updates (degenerate blocks at float32 precision) must
        # not poison the state: the robust cost masks NaN observations, so
        # a poisoned-but-"accepted" step would otherwise slip through.
        dc = jnp.where(jnp.isfinite(dc), dc, 0.0)
        dl = jnp.where(jnp.isfinite(dl), dl, 0.0)

        new_poses = lie.boxplus(st.poses, dc)     # manifold retraction
        new_lms = st.landmarks + dl
        old_cost, _ = total_cost(st.poses, st.landmarks, delta_eff)
        new_cost, new_rmse = total_cost(new_poses, new_lms, delta_eff)

        accept = new_cost < old_cost
        poses_n = jnp.where(accept, new_poses, st.poses)
        lms_n = jnp.where(accept, new_lms, st.landmarks)
        cost_n = jnp.where(accept, new_cost, st.cost)
        rmse_n = jnp.where(accept, new_rmse, st.rmse)
        damping_n = jnp.where(
            accept,
            jnp.maximum(st.damping * f32(1.0 / 3.0), cfg.damping_min),
            st.damping * f32(4.0))

        return BAState(poses=poses_n, landmarks=lms_n, cost=cost_n,
                       rmse=rmse_n, damping=damping_n,
                       iterations=st.iterations + 1,
                       cg_iters=st.cg_iters + k)

    return lax.while_loop(cond, body, init)


@functools.partial(jax.jit, static_argnums=(7,))
def run_ba_jit(poses, intrinsics, landmarks, obs_cam, obs_lm, obs_uv,
               obs_valid, cfg: BAConfig, fixed_cam_mask) -> BAState:
    return run_ba(poses, intrinsics, landmarks, obs_cam, obs_lm, obs_uv,
                  obs_valid, cfg, fixed_cam_mask)


def run_ba_map(state, cfg: BAConfig, fixed_cam_mask,
               axis_name: Optional[str] = None):
    """Optimize a `sift_tpu.types.MapState`; returns (new_state, BAState)."""
    st = run_ba(state.poses, state.intrinsics, state.landmarks,
                state.obs_cam, state.obs_lm, state.obs_uv, state.obs_valid,
                cfg, fixed_cam_mask, axis_name)
    return state.replace(poses=st.poses, landmarks=st.landmarks), st
