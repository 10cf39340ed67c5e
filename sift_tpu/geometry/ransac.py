"""Accelerator-native RANSAC.

Classic RANSAC is a data-dependent loop (sample until confidence) — hostile
to XLA. This engine instead runs a *fixed batch* of hypotheses entirely in
parallel (SURVEY.md §7): draw `num_hypotheses` minimal samples at once
(Gumbel top-k gives distinct indices restricted to valid matches without any
rejection loop), solve all of them with a vmapped minimal solver, score all
hypotheses against all matches as one (H, N) masked reduction, and take the
argmax. An optional least-squares refit on the winning inlier set runs as a
single weighted solve.

Deterministic given the PRNG key, independent of device mesh or iteration
order — a determinism requirement the SLAM layer relies on (SURVEY.md §5
"race detection": same seed -> identical trajectory).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sift_tpu.config import RansacConfig
from sift_tpu.types import TwoViewEstimate

_NEG = -1e30


def sample_minimal_sets(key: jax.Array, valid: jnp.ndarray,
                        num_hypotheses: int, sample_size: int) -> jnp.ndarray:
    """(H, S) distinct indices drawn uniformly from the valid entries.

    Gumbel-top-k trick: per hypothesis, add iid Gumbel noise to a 0/-inf
    validity score and take the top-S — equivalent to sampling S distinct
    valid indices uniformly at random, with no rejection sampling.
    """
    n = valid.shape[0]
    g = jax.random.gumbel(key, (num_hypotheses, n))
    scores = jnp.where(valid[None, :], g, _NEG)
    _, idx = jax.lax.top_k(scores, sample_size)
    return idx


def ransac(key: jax.Array,
           pa: jnp.ndarray, pb: jnp.ndarray, valid: jnp.ndarray,
           solve_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
           error_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
           sample_size: int,
           cfg: RansacConfig,
           refit_fn: Optional[Callable] = None) -> TwoViewEstimate:
    """Generic fixed-batch RANSAC.

    Args:
      pa, pb:   (N, 2) matched point coordinates; `valid`: (N,) bool.
      solve_fn: minimal solver (S, 2) x (S, 2) -> (3, 3) model (vmapped here).
      error_fn: (3, 3) model, (N, 2), (N, 2) -> (N,) squared pixel errors.
      sample_size: S, the minimal sample size (4 homography, 8 epipolar).
      refit_fn: optional weighted refit ((N,2), (N,2), (N,) weights) -> (3,3),
                applied to the best hypothesis's inliers.
    """
    idx = sample_minimal_sets(key, valid, cfg.num_hypotheses, sample_size)
    sa = pa[idx]                        # (H, S, 2)
    sb = pb[idx]

    models = jax.vmap(solve_fn)(sa, sb)                         # (H, 3, 3)
    errors = jax.vmap(lambda m: error_fn(m, pa, pb))(models)    # (H, N)

    thresh2 = cfg.inlier_threshold * cfg.inlier_threshold
    inlier_mask = (errors < thresh2) & valid[None, :]
    counts = jnp.sum(inlier_mask, axis=-1)

    # Tie-break equal counts by total inlier error (lower is better).
    err_sum = jnp.sum(jnp.where(inlier_mask, errors, 0.0), axis=-1)
    order = counts.astype(jnp.float64 if counts.dtype == jnp.int64 else jnp.float32) \
        - err_sum / (err_sum.max() + 1.0)
    best = jnp.argmax(order)

    model = models[best]
    inliers = inlier_mask[best]
    num_inliers = counts[best]

    if cfg.refit and refit_fn is not None:
        refit_model = refit_fn(pa, pb, inliers.astype(pa.dtype))
        refit_err = error_fn(refit_model, pa, pb)
        refit_inliers = (refit_err < thresh2) & valid
        refit_count = jnp.sum(refit_inliers)
        better = refit_count >= num_inliers
        model = jnp.where(better, refit_model, model)
        inliers = jnp.where(better, refit_inliers, inliers)
        num_inliers = jnp.where(better, refit_count, num_inliers)

    return TwoViewEstimate(
        model=model,
        inliers=inliers,
        num_inliers=num_inliers.astype(jnp.int32),
        success=num_inliers >= cfg.min_inliers,
    )
