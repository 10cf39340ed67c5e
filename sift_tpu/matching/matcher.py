"""Brute-force descriptor matching on the MXU.

The reference has no matching at all (SURVEY.md §2.2); this implements the
standard SIFT pipeline step the north star requires: all-pairs L2 distance as
a single (N, 128) x (128, N) matmul — exactly the shape the MXU systolic array
wants — followed by masked top-2 selection for Lowe's ratio test and an
optional mutual-nearest-neighbour check.

Everything is fixed-shape: inputs are capacity-N descriptor buffers with
validity masks, the output is a capacity-M `Matches` buffer with a validity
mask. Invalid rows/columns are excluded by +inf distances, not by gathering —
no dynamic shapes anywhere, so the whole matcher jits into one fused XLA
computation and vmaps over image pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from sift_tpu.config import MatchConfig
from sift_tpu.types import Keypoints, Matches

_BIG = jnp.float32(1e30)


def pairwise_sqdist(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                    precision=lax.Precision.DEFAULT) -> jnp.ndarray:
    """Squared L2 distances (Na, Nb) = |a|^2 + |b|^2 - 2 a.b^T.

    The cross term is one MXU matmul; the norms are fused VPU reductions.
    `precision` selects the MXU pass count (DEFAULT = fast bf16x3-ish path,
    HIGHEST = full f32) — descriptor matching tolerates DEFAULT easily.
    """
    a2 = jnp.sum(desc_a * desc_a, axis=-1, keepdims=True)        # (Na, 1)
    b2 = jnp.sum(desc_b * desc_b, axis=-1, keepdims=True).T      # (1, Nb)
    ab = jnp.dot(desc_a, desc_b.T, precision=precision,
                 preferred_element_type=jnp.float32)             # (Na, Nb) MXU
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def _quantize_int8(desc: jnp.ndarray):
    """Symmetric per-tensor int8 quantization: returns (q, scale).

    SIFT descriptors are non-negative with a known cap after per-cell
    normalization, so a single per-tensor scale loses little; the MXU
    runs int8 x int8 -> int32 at twice bf16 rate and the quantized bank
    is 4x smaller in HBM.

    Callers MUST zero invalid rows first (`_mask_rows`): the per-tensor
    scale is a max over the whole buffer, so garbage in padding slots
    would otherwise blow it up and flatten every valid descriptor to ~0
    (the padding-inertness invariant, CLAUDE.md).
    """
    amax = jnp.maximum(jnp.max(jnp.abs(desc)), 1e-12)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(desc / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _mask_rows(desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Zero invalid descriptor rows (keeps reductions over the buffer —
    the l2q8 quantization scale — independent of padding contents)."""
    return jnp.where(valid[:, None], desc, 0.0)


def _distances(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
               metric: str) -> jnp.ndarray:
    """All-pairs distance matrix under `MatchConfig.metric`.

    "l2":   squared Euclidean distance on raw descriptors.
    "dot":  cosine distance 2 - 2 a.b / (|a||b|) — equals squared L2 on the
            unit sphere, so the downstream ratio test's semantics carry over
            unchanged; useful for RootSIFT-style renormalized descriptors.
    "l2q8": squared L2 computed from int8-quantized descriptors — the
            cross-term matmul runs int8 x int8 -> int32 on the MXU (2x
            bf16 throughput, 4x less descriptor traffic). Distances are
            quantized but the ratio test is scale-invariant, so match
            sets change only near decision boundaries.
    """
    if metric == "l2q8":
        qa, sa = _quantize_int8(desc_a)
        qb, sb = _quantize_int8(desc_b)
        ab = jnp.dot(qa, qb.T.astype(jnp.int8),
                     preferred_element_type=jnp.int32).astype(jnp.float32)
        ab = ab * (sa * sb)
        a2 = jnp.sum((qa.astype(jnp.float32) * sa) ** 2, -1, keepdims=True)
        b2 = jnp.sum((qb.astype(jnp.float32) * sb) ** 2, -1,
                     keepdims=True).T
        return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    if metric == "dot":
        na = desc_a / jnp.maximum(
            jnp.linalg.norm(desc_a, axis=-1, keepdims=True), 1e-12)
        nb = desc_b / jnp.maximum(
            jnp.linalg.norm(desc_b, axis=-1, keepdims=True), 1e-12)
        ab = jnp.dot(na, nb.T, preferred_element_type=jnp.float32)
        return jnp.maximum(2.0 - 2.0 * ab, 0.0)
    assert metric == "l2", f"unknown match metric {metric!r}"
    return pairwise_sqdist(desc_a, desc_b)


def _top2_min(d: jnp.ndarray):
    """Per-row (best, second) minimum distances and best index.

    Two masked min passes — cheaper than a full sort/top_k on TPU for k=2.
    """
    best = jnp.min(d, axis=-1)
    best_idx = jnp.argmin(d, axis=-1)
    nb = d.shape[-1]
    one_hot = jax.nn.one_hot(best_idx, nb, dtype=d.dtype)
    second = jnp.min(d + one_hot * _BIG, axis=-1)
    return best, second, best_idx


def _compact(ok: jnp.ndarray, best: jnp.ndarray, best_idx: jnp.ndarray,
             m: int) -> Matches:
    """Compact accepted rows to fixed capacity m, smallest distance first."""
    score = jnp.where(ok, -best, -_BIG)
    k = min(m, score.shape[0])
    top_scores, idx_a = lax.top_k(score, k)
    valid = top_scores > -_BIG
    if k < m:
        pad = m - k
        idx_a = jnp.pad(idx_a, (0, pad))
        top_scores = jnp.pad(top_scores, (0, pad), constant_values=-_BIG)
        valid = jnp.pad(valid, (0, pad))
    return Matches(
        idx_a=idx_a.astype(jnp.int32),
        idx_b=best_idx[idx_a].astype(jnp.int32),
        distance=jnp.where(valid, -top_scores, _BIG),
        valid=valid,
    )


def _use_streaming(cfg: MatchConfig, na: int, nb: int, d: int) -> bool:
    """Resolve MatchConfig.impl at trace time.

    "auto" picks the streaming Pallas top-2 kernel only where it wins: on
    TPU, lane-aligned descriptors, and a problem big enough that the XLA
    path's HBM-materialized (Na, Nb) score matrix dominates (SLAM-loop
    capacities stay on the fused-XLA path; place-recognition / offline
    matching at 8k+ descriptors per side moves to the kernel).
    """
    if cfg.impl == "xla" or d % 128 != 0 or cfg.metric == "l2q8":
        return False     # the streaming kernel computes f32 l2/dot only
    if cfg.impl == "pallas":
        return True
    assert cfg.impl == "auto", f"unknown match impl {cfg.impl!r}"
    return (jax.devices()[0].platform == "tpu"
            and na * nb > 4096 * 4096)


def top2_masked(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
                desc_b: jnp.ndarray, valid_b: jnp.ndarray,
                cfg: MatchConfig):
    """Masked per-row (best, second, best_idx) under `cfg.metric`/`cfg.impl`.

    The building block shared with the distributed matcher
    (`dist/matching_dist.py`): rows of `desc_a` are independent, so a
    mesh shard can call this on its row slice (invalid rows/columns
    saturate to ~1e30 exactly like `match_descriptors`)."""
    if _use_streaming(cfg, desc_a.shape[0], desc_b.shape[0],
                      desc_a.shape[-1]):
        from sift_tpu.kernels.pallas.match import streaming_top2
        if cfg.metric == "dot":
            desc_a = desc_a / jnp.maximum(
                jnp.linalg.norm(desc_a, axis=-1, keepdims=True), 1e-12)
            desc_b = desc_b / jnp.maximum(
                jnp.linalg.norm(desc_b, axis=-1, keepdims=True), 1e-12)
        interp = jax.devices()[0].platform != "tpu"
        return streaming_top2(desc_a, valid_a, desc_b, valid_b, interp)
    if cfg.metric == "l2q8":
        desc_a = _mask_rows(desc_a, valid_a)
        desc_b = _mask_rows(desc_b, valid_b)
    d = _distances(desc_a, desc_b, cfg.metric)
    d = jnp.where(valid_b[None, :], d, _BIG)
    d = jnp.where(valid_a[:, None], d, _BIG)
    return _top2_min(d)


def match_descriptors(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
                      desc_b: jnp.ndarray, valid_b: jnp.ndarray,
                      cfg: MatchConfig) -> Matches:
    """Ratio-test (and optionally mutual) matches between two descriptor sets.

    Args:
      desc_a: (Na, D) float descriptors; valid_a: (Na,) bool.
      desc_b: (Nb, D); valid_b: (Nb,) bool.
      cfg:    MatchConfig (static).

    Returns a capacity-`cfg.max_matches` `Matches` sorted by ascending
    distance; invalid slots padded with index 0 / distance +inf.
    """
    if _use_streaming(cfg, desc_a.shape[0], desc_b.shape[0],
                      desc_a.shape[-1]):
        return _match_streaming(desc_a, valid_a, desc_b, valid_b, cfg)

    if cfg.metric == "l2q8":
        desc_a = _mask_rows(desc_a, valid_a)
        desc_b = _mask_rows(desc_b, valid_b)
    d = _distances(desc_a, desc_b, cfg.metric)
    # Mask invalid rows and columns out of every reduction.
    d = jnp.where(valid_b[None, :], d, _BIG)
    d = jnp.where(valid_a[:, None], d, _BIG)

    best, second, best_idx = _top2_min(d)

    # Lowe ratio on L2 distances: d1 < r * d2  <=>  d1^2 < r^2 * d2^2.
    ok = best < (cfg.ratio * cfg.ratio) * second
    ok &= valid_a & (best < _BIG)

    if cfg.mutual:
        # b's nearest a must be this a (computed from the same matrix).
        best_back = jnp.argmin(d, axis=0)                  # (Nb,)
        ok &= best_back[best_idx] == jnp.arange(d.shape[0])

    return _compact(ok, best, best_idx, cfg.max_matches)


def _match_streaming(desc_a, valid_a, desc_b, valid_b,
                     cfg: MatchConfig) -> Matches:
    """Large-N path: streaming Pallas top-2 (score matrix never hits HBM);
    ratio / mutual / compaction identical to the XLA path. The mutual
    check runs the kernel a second time with the sides swapped — at the
    sizes this path serves, both passes together remain far below the
    XLA formulation's memory-bound time (kernels/pallas/match.py)."""
    from sift_tpu.kernels.pallas.match import streaming_top2

    interp = jax.devices()[0].platform != "tpu"
    if cfg.metric == "dot":
        desc_a = desc_a / jnp.maximum(
            jnp.linalg.norm(desc_a, axis=-1, keepdims=True), 1e-12)
        desc_b = desc_b / jnp.maximum(
            jnp.linalg.norm(desc_b, axis=-1, keepdims=True), 1e-12)
    else:
        assert cfg.metric == "l2", f"unknown match metric {cfg.metric!r}"

    best, second, best_idx = streaming_top2(
        desc_a, valid_a, desc_b, valid_b, interp)
    ok = best < (cfg.ratio * cfg.ratio) * second
    ok &= valid_a & (best < _BIG)
    if cfg.mutual:
        _, _, best_back = streaming_top2(
            desc_b, valid_b, desc_a, valid_a, interp)
        ok &= best_back[best_idx] == jnp.arange(desc_a.shape[0])
    return _compact(ok, best, best_idx, cfg.max_matches)


@functools.partial(jax.jit, static_argnums=(4,))
def match_descriptors_jit(desc_a, valid_a, desc_b, valid_b,
                          cfg: MatchConfig) -> Matches:
    return match_descriptors(desc_a, valid_a, desc_b, valid_b, cfg)


def match_descriptors_guided(desc_a, valid_a, desc_b, valid_b,
                             uv_pred_a, has_pred_a, uv_b,
                             radius: float, cfg: MatchConfig) -> Matches:
    """Spatially-guided matching: rows with a position prior only consider
    candidates within `radius` pixels of the prediction.

    The SLAM tracking step knows roughly where each reference landmark will
    appear (projection under the motion-model pose); restricting candidates
    to that window both removes repetitive-texture ambiguity (the ratio
    test's second-best is now the second-best *plausible* candidate) and
    rejects gross mismatches before RANSAC ever sees them.

    uv_pred_a: (Na, 2) predicted positions; has_pred_a: (Na,) bool (rows
    without a prior match unrestricted); uv_b: (Nb, 2) keypoint positions.
    """
    if cfg.metric == "l2q8":
        desc_a = _mask_rows(desc_a, valid_a)
        desc_b = _mask_rows(desc_b, valid_b)
    d = _distances(desc_a, desc_b, cfg.metric)
    d = jnp.where(valid_b[None, :], d, _BIG)
    d = jnp.where(valid_a[:, None], d, _BIG)

    dist2 = jnp.sum((uv_pred_a[:, None, :] - uv_b[None, :, :]) ** 2, -1)
    near = dist2 <= radius * radius
    spatial_ok = jnp.where(has_pred_a[:, None], near, True)
    d = jnp.where(spatial_ok, d, _BIG)

    best, second, best_idx = _top2_min(d)
    ok = best < (cfg.ratio * cfg.ratio) * second
    ok &= valid_a & (best < _BIG)
    if cfg.mutual:
        best_back = jnp.argmin(d, axis=0)
        ok &= best_back[best_idx] == jnp.arange(d.shape[0])

    return _compact(ok, best, best_idx, cfg.max_matches)


def match_keypoints(kp_a: Keypoints, kp_b: Keypoints,
                    cfg: MatchConfig) -> Matches:
    """Convenience wrapper over two `Keypoints` (requires descriptors)."""
    assert kp_a.desc is not None and kp_b.desc is not None
    return match_descriptors(kp_a.desc, kp_a.valid, kp_b.desc, kp_b.valid, cfg)


def matched_coords(kp_a: Keypoints, kp_b: Keypoints, matches: Matches,
                   subpixel: bool = False):
    """Gather matched original-image (x, y) pairs: returns (M,2), (M,2), (M,)."""
    ax, ay = kp_a.to_image_xy(subpixel)
    bx, by = kp_b.to_image_xy(subpixel)
    pa = jnp.stack([ax[matches.idx_a], ay[matches.idx_a]], axis=-1)
    pb = jnp.stack([bx[matches.idx_b], by[matches.idx_b]], axis=-1)
    return pa, pb, matches.valid
