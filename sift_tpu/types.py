"""Core pytree data types.

Everything downstream of extrema detection runs on *masked fixed-size
buffers* (the central static-shape decision, SURVEY.md §7): a `Keypoints`
batch always has capacity-`N` arrays plus a validity mask. Invalid slots carry
well-defined padding values so reductions don't need special cases.

Coordinate convention: images are `(H, W)` row-major; a keypoint position is
stored as `(x, y)` in *level* coordinates where `x` indexes width (axis 1) and
`y` indexes height (axis 0) — the same convention as the reference's
`Point{x,y}` over Vigra's `(width, height)` arrays, so parity comparisons are
direct. `to_image_xy` maps level coords to original-image coords by the
reference's rule `loc * 2**octave / (2 if subpixel else 1)` (main.cpp:62-63).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Keypoints:
    """A fixed-capacity batch of keypoints (all arrays share leading shape).

    Attributes:
      x, y:        float32, position in the coordinate frame of (octave, level).
      octave:      int32.
      level:       int32, DoG level index within the octave.
      scale:       float32. In parity mode this is the reference's
                   sigma-difference "scale" (sift.cpp:399); in lowe mode the
                   true Gaussian sigma of the keypoint.
      score:       float32, detection strength (|DoG| at the extremum).
      orientation: float32 degrees in [0, 360).
      valid:       bool mask.
      desc:        optional (N, 128) float32 descriptors.
      n_dropped:   optional scalar int32 — REFINED, valid keypoints that did
                   not fit a fixed-capacity stage (the global top-K
                   compaction; in parity mode also the per-octave candidate
                   buffers, since parity must reproduce the reference's
                   unbounded keypoint set). Nonzero means the output silently
                   truncates the true keypoint set: parity comparisons are
                   invalid, capacity audits fail, and the CLI warns.
      n_cand_pruned: optional scalar int32 (lowe mode) — raw extrema
                   CANDIDATES beyond the per-octave cap, pruned
                   weakest-|DoG|-first before refinement. This is
                   quality-managed strongest-N selection (most pruned
                   candidates would fail the contrast/edge filters anyway),
                   not silent loss; reported so benches can log coverage.
    """

    x: jnp.ndarray
    y: jnp.ndarray
    octave: jnp.ndarray
    level: jnp.ndarray
    scale: jnp.ndarray
    score: jnp.ndarray
    orientation: jnp.ndarray
    valid: jnp.ndarray
    desc: Optional[jnp.ndarray] = None
    n_dropped: Optional[jnp.ndarray] = None
    n_cand_pruned: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def to_image_xy(self, subpixel: bool = False):
        """Positions in original-image pixels (reference rule, main.cpp:62-63)."""
        factor = jnp.exp2(self.octave.astype(jnp.float32))
        div = 2.0 if subpixel else 1.0
        return self.x * factor / div, self.y * factor / div

    def filtered(self, keep: jnp.ndarray) -> "Keypoints":
        """Return a copy with `valid &= keep` (no compaction; masks compose)."""
        return self.replace(valid=jnp.logical_and(self.valid, keep))


def empty_keypoints(capacity: int, with_desc: bool = False) -> Keypoints:
    z = jnp.zeros((capacity,), jnp.float32)
    zi = jnp.zeros((capacity,), jnp.int32)
    return Keypoints(
        x=z, y=z, octave=zi, level=zi, scale=z, score=z, orientation=z,
        valid=jnp.zeros((capacity,), bool),
        desc=jnp.zeros((capacity, 128), jnp.float32) if with_desc else None,
    )


@struct.dataclass
class Matches:
    """Fixed-capacity correspondences between two keypoint sets."""

    idx_a: jnp.ndarray     # (M,) int32 into set A
    idx_b: jnp.ndarray     # (M,) int32 into set B
    distance: jnp.ndarray  # (M,) float32
    valid: jnp.ndarray     # (M,) bool

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


@struct.dataclass
class TwoViewEstimate:
    """Output of two-view RANSAC geometry."""

    model: jnp.ndarray        # (3,3) E/F/H matrix
    inliers: jnp.ndarray      # (M,) bool over the input matches
    num_inliers: jnp.ndarray  # () int32
    success: jnp.ndarray      # () bool


@struct.dataclass
class MapState:
    """SLAM/SfM map: fixed-capacity cameras, landmarks, observation graph.

    poses:      (C, 6)  se(3) tangent (world-from-camera as (rot, trans) log).
    intrinsics: (4,)    fx, fy, cx, cy (shared pinhole).
    landmarks:  (L, 3)  world points.
    obs_cam:    (O,)    int32 camera index per observation.
    obs_lm:     (O,)    int32 landmark index per observation.
    obs_uv:     (O, 2)  measured pixel coordinates.
    *_valid:    masks for each capacity axis.
    """

    poses: jnp.ndarray
    intrinsics: jnp.ndarray
    landmarks: jnp.ndarray
    obs_cam: jnp.ndarray
    obs_lm: jnp.ndarray
    obs_uv: jnp.ndarray
    pose_valid: jnp.ndarray
    landmark_valid: jnp.ndarray
    obs_valid: jnp.ndarray
