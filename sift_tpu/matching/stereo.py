"""Stereo keypoint depth (rectified pairs, e.g. KITTI image_0/image_1).

For rectified stereo, a left keypoint's match in the right image lies on the
same row with positive disparity. This reuses the MXU all-pairs descriptor
distance with two extra masks (row proximity, disparity range) and a ratio
test; matched disparities give metric depth `z = fx * baseline / d`, which
feeds the pipeline's existing RGB-D path — monocular scale drift disappears
without a depth sensor.

Fixed shapes throughout: capacity-N keypoint buffers in, (N,) depth array
out (0 where no valid stereo match).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sift_tpu.matching.matcher import pairwise_sqdist
from sift_tpu.types import Keypoints

_BIG = jnp.float32(1e30)


def stereo_depths(kp_l: Keypoints, kp_r: Keypoints,
                  fx: float, baseline: float,
                  max_row_diff: float = 1.5,
                  min_disparity: float = 0.5,
                  max_disparity: float = 192.0,
                  ratio: float = 0.8,
                  subpixel: bool = False) -> jnp.ndarray:
    """Per-left-keypoint metric depth from a rectified stereo pair.

    kp_l/kp_r: Keypoints with descriptors (positions in full-resolution
    pixels via `to_image_xy`). `subpixel` must match the extractor's
    `SiftConfig.subpixel` so positions land in original-image pixels.
    Returns (N_l,) float32 depths, 0 = invalid.
    """
    ul, vl = kp_l.to_image_xy(subpixel)
    ur, vr = kp_r.to_image_xy(subpixel)

    d = pairwise_sqdist(kp_l.desc, kp_r.desc)
    row_ok = jnp.abs(vl[:, None] - vr[None, :]) <= max_row_diff
    disp = ul[:, None] - ur[None, :]
    disp_ok = (disp >= min_disparity) & (disp <= max_disparity)
    ok = row_ok & disp_ok & kp_r.valid[None, :] & kp_l.valid[:, None]
    d = jnp.where(ok, d, _BIG)

    best = jnp.min(d, axis=-1)
    best_idx = jnp.argmin(d, axis=-1)
    one_hot = jax.nn.one_hot(best_idx, d.shape[-1], dtype=d.dtype)
    second = jnp.min(d + one_hot * _BIG, axis=-1)
    accept = (best < _BIG) & (best < ratio * ratio * second)

    best_disp = jnp.take_along_axis(disp, best_idx[:, None], axis=-1)[:, 0]
    depth = fx * baseline / jnp.maximum(best_disp, 1e-6)
    return jnp.where(accept, depth, 0.0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def stereo_depths_jit(kp_l, kp_r, fx, baseline, max_row_diff=1.5,
                      min_disparity=0.5, max_disparity=192.0, ratio=0.8,
                      subpixel=False):
    return stereo_depths(kp_l, kp_r, fx, baseline, max_row_diff,
                         min_disparity, max_disparity, ratio, subpixel)
