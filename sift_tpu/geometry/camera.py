"""Pinhole camera model.

Poses are world-from-camera (R, t): x_w = R x_c + t. Projection therefore
first inverts the pose. Intrinsics are (fx, fy, cx, cy) pinhole (no
distortion — TUM-RGBD/KITTI benchmark sequences ship rectified frames).
"""

from __future__ import annotations

import jax.numpy as jnp

from sift_tpu.geometry import lie

_EPS = 1e-9


def world_to_camera(pose_wc: jnp.ndarray, x_w: jnp.ndarray) -> jnp.ndarray:
    """pose_wc: (..., 6) se3 world-from-camera; x_w: (..., 3) world points."""
    R, t = lie.se3_exp(pose_wc)
    Rt, tt = lie.se3_inverse(R, t)
    return lie.transform(Rt, tt, x_w)


def project(pose_wc: jnp.ndarray, intrinsics: jnp.ndarray,
            x_w: jnp.ndarray):
    """Project world points into pixels.

    Returns (uv (..., 2), depth (...,)) — depth is the camera-frame z,
    used for cheirality tests and validity masking.
    """
    x_c = world_to_camera(pose_wc, x_w)
    z = x_c[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    fx, fy, cx, cy = (intrinsics[..., 0], intrinsics[..., 1],
                      intrinsics[..., 2], intrinsics[..., 3])
    u = fx * x_c[..., 0] * inv_z + cx
    v = fy * x_c[..., 1] * inv_z + cy
    return jnp.stack([u, v], axis=-1), z


def backproject(intrinsics: jnp.ndarray, uv: jnp.ndarray,
                depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels + depth -> camera-frame 3D points."""
    fx, fy, cx, cy = (intrinsics[..., 0], intrinsics[..., 1],
                      intrinsics[..., 2], intrinsics[..., 3])
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def normalize_points(intrinsics: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> normalized image coordinates (K^{-1} [u, v, 1])_{xy}."""
    fx, fy, cx, cy = (intrinsics[..., 0], intrinsics[..., 1],
                      intrinsics[..., 2], intrinsics[..., 3])
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)


def intrinsics_matrix(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """(fx, fy, cx, cy) -> 3x3 K."""
    fx, fy, cx, cy = intrinsics
    return jnp.asarray([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]],
                       jnp.asarray(intrinsics).dtype)
