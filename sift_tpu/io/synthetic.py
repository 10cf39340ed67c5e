"""Synthetic SfM scenes with known ground truth (property-test fixtures,
SURVEY.md §4: "BA on synthetic scenes with known ground truth")."""

from __future__ import annotations

import numpy as np


def make_scene(rng: np.random.Generator,
               num_cameras: int = 6,
               num_landmarks: int = 200,
               image_size=(640, 480),
               intrinsics=(500.0, 500.0, 320.0, 240.0),
               pixel_noise: float = 0.0,
               pose_noise: float = 0.0,
               landmark_noise: float = 0.0,
               drop_rate: float = 0.0):
    """Cameras on an arc looking at a landmark cloud.

    Returns a dict of numpy arrays matching `sift_tpu.ba.run_ba` inputs plus
    ground truth: poses are world-from-camera se(3) tangents; observations
    are all (camera, landmark) pairs that project inside the image, with
    optional Gaussian pixel noise; `poses_init`/`landmarks_init` carry the
    perturbed initial estimates.
    """
    from scipy.spatial.transform import Rotation

    w, h = image_size
    fx, fy, cx, cy = intrinsics

    # Landmarks in a box in front of the rig.
    X = np.stack([
        rng.uniform(-4, 4, num_landmarks),
        rng.uniform(-3, 3, num_landmarks),
        rng.uniform(8, 16, num_landmarks),
    ], -1)

    # Cameras along an x-arc, with small look-at rotations toward the cloud.
    poses_R, poses_t = [], []
    for i in range(num_cameras):
        t = np.array([-2.0 + 4.0 * i / max(num_cameras - 1, 1),
                      0.1 * np.sin(i), 0.0])
        yaw = -0.05 * (i - num_cameras / 2)
        R = Rotation.from_euler("y", yaw).as_matrix()
        poses_R.append(R)
        poses_t.append(t)
    poses_R = np.stack(poses_R)
    poses_t = np.stack(poses_t)

    # se(3) log (world-from-camera).
    def se3_log_np(R, t):
        rv = Rotation.from_matrix(R).as_rotvec()
        theta = np.linalg.norm(rv)
        if theta < 1e-8:
            Vinv = np.eye(3)
        else:
            K = np.array([[0, -rv[2], rv[1]], [rv[2], 0, -rv[0]],
                          [-rv[1], rv[0], 0]])
            half = theta / 2
            Vinv = (np.eye(3) - 0.5 * K +
                    (1 - half * np.cos(half) / np.sin(half)) / theta ** 2 * K @ K)
        return np.concatenate([rv, Vinv @ t])

    poses_gt = np.stack([se3_log_np(R, t) for R, t in zip(poses_R, poses_t)])

    # Observations: project everything, keep in-image ones.
    obs_cam, obs_lm, obs_uv = [], [], []
    for c in range(num_cameras):
        Xc = (X - poses_t[c]) @ poses_R[c]      # R^T (X - t)
        z = Xc[:, 2]
        u = fx * Xc[:, 0] / z + cx
        v = fy * Xc[:, 1] / z + cy
        ok = (z > 0.1) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        if drop_rate > 0:
            ok &= rng.uniform(size=num_landmarks) > drop_rate
        idx = np.nonzero(ok)[0]
        obs_cam.append(np.full(idx.shape, c, np.int32))
        obs_lm.append(idx.astype(np.int32))
        uv = np.stack([u[idx], v[idx]], -1)
        if pixel_noise > 0:
            uv = uv + rng.normal(0, pixel_noise, uv.shape)
        obs_uv.append(uv)

    obs_cam = np.concatenate(obs_cam)
    obs_lm = np.concatenate(obs_lm)
    obs_uv = np.concatenate(obs_uv).astype(np.float32)

    poses_init = poses_gt + rng.normal(0, pose_noise, poses_gt.shape)
    poses_init[0] = poses_gt[0]                  # gauge camera stays exact
    if num_cameras > 1:
        poses_init[1] = poses_gt[1]              # monocular scale gauge
    landmarks_init = X + rng.normal(0, landmark_noise, X.shape)

    return dict(
        poses_gt=poses_gt.astype(np.float32),
        landmarks_gt=X.astype(np.float32),
        poses_init=poses_init.astype(np.float32),
        landmarks_init=landmarks_init.astype(np.float32),
        intrinsics=np.asarray(intrinsics, np.float32),
        obs_cam=obs_cam, obs_lm=obs_lm, obs_uv=obs_uv,
        obs_valid=np.ones(obs_cam.shape[0], bool),
        image_size=image_size,
    )


def pad_observations(scene: dict, capacity: int) -> dict:
    """Pad observation arrays to a fixed capacity (static shapes)."""
    o = scene["obs_cam"].shape[0]
    assert capacity >= o, (capacity, o)
    pad = capacity - o
    out = dict(scene)
    out["obs_cam"] = np.pad(scene["obs_cam"], (0, pad))
    out["obs_lm"] = np.pad(scene["obs_lm"], (0, pad))
    out["obs_uv"] = np.pad(scene["obs_uv"], ((0, pad), (0, 0)))
    out["obs_valid"] = np.pad(scene["obs_valid"], (0, pad))
    return out
