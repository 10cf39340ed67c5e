"""Homography decomposition on synthetic planar scenes (where the essential
matrix is degenerate and H is the right bootstrap model)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from sift_tpu.config import RansacConfig
from sift_tpu.geometry.homography import (
    fit_homography, ransac_homography, decompose_homography)


def _planar_scene(rng, n=120, noise=0.0):
    """Points on the plane n^T X = d; camera A at origin, B displaced."""
    n_plane = np.array([0.1, -0.05, 1.0])
    n_plane /= np.linalg.norm(n_plane)
    d = 8.0
    # sample points on the plane inside the A-frustum
    xy = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n)], -1)
    z = (d - xy @ n_plane[:2]) / n_plane[2]
    X = np.concatenate([xy, z[:, None]], -1)

    R = Rotation.from_rotvec([0.02, 0.12, -0.01]).as_matrix()
    t = np.array([0.6, 0.1, 0.15])
    t_unit = t / np.linalg.norm(t)

    xa = X[:, :2] / X[:, 2:]
    Xb = X @ R.T + t
    xb = Xb[:, :2] / Xb[:, 2:]
    if noise:
        xa = xa + rng.normal(0, noise, xa.shape)
        xb = xb + rng.normal(0, noise, xb.shape)
    return (xa.astype(np.float32), xb.astype(np.float32),
            R.astype(np.float32), t_unit.astype(np.float32),
            n_plane.astype(np.float32))


def test_decomposition_recovers_planar_pose():
    rng = np.random.default_rng(0)
    xa, xb, R_true, t_true, n_true = _planar_scene(rng)
    H = fit_homography(jnp.asarray(xa), jnp.asarray(xb))
    R, t, n, good = decompose_homography(
        H, jnp.asarray(xa), jnp.asarray(xb),
        jnp.ones(xa.shape[0], jnp.float32))
    assert int(good) > 0.9 * xa.shape[0]
    np.testing.assert_allclose(np.asarray(R), R_true, atol=5e-3)
    assert abs(float(jnp.dot(t, jnp.asarray(t_true)))) > 0.999
    # plane normal up to sign
    assert abs(float(jnp.dot(n, jnp.asarray(n_true)))) > 0.99


def test_ransac_h_plus_decomposition_with_outliers():
    rng = np.random.default_rng(1)
    xa, xb, R_true, t_true, _ = _planar_scene(rng, n=200, noise=5e-4)
    out = rng.choice(200, 50, replace=False)
    xb[out] = rng.uniform(-0.4, 0.4, (50, 2)).astype(np.float32)

    # thresholds are in normalized units here (focal=1): scale accordingly
    cfg = RansacConfig(num_hypotheses=512, inlier_threshold=2.0 / 500.0)
    est = ransac_homography(jax.random.PRNGKey(0), jnp.asarray(xa),
                            jnp.asarray(xb), jnp.ones(200, bool), cfg)
    assert bool(est.success)
    R, t, n, good = decompose_homography(
        est.model, jnp.asarray(xa), jnp.asarray(xb),
        est.inliers.astype(jnp.float32))
    dR = Rotation.from_matrix(np.asarray(R) @ R_true.T).magnitude()
    assert dR < np.radians(1.0)
    assert abs(float(jnp.dot(t, jnp.asarray(t_true)))) > 0.995