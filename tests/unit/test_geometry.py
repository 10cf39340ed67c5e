"""Two-view geometry property tests on synthetic scenes with planted outliers
(the test strategy SURVEY.md §4 prescribes for the missing subsystems)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from sift_tpu.config import RansacConfig
from sift_tpu.geometry.homography import (
    fit_homography, symmetric_transfer_error, ransac_homography)
from sift_tpu.geometry.epipolar import (
    fit_fundamental_8pt, sampson_error, ransac_essential,
    decompose_essential, refine_relative_pose, estimate_relative_pose)
from sift_tpu.geometry.triangulation import triangulate_dlt


def _apply_h_np(H, p):
    ph = np.concatenate([p, np.ones_like(p[:, :1])], -1) @ H.T
    return ph[:, :2] / ph[:, 2:]


def test_fit_homography_exact():
    rng = np.random.default_rng(0)
    H_true = np.array([[1.1, 0.02, 5.0], [-0.03, 0.95, -3.0],
                       [1e-4, -2e-4, 1.0]])
    pa = rng.uniform(0, 500, (32, 2)).astype(np.float32)
    pb = _apply_h_np(H_true, pa).astype(np.float32)
    H = np.asarray(fit_homography(jnp.asarray(pa), jnp.asarray(pb)))
    err = np.asarray(symmetric_transfer_error(
        jnp.asarray(H), jnp.asarray(pa), jnp.asarray(pb)))
    assert err.max() < 1e-2


def test_ransac_homography_with_outliers():
    rng = np.random.default_rng(1)
    H_true = np.array([[0.9, 0.05, 20.0], [-0.02, 1.05, -10.0],
                       [1e-4, 5e-5, 1.0]])
    n, n_out = 200, 80
    pa = rng.uniform(0, 500, (n, 2)).astype(np.float32)
    pb = _apply_h_np(H_true, pa).astype(np.float32)
    pb += rng.normal(0, 0.3, pb.shape).astype(np.float32)   # inlier noise
    out_idx = rng.choice(n, n_out, replace=False)
    pb[out_idx] = rng.uniform(0, 500, (n_out, 2)).astype(np.float32)
    valid = np.ones(n, bool)

    cfg = RansacConfig(num_hypotheses=256, inlier_threshold=2.0)
    est = ransac_homography(jax.random.PRNGKey(0), jnp.asarray(pa),
                            jnp.asarray(pb), jnp.asarray(valid), cfg)
    assert bool(est.success)
    inl = np.asarray(est.inliers)
    # Recovers (almost) all true inliers, admits (almost) no outliers.
    true_inlier = np.ones(n, bool)
    true_inlier[out_idx] = False
    assert (inl & true_inlier).sum() >= 0.95 * true_inlier.sum()
    assert (inl & ~true_inlier).sum() <= 3


def _synthetic_two_view(rng, n=200, noise=0.0):
    """Random scene: camera A at origin, camera B displaced; returns
    normalized coords and ground-truth (R, t)."""
    R = Rotation.from_rotvec(rng.normal(0, 0.1, 3) + [0.0, 0.15, 0.0]).as_matrix()
    t = np.array([0.5, 0.05, 0.1])
    t = t / np.linalg.norm(t)
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(4, 10, n)], -1)
    xa = X[:, :2] / X[:, 2:]
    Xb = X @ R.T + t
    xb = Xb[:, :2] / Xb[:, 2:]
    if noise:
        xa = xa + rng.normal(0, noise, xa.shape)
        xb = xb + rng.normal(0, noise, xb.shape)
    return (xa.astype(np.float32), xb.astype(np.float32),
            R.astype(np.float32), t.astype(np.float32))


def test_fundamental_8pt_exact():
    rng = np.random.default_rng(2)
    xa, xb, R, t = _synthetic_two_view(rng)
    E = np.asarray(fit_fundamental_8pt(jnp.asarray(xa), jnp.asarray(xb),
                                       essential=True))
    err = np.asarray(sampson_error(jnp.asarray(E), jnp.asarray(xa),
                                   jnp.asarray(xb)))
    # float32 eigensolver floor (~1e-4 in normalized coords); the nonlinear
    # refinement below this test recovers full accuracy.
    assert err.max() < 5e-4


def test_essential_decomposition_recovers_pose():
    rng = np.random.default_rng(3)
    xa, xb, R_true, t_true = _synthetic_two_view(rng)
    w = jnp.ones(xa.shape[0], jnp.float32)
    E = fit_fundamental_8pt(jnp.asarray(xa), jnp.asarray(xb), essential=True)
    R, t, ngood = decompose_essential(E, jnp.asarray(xa), jnp.asarray(xb), w)
    assert int(ngood) >= 0.99 * xa.shape[0]
    # Linear init is within a few degrees; GN polish reaches f32 accuracy.
    R, t = refine_relative_pose(R, t, jnp.asarray(xa), jnp.asarray(xb), w)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-3)
    # t recovered up to scale (unit norm in both).
    np.testing.assert_allclose(np.abs(np.asarray(t) @ t_true), 1.0, atol=1e-3)


def test_ransac_essential_with_outliers():
    rng = np.random.default_rng(4)
    xa, xb, R_true, t_true = _synthetic_two_view(rng, n=300, noise=5e-4)
    out = rng.choice(300, 90, replace=False)
    xb[out] = rng.uniform(-0.5, 0.5, (90, 2)).astype(np.float32)

    # Normalized coords: threshold in "pixels" with focal=500.
    cfg = RansacConfig(num_hypotheses=512, inlier_threshold=2.0)
    R, t, est = estimate_relative_pose(
        jax.random.PRNGKey(1), jnp.asarray(xa), jnp.asarray(xb),
        jnp.ones(300, bool), cfg, focal=500.0)
    assert bool(est.success)
    # Rotation within ~1 degree; translation direction within ~2 degrees.
    dR = Rotation.from_matrix(np.asarray(R) @ R_true.T).magnitude()
    assert dR < np.radians(1.0)
    cos = abs(np.asarray(t) @ t_true)
    assert cos > np.cos(np.radians(2.0))


def test_triangulation_recovers_points():
    rng = np.random.default_rng(5)
    xa, xb, R, t = _synthetic_two_view(rng, n=100)
    P1 = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
    P2 = np.concatenate([R, t[:, None]], 1).astype(np.float32)
    X = np.asarray(triangulate_dlt(jnp.asarray(P1), jnp.asarray(P2),
                                   jnp.asarray(xa), jnp.asarray(xb)))
    # Reproject and compare.
    proj_a = X[:, :2] / X[:, 2:]
    np.testing.assert_allclose(proj_a, xa, atol=1e-4)
    Xb = X @ R.T + t
    proj_b = Xb[:, :2] / Xb[:, 2:]
    np.testing.assert_allclose(proj_b, xb, atol=1e-4)


# ----------------------------------------------------------- 5-point solver

def test_fit_essential_5pt_exact_minimal():
    """The ground-truth essential matrix is among the candidates produced
    from exactly 5 noise-free correspondences."""
    from sift_tpu.geometry.epipolar import fit_essential_5pt
    rng = np.random.default_rng(11)
    xa, xb, R, t = _synthetic_two_view(rng, n=5)
    E_gt = np.cross(t, R, axisa=0, axisb=0).T    # [t]x R
    E_gt /= np.linalg.norm(E_gt)

    E, ok = jax.jit(fit_essential_5pt)(jnp.asarray(xa), jnp.asarray(xb))
    E, ok = np.asarray(E), np.asarray(ok)
    assert ok.any()
    best = min(min(np.abs(E[i] - E_gt).max(), np.abs(E[i] + E_gt).max())
               for i in range(10) if ok[i])
    assert best < 5e-3, best
    # Every valid candidate satisfies the 5 constraints exactly.
    for i in range(10):
        if ok[i]:
            err = np.asarray(sampson_error(jnp.asarray(E[i]),
                                           jnp.asarray(xa), jnp.asarray(xb)))
            assert err.max() < 1e-6


def test_ransac_5pt_beats_8pt_at_high_outlier_rate():
    """Minimal samples survive outlier rates that starve 8-point samples:
    at 40% outliers and a small hypothesis budget the 5-point RANSAC must
    recover (nearly) all true inliers."""
    from sift_tpu.geometry.epipolar import (ransac_essential_5pt,
                                            ransac_essential)
    rng = np.random.default_rng(12)
    n = 200
    xa, xb, R, t = _synthetic_two_view(rng, n=n, noise=1e-3)
    out = rng.choice(n, 80, replace=False)
    xb[out] = rng.uniform(-0.5, 0.5, (80, 2)).astype(np.float32)

    cfg = RansacConfig(num_hypotheses=128, inlier_threshold=2.0)
    key = jax.random.PRNGKey(3)
    e5 = ransac_essential_5pt(key, jnp.asarray(xa), jnp.asarray(xb),
                              jnp.ones(n, bool), cfg, focal=500.0)
    e8 = ransac_essential(key, jnp.asarray(xa), jnp.asarray(xb),
                          jnp.ones(n, bool), cfg, focal=500.0)
    assert int(e5.num_inliers) >= 110          # 120 true inliers
    assert int(e5.num_inliers) >= int(e8.num_inliers)


def test_estimate_relative_pose_5pt_default():
    """estimate_relative_pose with the default (5pt) solver recovers the
    pose to the same tolerance as the 8pt test above."""
    rng = np.random.default_rng(13)
    xa, xb, R_true, t_true = _synthetic_two_view(rng, n=300, noise=5e-4)
    out = rng.choice(300, 90, replace=False)
    xb[out] = rng.uniform(-0.5, 0.5, (90, 2)).astype(np.float32)

    cfg = RansacConfig(num_hypotheses=256, inlier_threshold=2.0)
    assert cfg.essential_solver == "5pt"
    R, t, est = estimate_relative_pose(
        jax.random.PRNGKey(4), jnp.asarray(xa), jnp.asarray(xb),
        jnp.ones(300, bool), cfg, focal=500.0)
    assert bool(est.success)
    dR = Rotation.from_matrix(np.asarray(R) @ R_true.T).magnitude()
    assert dR < np.radians(1.0)
    assert abs(np.asarray(t) @ t_true) > np.cos(np.radians(2.0))
