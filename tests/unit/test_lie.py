"""SO(3)/SE(3) round-trip and algebraic property tests vs scipy oracle."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from sift_tpu.geometry import lie


def test_so3_exp_matches_scipy():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((32, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 3)).astype(np.float32)
    # Keep |w| < pi so log is unique.
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(
        0.0, 3.0, (64, 1)).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_log_small_angle():
    w = jnp.asarray([[1e-7, -2e-7, 5e-8], [0.0, 0.0, 0.0]], jnp.float32)
    w2 = np.asarray(lie.so3_log(lie.so3_exp(w)))
    np.testing.assert_allclose(w2, np.asarray(w), atol=1e-7)


def test_so3_log_near_pi():
    rng = np.random.default_rng(2)
    axis = rng.standard_normal((16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = (axis * 3.12).astype(np.float32)          # close to pi
    R = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(R))
    R2 = np.asarray(lie.so3_exp(jnp.asarray(w2)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


def test_se3_roundtrip_and_compose():
    rng = np.random.default_rng(3)
    xi = rng.standard_normal((32, 6)).astype(np.float32) * 0.8
    R, t = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)

    # inverse o itself = identity
    Ri, ti = lie.se3_inverse(R, t)
    Rc, tc = lie.se3_compose(Ri, ti, R, t)
    np.testing.assert_allclose(np.asarray(Rc),
                               np.tile(np.eye(3, dtype=np.float32), (32, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), np.zeros((32, 3)), atol=1e-5)


def test_transform_matches_matrix():
    rng = np.random.default_rng(4)
    xi = rng.standard_normal((6,)).astype(np.float32)
    x = rng.standard_normal((10, 3)).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    y = np.asarray(lie.transform(R, t, jnp.asarray(x)))
    T = np.asarray(lie.se3_matrix(jnp.asarray(xi)))
    xh = np.concatenate([x, np.ones((10, 1), np.float32)], -1)
    np.testing.assert_allclose(y, (xh @ T.T)[:, :3], atol=1e-5)


class TestNumpyMirror:
    """lie_np must match the JAX lie ops exactly (the SLAM host loop uses
    the numpy versions to avoid per-call device dispatch)."""

    def _random_xis(self, n=64, scale=1.0, seed=7):
        rng = np.random.default_rng(seed)
        return (rng.standard_normal((n, 6)) * scale).astype(np.float32)

    def test_se3_exp_log_roundtrip_matches_jax(self):
        from sift_tpu.geometry import lie_np
        for scale in (1e-6, 0.1, 1.0, 2.5):
            xi = self._random_xis(scale=scale)
            Rj, tj = lie.se3_exp(jnp.asarray(xi))
            Rn, tn = lie_np.se3_exp(xi)
            np.testing.assert_allclose(Rn, np.asarray(Rj), atol=1e-5)
            np.testing.assert_allclose(tn, np.asarray(tj), atol=1e-5)
            xj = np.asarray(lie.se3_log(Rj, tj))
            xn = lie_np.se3_log(Rn, tn)
            np.testing.assert_allclose(xn, xj, atol=1e-4)

    def test_boxplus_and_rel_pose_match_jax(self):
        from sift_tpu.geometry import lie_np
        xi = self._random_xis(seed=8)
        d = self._random_xis(seed=9, scale=0.05)
        want = np.asarray(lie.boxplus(jnp.asarray(xi), jnp.asarray(d)))
        got = lie_np.boxplus(xi, d)
        np.testing.assert_allclose(got, want, atol=1e-4)

        a, b = xi[:32], xi[32:]
        Ra, ta = lie.se3_exp(jnp.asarray(a))
        Rb, tb = lie.se3_exp(jnp.asarray(b))
        Rai, tai = lie.se3_inverse(Ra, ta)
        Rr, tr = lie.se3_compose(Rai, tai, Rb, tb)
        want = np.asarray(lie.se3_log(Rr, tr))
        got = lie_np.rel_pose(a, b)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_near_pi_rotations(self):
        from sift_tpu.geometry import lie_np
        rng = np.random.default_rng(11)
        axis = rng.standard_normal((16, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        w = (axis * (np.pi - 1e-4)).astype(np.float32)
        xi = np.concatenate([w, rng.standard_normal((16, 3)).astype(np.float32)], -1)
        Rn, tn = lie_np.se3_exp(xi)
        xn = lie_np.se3_log(Rn, tn)
        R2, t2 = lie_np.se3_exp(xn)
        np.testing.assert_allclose(R2, Rn, atol=1e-4)
        np.testing.assert_allclose(t2, tn, atol=1e-3)
