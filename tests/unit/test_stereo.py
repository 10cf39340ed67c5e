"""Stereo keypoint depth tests (synthetic rectified pairs)."""

import numpy as np
import jax.numpy as jnp

from sift_tpu.types import Keypoints
from sift_tpu.matching.stereo import stereo_depths

FX, BASELINE = 700.0, 0.54    # KITTI-ish


def _kp(u, v, desc, valid=None):
    n = u.shape[0]
    return Keypoints(
        x=jnp.asarray(u, jnp.float32), y=jnp.asarray(v, jnp.float32),
        octave=jnp.zeros(n, jnp.int32), level=jnp.zeros(n, jnp.int32),
        scale=jnp.ones(n), score=jnp.ones(n), orientation=jnp.zeros(n),
        valid=jnp.asarray(np.ones(n, bool) if valid is None else valid),
        desc=jnp.asarray(desc, jnp.float32))


def test_recovers_planted_depths():
    rng = np.random.default_rng(0)
    n = 64
    depth = rng.uniform(4.0, 40.0, n)
    disp = FX * BASELINE / depth
    ul = rng.uniform(200, 1000, n)
    vl = rng.uniform(20, 350, n)
    codes = rng.standard_normal((n, 128)).astype(np.float32)
    codes /= np.linalg.norm(codes, axis=-1, keepdims=True)

    perm = rng.permutation(n)
    kp_l = _kp(ul, vl, codes)
    kp_r = _kp((ul - disp)[perm], vl[perm] + rng.normal(0, 0.3, n),
               codes[perm] + 0.02 * rng.standard_normal((n, 128)).astype(np.float32))

    got = np.asarray(stereo_depths(kp_l, kp_r, FX, BASELINE))
    ok = got > 0
    assert ok.mean() > 0.9
    np.testing.assert_allclose(got[ok], depth[ok], rtol=0.02)


def test_row_and_disparity_gates():
    rng = np.random.default_rng(1)
    codes = rng.standard_normal((4, 128)).astype(np.float32)
    # left kps; right counterparts violate constraints
    kp_l = _kp(np.array([500.0, 500.0, 500.0, 500.0]),
               np.array([100.0, 120.0, 140.0, 160.0]), codes)
    kp_r = _kp(
        np.array([480.0, 505.0, 250.0, 480.0]),   # 1: negative disparity
        np.array([100.0, 120.0, 140.0, 190.0]),   # 3: row mismatch
        codes)                                     # 2: disparity 250 > max
    got = np.asarray(stereo_depths(kp_l, kp_r, FX, BASELINE,
                                   max_disparity=192.0))
    assert got[0] > 0                   # valid match
    assert got[1] == 0 and got[2] == 0 and got[3] == 0


def test_invalid_masks():
    rng = np.random.default_rng(2)
    codes = rng.standard_normal((8, 128)).astype(np.float32)
    valid = np.ones(8, bool)
    valid[:4] = False
    kp_l = _kp(np.full(8, 500.0), np.arange(8.0) * 30, codes, valid)
    kp_r = _kp(np.full(8, 480.0), np.arange(8.0) * 30, codes)
    got = np.asarray(stereo_depths(kp_l, kp_r, FX, BASELINE))
    assert (got[:4] == 0).all()
    assert (got[4:] > 0).all()
