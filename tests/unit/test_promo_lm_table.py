"""Device-side promotion-bookkeeping replay == host bookkeeping.

The multi-promotion chunk tracker reconstructs the first promoted
frame's per-keypoint landmark table ON DEVICE from its `_kf_track_body`
payload (`_promo_lm_table`) so the second promotion can guided-match
against it without a host round trip. This pins the replay against the
host-side rules in `_promote_keyframe`: inlier 2D-3D matches adopt the
ref keyframe's landmark, good no-landmark triangulations spawn one,
with 2D-3D assignments first (host numpy fancy-assignment order)."""

import numpy as np
import jax.numpy as jnp

from sift_tpu.config import PipelineConfig
from sift_tpu.slam.pipeline import SfmPipeline


def _payload(M, ia, ib, mvalid, inl, tri_good, X):
    """Assemble a minimal `_kf_track_body`-layout payload."""
    pay = np.zeros(8 * M + 8, np.float32)
    pay[0:M] = ia
    pay[M:2 * M] = ib
    pay[2 * M:3 * M] = mvalid
    pay[3 * M:4 * M] = inl
    tri = np.zeros((M, 4), np.float32)
    tri[:, :3] = X
    tri[:, 3] = tri_good
    pay[4 * M:8 * M] = tri.reshape(-1)
    return pay


def test_promo_lm_table_matches_host_rules():
    cfg = PipelineConfig()
    M = cfg.match.max_matches
    N = 16
    pipe = SfmPipeline((100.0, 100.0, 50.0, 50.0), cfg,
                       frontend=lambda g: None)

    rng = np.random.default_rng(0)
    lms_kf = rng.standard_normal((N, 3)).astype(np.float32)
    has_kf = np.zeros(N, bool)
    has_kf[[1, 4, 7]] = True

    ia = np.zeros(M, np.int32)
    ib = np.zeros(M, np.int32)
    mvalid = np.zeros(M, np.float32)
    inl = np.zeros(M, np.float32)
    tri_good = np.zeros(M, np.float32)
    X = np.zeros((M, 3), np.float32)

    # Row 0: inlier 2D-3D (ref slot 1 has a landmark) -> slot 3 adopts.
    ia[0], ib[0], mvalid[0], inl[0] = 1, 3, 1, 1
    # Row 1: valid match, no ref landmark, good triangulation -> slot 5.
    ia[1], ib[1], mvalid[1], tri_good[1] = 2, 5, 1, 1
    X[1] = [1.0, 2.0, 3.0]
    # Row 2: valid match with ref landmark but NOT an inlier -> nothing.
    ia[2], ib[2], mvalid[2] = 4, 6, 1
    # Row 3: good-tri flag but targeting the same slot as an inlier
    # adoption (collision): triangulation is assigned AFTER 2D-3D on the
    # host, so the triangulated point wins.
    ia[3], ib[3], mvalid[3], tri_good[3] = 9, 3, 1, 1
    X[3] = [-1.0, -2.0, -3.0]

    pay = _payload(M, ia, ib, mvalid, inl, tri_good, X)

    import jax

    # Host-side expectation (the _promote_keyframe rules):
    pos_h = np.zeros((N, 3), np.float32)
    has_h = np.zeros(N, bool)
    take = (inl > 0) & has_kf[ia]
    pos_h[ib[take]] = lms_kf[ia[take]]
    has_h[ib[take]] = True
    good = tri_good > 0.5
    pos_h[ib[good]] = X[good]
    has_h[ib[good]] = True

    fn = pipe._promo_lm_table_for_tests
    pos_d, has_d = jax.jit(fn, static_argnums=3)(
        jnp.asarray(pay), jnp.asarray(lms_kf), jnp.asarray(has_kf), N)
    np.testing.assert_array_equal(np.asarray(has_d), has_h)
    np.testing.assert_allclose(np.asarray(pos_d)[has_h], pos_h[has_h],
                               atol=1e-6)
