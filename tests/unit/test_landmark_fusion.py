"""Landmark fusion bookkeeping (loop-closure map merge)."""

import numpy as np
import jax.numpy as jnp

from sift_tpu.config import PipelineConfig
from sift_tpu.slam.pipeline import SfmPipeline, Keyframe


def _mk_kf(n, frame, pose=None):
    kp = dict(x=np.zeros(n, np.float32), y=np.zeros(n, np.float32),
              valid=np.ones(n, bool), desc=np.zeros((n, 128), np.float32),
              octave=np.zeros(n, np.int32), u=np.zeros(n, np.float32),
              v=np.zeros(n, np.float32))
    return Keyframe(frame, pose if pose is not None
                    else np.zeros(6, np.float32), kp)


def test_fuse_adopt_and_merge():
    pipe = SfmPipeline((500.0, 500.0, 320.0, 240.0), PipelineConfig(),
                       frontend=lambda g: None)
    pipe.landmarks = np.arange(18, dtype=np.float32).reshape(6, 3)
    pipe.lm_ref_kf = np.zeros(6, np.int64)

    kf0 = _mk_kf(8, 0)
    kf0.kp_lm[:3] = [0, 1, 2]
    kf1 = _mk_kf(8, 1)
    kf1.kp_lm[0] = 4          # duplicate of old landmark 0
    kf1.kp_lm[1] = -1         # no landmark yet
    kf1.kp_lm[5] = 5          # duplicate of old landmark 2
    pipe.keyframes = [kf0, kf1]

    # Inlier pairs: new slots [0, 1, 5] correspond to old landmarks [0, 1, 2].
    pipe._fuse_loop_landmarks(kf1, np.asarray([0, 1, 5]),
                              np.asarray([0, 1, 2]))

    assert kf1.kp_lm[1] == 1                 # adopted
    assert kf1.kp_lm[0] == 0                 # duplicate 4 merged into 0
    assert kf1.kp_lm[5] == 2                 # duplicate 5 merged into 2
    # No keyframe references the orphaned duplicates anymore.
    for kf in pipe.keyframes:
        assert not np.isin(kf.kp_lm, [4, 5]).any()
    # Untouched associations stay.
    assert (kf0.kp_lm[:3] == [0, 1, 2]).all()


def test_fuse_deep_duplicate_chain():
    """Repeated closures over one region build long remap chains; the
    union-find fusion must resolve them at ANY depth (the old fixed-pass
    squash only handled depth <= 8)."""
    D = 24                      # chain depth, far past the old 8 limit
    pipe = SfmPipeline((500.0, 500.0, 320.0, 240.0), PipelineConfig(),
                       frontend=lambda g: None)
    pipe.landmarks = np.arange(3 * (D + 1), dtype=np.float32).reshape(-1, 3)
    pipe.lm_ref_kf = np.zeros(D + 1, np.int64)

    kf0 = _mk_kf(1, 0)
    kf0.kp_lm[0] = 0
    pipe.keyframes = [kf0]
    # Closure i says "landmark i+1 duplicates whatever the previous
    # keyframe now references" (old ids are always live ids in practice —
    # they are read from a keyframe's kp_lm after earlier remaps).
    for i in range(D):
        kf = _mk_kf(1, i + 1)
        kf.kp_lm[0] = i + 1
        pipe.keyframes.append(kf)
        old = int(pipe.keyframes[-2].kp_lm[0])
        pipe._fuse_loop_landmarks(kf, np.asarray([0]), np.asarray([old]))
    for kf in pipe.keyframes:
        assert kf.kp_lm[0] == 0, kf.kp_lm

    # And a single batch carrying one long chain (worst case for chain
    # resolution inside ONE call): pairs (1<-2), (2<-3), ... arrive
    # together in an order that builds the chain deepest-first.
    pipe2 = SfmPipeline((500.0, 500.0, 320.0, 240.0), PipelineConfig(),
                        frontend=lambda g: None)
    pipe2.landmarks = np.arange(3 * (D + 1), dtype=np.float32).reshape(-1, 3)
    pipe2.lm_ref_kf = np.zeros(D + 1, np.int64)
    kf0 = _mk_kf(D, 0)
    kf0.kp_lm[:] = np.arange(1, D + 1)       # slots carry lms 1..D
    pipe2.keyframes = [kf0]
    # Slot s (carrying lm s+1) matched old landmark s: dup pairs
    # (s+1 -> s) for s = D-1 .. 0, deepest link first.
    slots = np.arange(D)[::-1].copy()
    olds = np.arange(D)[::-1].copy()
    pipe2._fuse_loop_landmarks(kf0, slots, olds)
    assert (kf0.kp_lm == 0).all(), kf0.kp_lm


def test_compact_landmarks_drops_orphans_and_remaps():
    pipe = SfmPipeline((500.0, 500.0, 320.0, 240.0), PipelineConfig(),
                       frontend=lambda g: None)
    pipe.landmarks = np.arange(18, dtype=np.float32).reshape(6, 3)
    pipe.lm_ref_kf = np.asarray([0, 0, 0, 1, 1, 1], np.int64)

    kf0 = _mk_kf(8, 0)
    kf0.kp_lm[:3] = [0, 1, 2]
    kf1 = _mk_kf(8, 1)
    kf1.kp_lm[0] = 4
    kf1.kp_lm[5] = 5
    pipe.keyframes = [kf0, kf1]
    pipe._fuse_loop_landmarks(kf1, np.asarray([0, 5]), np.asarray([0, 2]))

    before = pipe.landmarks.copy()
    stats = pipe.compact_landmarks()
    assert stats == dict(kept=3, dropped=3)          # rows 3,4,5 orphaned
    assert pipe.landmarks.shape == (3, 3)
    assert pipe.lm_ref_kf.tolist() == [0, 0, 0]
    # Surviving rows keep their positions; references follow the remap.
    np.testing.assert_array_equal(pipe.landmarks, before[:3])
    assert kf0.kp_lm[:3].tolist() == [0, 1, 2]
    assert kf1.kp_lm[0] == 0 and kf1.kp_lm[5] == 2
    assert (kf1.kp_lm[[1, 2, 3, 4, 6, 7]] == -1).all()


def test_compact_min_refs_two_drops_singletons():
    pipe = SfmPipeline((500.0, 500.0, 320.0, 240.0), PipelineConfig(),
                       frontend=lambda g: None)
    pipe.landmarks = np.arange(9, dtype=np.float32).reshape(3, 3)
    pipe.lm_ref_kf = np.zeros(3, np.int64)
    kf0 = _mk_kf(4, 0)
    kf0.kp_lm[:3] = [0, 1, 2]
    kf1 = _mk_kf(4, 1)
    kf1.kp_lm[0] = 0           # landmark 0 is doubly observed
    pipe.keyframes = [kf0, kf1]

    stats = pipe.compact_landmarks(min_refs=2)
    assert stats == dict(kept=1, dropped=2)
    assert kf0.kp_lm[0] == 0 and (kf0.kp_lm[1:3] == -1).all()
    assert kf1.kp_lm[0] == 0
