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
