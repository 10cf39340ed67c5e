"""Golden-file parity regression: the JAX parity pipeline must reproduce the
recorded reference-simulator outputs exactly (keypoint sets, scales,
descriptors). Unlike the live refsim comparison, this pins behaviour across
refactors of BOTH implementations — co-drift cannot pass silently."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sift_tpu.config import SiftConfig
from sift_tpu.frontend.sift import extract

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_refsim.npz")

CASES = [("s0_sub0", False), ("s1_sub0", False), ("s5_sub1", True)]


@pytest.mark.parametrize("key,subpixel", CASES)
def test_parity_matches_golden(key, subpixel):
    z = np.load(GOLDEN)
    img = z[f"{key}_img"]
    want_kp = z[f"{key}_kp"]
    want_desc = z[f"{key}_desc"]

    cfg = SiftConfig(mode="parity", subpixel=subpixel,
                     max_keypoints_per_octave=256, max_keypoints=1024)
    kp = jax.jit(lambda x: extract(x, cfg))(jnp.asarray(img))
    v = np.asarray(kp.valid)

    ours = {}
    for i in np.nonzero(v)[0]:
        k = (int(np.asarray(kp.octave)[i]), int(np.asarray(kp.level)[i]),
             int(np.asarray(kp.x)[i]), int(np.asarray(kp.y)[i]))
        ours[k] = dict(scale=float(np.asarray(kp.scale)[i]),
                       desc=np.asarray(kp.desc)[i])

    theirs = {}
    for row, desc in zip(want_kp, want_desc):
        theirs[(int(row[0]), int(row[1]), int(row[2]), int(row[3]))] = \
            dict(scale=row[4], desc=desc)

    assert set(ours) == set(theirs), (
        f"ours-only={set(ours) - set(theirs)} "
        f"golden-only={set(theirs) - set(ours)}")
    assert len(theirs) > 0
    for k in theirs:
        np.testing.assert_allclose(ours[k]["scale"], theirs[k]["scale"],
                                   atol=1e-4)
        np.testing.assert_allclose(ours[k]["desc"], theirs[k]["desc"],
                                   rtol=1e-3, atol=2e-3)
