"""extract_lowe_batched (the batch-flattened production path) must be
equivalent to vmap(extract_lowe) — same valid sets, same keypoints and
descriptors up to batched-convolution float reassociation.

The flattened path exists purely for TPU lowering (vmapped per-keypoint
stages measured 2.35x/image slower than the same math flattened to
(B*K,); BENCH.md round 4) — it must never drift semantically. Small
frames keep the test fast; two sizes exercise both the normal and the
clamped-window (tiny top octave, padded canvas) code paths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sift_tpu.config import SiftConfig
from sift_tpu.frontend.sift import extract, extract_batch, extract_lowe_batched


def _frames(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (128 + 60 * np.sin(xx / 5.0) * np.cos(yy / 7.0)
            + 40 * rng.standard_normal((b, h, w))).clip(0, 255)
    return jnp.asarray(base.astype(np.float32))


@pytest.mark.parametrize("hw", [(96, 128), (72, 96)])
def test_batched_equals_vmapped(hw):
    h, w = hw
    cfg = SiftConfig(mode="lowe", octaves=3, max_keypoints=256,
                     max_keypoints_per_octave=128)
    imgs = _frames(3, h, w)
    ref = jax.jit(jax.vmap(lambda im: extract(im, cfg, True)))(imgs)
    new = jax.jit(lambda im: extract_lowe_batched(im, cfg, True))(imgs)

    rv = np.asarray(ref.valid)
    nv = np.asarray(new.valid)
    np.testing.assert_array_equal(rv, nv)
    m = rv & nv
    for f in ("x", "y", "octave", "level", "scale", "score", "orientation"):
        a = np.asarray(getattr(ref, f), np.float64)
        b = np.asarray(getattr(new, f), np.float64)
        assert np.abs(np.where(m, a - b, 0)).max() < 2e-3, f
    dd = np.abs(np.asarray(ref.desc) - np.asarray(new.desc))
    assert np.abs(np.where(m[..., None], dd, 0)).max() < 1e-3
    np.testing.assert_array_equal(np.asarray(ref.n_dropped),
                                  np.asarray(new.n_dropped))
    np.testing.assert_array_equal(np.asarray(ref.n_cand_pruned),
                                  np.asarray(new.n_cand_pruned))


def test_extract_batch_routes_modes():
    """lowe mode routes to the flattened path; parity keeps the exact
    per-image vmap (bit-exact goldens depend on it)."""
    imgs = _frames(2, 64, 96)
    kp = extract_batch(imgs, SiftConfig(mode="lowe", octaves=2,
                                        max_keypoints=128,
                                        max_keypoints_per_octave=64), True)
    assert kp.x.shape[0] == 2
    kp_p = extract_batch(imgs, SiftConfig(mode="parity", octaves=2,
                                          max_keypoints=128,
                                          max_keypoints_per_octave=64), True)
    assert kp_p.x.shape[0] == 2
