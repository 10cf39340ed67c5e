"""Property tests for the lowe-mode (production) SIFT frontend."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from sift_tpu.config import SiftConfig
from sift_tpu.frontend.sift import extract, extract_batch

CFG = SiftConfig(mode="lowe", max_keypoints_per_octave=256, max_keypoints=512)


def blob_image(h=96, w=96, centers=((48, 48),), sigma=4.0, amp=255.0):
    """Bright Gaussian blobs on a dark background."""
    img = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for (cy, cx) in centers:
        img += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma ** 2))
    return img


def textured_image(h=128, w=128, seed=0):
    rng = np.random.RandomState(seed)
    img = ndi.gaussian_filter(rng.rand(h, w), 1.5)
    img -= img.min()
    return (img / img.max() * 255.0).astype(np.float32)


@pytest.fixture(scope="module")
def extract_fn():
    return jax.jit(lambda im: extract(im, CFG))


class TestDetection:
    def test_blob_detected_at_center(self, extract_fn):
        img = blob_image(centers=((48, 48),), sigma=3.0)
        kp = extract_fn(jnp.asarray(img))
        v = np.asarray(kp.valid)
        assert v.any(), "no keypoints on a clean blob"
        xs, ys = kp.to_image_xy()
        xs, ys = np.asarray(xs)[v], np.asarray(ys)[v]
        score = np.asarray(kp.score)[v]
        best = np.argmax(score)
        assert abs(xs[best] - 48) < 2.0 and abs(ys[best] - 48) < 2.0

    def test_multiple_blobs(self, extract_fn):
        centers = [(30, 30), (30, 70), (70, 30), (70, 70)]
        img = blob_image(centers=centers, sigma=3.0)
        kp = extract_fn(jnp.asarray(img))
        v = np.asarray(kp.valid)
        xs, ys = kp.to_image_xy()
        xs, ys = np.asarray(xs)[v], np.asarray(ys)[v]
        for (cy, cx) in centers:
            d = np.hypot(xs - cx, ys - cy)
            assert d.min() < 2.5, f"blob at {(cy, cx)} missed"

    def test_blank_image_no_keypoints(self, extract_fn):
        img = np.full((96, 96), 128.0, np.float32)
        kp = extract_fn(jnp.asarray(img))
        assert int(kp.count()) == 0

    def test_scale_grows_with_blob_size(self, extract_fn):
        scales = []
        for s in [2.5, 5.0]:
            kp = extract_fn(jnp.asarray(blob_image(sigma=s)))
            v = np.asarray(kp.valid)
            best = np.argmax(np.asarray(kp.score)[v])
            scales.append(np.asarray(kp.scale)[v][best])
        assert scales[1] > scales[0]


class TestDescriptors:
    def test_unit_norm(self, extract_fn):
        kp = extract_fn(jnp.asarray(textured_image()))
        v = np.asarray(kp.valid)
        norms = np.linalg.norm(np.asarray(kp.desc)[v], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    def test_component_clamp(self, extract_fn):
        kp = extract_fn(jnp.asarray(textured_image()))
        v = np.asarray(kp.valid)
        # after clamping at 0.2 and renormalizing, components stay moderate
        assert np.asarray(kp.desc)[v].max() < 0.3

    def test_translation_covariance(self, extract_fn):
        """Shifting the image shifts keypoints; descriptors stay put."""
        img = textured_image(seed=3)
        shift = 8
        img2 = np.roll(img, (shift, shift), axis=(0, 1))
        kp1 = extract_fn(jnp.asarray(img))
        kp2 = extract_fn(jnp.asarray(img2))
        v1, v2 = np.asarray(kp1.valid), np.asarray(kp2.valid)
        x1, y1 = np.asarray(kp1.x)[v1], np.asarray(kp1.y)[v1]
        d1 = np.asarray(kp1.desc)[v1]
        o1 = np.asarray(kp1.octave)[v1]
        x2, y2 = np.asarray(kp2.x)[v2], np.asarray(kp2.y)[v2]
        d2 = np.asarray(kp2.desc)[v2]
        o2 = np.asarray(kp2.octave)[v2]
        matched = 0
        for i in range(len(x1)):
            if o1[i] != 0:
                continue
            sh = shift
            j = np.where((o2 == 0) & (np.abs(x2 - x1[i] - sh) < 1.0)
                         & (np.abs(y2 - y1[i] - sh) < 1.0))[0]
            if j.size:
                sim = (d1[i] * d2[j]).sum(-1).max()
                if sim > 0.9:
                    matched += 1
        assert matched >= 0.5 * max((o1 == 0).sum(), 1), (
            f"only {matched} of {(o1 == 0).sum()} interior keypoints matched")


class TestBatching:
    def test_extract_batch_shapes(self):
        imgs = jnp.asarray(np.stack([textured_image(seed=i) for i in range(3)]))
        kp = jax.jit(lambda x: extract_batch(x, CFG))(imgs)
        assert kp.x.shape == (3, CFG.max_keypoints)
        assert kp.desc.shape == (3, CFG.max_keypoints, 128)
        assert int(kp.count().min()) > 0

    def test_batch_matches_single(self):
        imgs = jnp.asarray(np.stack([textured_image(seed=i) for i in range(2)]))
        kb = jax.jit(lambda x: extract_batch(x, CFG))(imgs)
        k0 = jax.jit(lambda x: extract(x, CFG))(imgs[0])
        np.testing.assert_allclose(np.asarray(kb.x[0]), np.asarray(k0.x),
                                   rtol=1e-5, atol=1e-5)


def test_rootsift_descriptors():
    """RootSIFT: unit L2 norm (since sum of sqrt^2 = L1 sum = 1),
    non-negative, and matches on a shifted pair still work."""
    from sift_tpu.config import MatchConfig
    from sift_tpu.matching.matcher import match_descriptors

    img = textured_image(128, 128, seed=3)
    cfg = SiftConfig(mode="lowe", octaves=2, max_keypoints=128,
                     max_keypoints_per_octave=128, rootsift=True)
    kp1 = extract(jnp.asarray(img), cfg)
    kp2 = extract(jnp.asarray(np.roll(img, 3, axis=1)), cfg)
    v = np.asarray(kp1.valid)
    assert v.sum() > 10
    d = np.asarray(kp1.desc)[v]
    assert (d >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)
    m = match_descriptors(kp1.desc, kp1.valid, kp2.desc, kp2.valid,
                          MatchConfig(max_matches=128))
    assert int(np.asarray(m.valid).sum()) > 10
