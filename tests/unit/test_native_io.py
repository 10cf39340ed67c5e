"""Native (C++) decoder vs PIL oracle; prefetching loader ordering."""

import os

import numpy as np
import pytest

from sift_tpu.io.image import load_image_gray, save_image_gray
from sift_tpu.io import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native IO library not built")

PARROT = "/root/reference/example/parrot.jpg"


def test_png_decode_matches_pil(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (37, 53)).astype(np.float32)
    p = str(tmp_path / "t.png")
    save_image_gray(p, img)
    a = load_image_gray(p)
    b = native.load_image_gray_native(p)
    assert b is not None and b.shape == a.shape
    np.testing.assert_allclose(b, a, atol=1e-4)   # both lossless gray8


def test_rgb_png_luminance_matches_pil(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (25, 31, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(rgb, "RGB").save(p)
    a = load_image_gray(p)
    b = native.load_image_gray_native(p)
    np.testing.assert_allclose(b, a, atol=1e-3)


@pytest.mark.skipif(not os.path.exists(PARROT), reason="no reference image")
def test_jpeg_decode_close_to_pil():
    a = load_image_gray(PARROT)
    b = native.load_image_gray_native(PARROT)
    assert b is not None and b.shape == a.shape
    # Different IDCT implementations may differ by a couple of levels.
    assert np.abs(a - b).mean() < 1.0
    assert np.abs(a - b).max() <= 4.0


def test_16bit_png_depth(tmp_path):
    from PIL import Image
    depth = (np.arange(12, dtype=np.uint16).reshape(3, 4) * 1000)
    p = str(tmp_path / "d.png")
    Image.fromarray(depth).save(p)
    b = native.load_image_gray_native(p)
    np.testing.assert_allclose(b, depth.astype(np.float32), atol=0.5)


def test_prefetch_loader_order_and_content(tmp_path):
    rng = np.random.default_rng(2)
    paths, imgs = [], []
    for i in range(10):
        img = rng.uniform(0, 255, (16 + i, 20)).astype(np.float32)
        p = str(tmp_path / f"f{i:03d}.png")
        save_image_gray(p, img)
        paths.append(p)
        imgs.append(load_image_gray(p))
    out = list(native.NativeLoader(paths, threads=3, queue_cap=4))
    assert len(out) == 10
    for got, want in zip(out, imgs):
        np.testing.assert_allclose(got, want, atol=1e-4)
