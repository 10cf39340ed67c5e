"""Image decode/encode (host side).

The reference imports images with ``vigra::importImage`` into a grayscale
``MultiArray<2, f32_t>`` in [0, 255] (``/root/reference/main.cpp:52-54``);
Vigra converts RGB to luminance with the ITU-R BT.601 weights
(0.299, 0.587, 0.114). We reproduce that exactly with a float dot product
(PIL's own ``convert("L")`` rounds to uint8, losing precision, so we do the
weighting ourselves on float64 and only then cast).

Coordinate convention matches `sift_tpu.types`: arrays are (H, W) row-major;
`x` indexes width (axis 1), `y` height (axis 0).
"""

from __future__ import annotations

import numpy as np

# BT.601 luminance weights (vigra RGBToGrayAccessor).
_LUMA = np.array([0.299, 0.587, 0.114], np.float64)


def load_image_gray(path: str, dtype=np.float32,
                    allow_uint8: bool = False) -> np.ndarray:
    """Decode an image file to a grayscale (H, W) float array in [0, 255].

    `allow_uint8`: return 8-bit grayscale sources (PIL mode "L" — e.g.
    KITTI frames) as uint8 instead of float. Lossless — the pipeline
    casts to f32 on DEVICE, and shipping 1-byte pixels quarters the
    host->device transfer that dominates the SLAM loop on remote
    backends (BENCH.md round-2 upload finding). RGB sources still
    return float (the luma projection is fractional).
    """
    from PIL import Image

    with Image.open(path) as im:
        if im.mode in ("I;16", "I"):
            arr = np.asarray(im, np.float64)
            # 16-bit images (e.g. TUM depth) are returned in native range.
            return arr.astype(dtype)
        if im.mode == "L" and allow_uint8:
            return np.asarray(im)                   # (H, W) uint8
        if im.mode not in ("RGB", "L", "F"):
            im = im.convert("RGB")
        arr = np.asarray(im, np.float64)
    if arr.ndim == 3:
        arr = arr[..., :3] @ _LUMA
    return arr.astype(dtype)


def save_image_gray(path: str, img: np.ndarray) -> None:
    """Write a (H, W) float array in [0, 255] as an 8-bit grayscale file."""
    from PIL import Image

    arr = np.clip(np.asarray(img), 0.0, 255.0).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(path)


def save_image_rgb(path: str, img: np.ndarray) -> None:
    """Write a (H, W, 3) uint8/float array as an RGB file."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0.0, 255.0).astype(np.uint8)
    Image.fromarray(arr, mode="RGB").save(path)
