"""Shared helpers for the rebuilt-reference parity chain.

ONE home for the golden-critical logic that the generator
(tools/gen_golden.py) and every parity test must agree on byte-for-byte:
synthetic test-image synthesis, the Vigra-equivalent luma conversion for
parrot.jpg, and the build/run protocol of the reference binary rebuilt
against the Vigra shim (tools/refbuild/). Duplicating any of these would
let generator and verifier silently desynchronize.
"""

from __future__ import annotations

import math
import os
import struct
import subprocess
import tempfile
from typing import List, Tuple

import numpy as np
import scipy.ndimage as ndi

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
REFBUILD_DIR = os.path.join(REPO, "tools", "refbuild")
PARROT = "/root/reference/example/parrot.jpg"

# Keypoint row: (x, y, octave, level, scale, orientation, desc(128))
RefRow = Tuple[int, int, int, int, float, float, np.ndarray]


def smooth_image(h: int, w: int, seed: int = 0,
                 scale: float = 255.0) -> np.ndarray:
    """The parity suite's canonical synthetic image (seeded, smoothed,
    [0, scale])."""
    rng = np.random.RandomState(seed)
    img = ndi.gaussian_filter(rng.rand(h, w), 2.0)
    img -= img.min()
    img /= img.max()
    return (img * scale).astype(np.float32)


def parrot_gray() -> np.ndarray:
    """Vigra-importImage-equivalent luma of the reference's showcase image:
    0.299 R + 0.587 G + 0.114 B in float32 (main.cpp:52-54 semantics)."""
    from PIL import Image
    a = np.asarray(Image.open(PARROT).convert("RGB")).astype(np.float32)
    return (0.299 * a[..., 0] + 0.587 * a[..., 1]
            + 0.114 * a[..., 2]).astype(np.float32)


def build_ref_binary() -> str:
    """Compile the unmodified reference against the Vigra shim; returns
    the executable path (tools/refbuild/Makefile)."""
    subprocess.run(["make", "-s"], cwd=REFBUILD_DIR, check=True)
    return os.path.join(REFBUILD_DIR, "ref_sift")


def run_ref_binary(exe: str, img: np.ndarray, subpixel: bool = False,
                   sigma: float = 1.6, k: float = math.sqrt(2.0),
                   octaves: int = 4, dogs: int = 3) -> List[RefRow]:
    """Run the rebuilt reference on one frame; returns keypoint rows.

    Frame protocol (ref_driver.cpp): int32 w, int32 h, then w*h float32
    row-major values in [0, 255]."""
    h, w = img.shape
    with tempfile.TemporaryDirectory() as td:
        raw = os.path.join(td, "frame.raw")
        out = os.path.join(td, "out.txt")
        with open(raw, "wb") as f:
            f.write(struct.pack("<ii", w, h))
            f.write(img.astype(np.float32).tobytes())
        subprocess.run([exe, raw, out, repr(sigma), repr(k), str(octaves),
                        str(dogs), "1" if subpixel else "0"], check=True)
        rows: List[RefRow] = []
        for ln in open(out).read().strip().splitlines():
            p = ln.split()
            rows.append((int(p[0]), int(p[1]), int(p[2]), int(p[3]),
                         float(p[4]), float(p[5]),
                         np.array([float(x) for x in p[6:]], np.float32)))
        return rows
