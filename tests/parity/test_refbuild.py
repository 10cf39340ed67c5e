"""Live rebuild of the reference C++ against the Vigra shim, compared
keypoint-for-keypoint with refsim (the Python oracle every parity claim
chains through — VERDICT r1 item 1).

This compiles the UNMODIFIED /root/reference/sift.cpp + algorithms.cpp
(never copied into the repo; the Makefile points at them) with the local
g++ and asserts the Python oracle reproduces the compiled reference's
output exactly on fresh synthetic images — so a misreading of the C++
cannot pass silently anymore.
"""

import math
import os
import shutil
import struct
import subprocess

import numpy as np
import pytest
import scipy.ndimage as ndi

from sift_tpu.oracle.refsim import refsim_extract

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
REFBUILD = os.path.join(REPO, "tools", "refbuild")
REF_SRC = "/root/reference/sift.cpp"


def _build():
    subprocess.run(["make", "-s"], cwd=REFBUILD, check=True)
    return os.path.join(REFBUILD, "ref_sift")


def _run(exe, img, subpixel=False, tmpdir="/tmp"):
    h, w = img.shape
    raw = os.path.join(tmpdir, "refbuild_frame.raw")
    out = os.path.join(tmpdir, "refbuild_out.txt")
    with open(raw, "wb") as f:
        f.write(struct.pack("<ii", w, h))
        f.write(img.astype(np.float32).tobytes())
    subprocess.run([exe, raw, out, "1.6", repr(math.sqrt(2.0)), "4", "3",
                    "1" if subpixel else "0"], check=True)
    rows = []
    for ln in open(out).read().strip().splitlines():
        p = ln.split()
        rows.append((int(p[2]), int(p[3]), int(p[0]), int(p[1]), float(p[4]),
                     np.array([float(x) for x in p[6:]], np.float32)))
    return rows


def _image(seed, h=44, w=52):
    rng = np.random.RandomState(seed)
    img = ndi.gaussian_filter(rng.rand(h, w), 2.0)
    img -= img.min()
    img /= img.max()
    return (img * 255.0).astype(np.float32)


@pytest.mark.slow
@pytest.mark.parametrize("seed,subpixel", [(7, False), (8, False), (9, True)])
def test_refsim_matches_compiled_reference(tmp_path, seed, subpixel):
    if shutil.which("g++") is None or not os.path.exists(REF_SRC):
        pytest.skip("g++ or reference sources unavailable")
    exe = _build()
    img = _image(seed, 36, 40) if subpixel else _image(seed)

    ref = _run(exe, img, subpixel, str(tmp_path))
    sim = refsim_extract(img, subpixel=subpixel)

    rset = sorted(r[:4] for r in ref)
    sset = sorted((p.octave, p.level, p.x, p.y) for p in sim)
    assert rset == sset, (
        f"rebuilt-only={sorted(set(rset) - set(sset))[:5]} "
        f"refsim-only={sorted(set(sset) - set(rset))[:5]}")
    assert len(ref) > 0

    smap = {(p.octave, p.level, p.x, p.y): p for p in sim}
    for key_o, key_l, key_x, key_y, scale, desc in ref:
        p = smap[(key_o, key_l, key_x, key_y)]
        assert abs(p.scale - scale) < 1e-5
        if p.desc is not None and desc.size == 128:
            np.testing.assert_allclose(p.desc, desc, atol=1e-5)
