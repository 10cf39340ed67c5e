"""Visualization golden (VERDICT r2 missing #4): the CLI's keypoint
overlay geometry — square centers, sides, angles — checked against values
derived from the rebuilt-reference golden, mirroring the reference's own
drawing transform (/root/reference/main.cpp:59-76). Geometry-level, not
pixel-level: the reference renders with OpenCV and we render with PIL, so
the assertable contract is the RotatedRect parameters and corner math."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sift_tpu.cli import viz_geometry, square_corners, draw_keypoints
from sift_tpu.config import SiftConfig
from sift_tpu.frontend.sift import extract
from sift_tpu.oracle.refbuild import PARROT, parrot_gray

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_ref_parrot.npz")


@pytest.mark.slow
def test_viz_geometry_matches_reference_transform_on_parrot():
    """Extract parrot.jpg in parity mode, push the keypoints through the
    CLI's viz transform, and compare every drawn square's (center, side,
    angle) to the reference formula applied to the golden rows:
    center = loc * 2^octave (subpixel off), side = scale * 10,
    angle = orientation (main.cpp:60-66)."""
    if not os.path.exists(PARROT):
        pytest.skip("reference example image unavailable")
    gray = parrot_gray()
    z = np.load(GOLDEN)

    cfg = SiftConfig(mode="parity", max_keypoints_per_octave=20480,
                     max_keypoints=2048)
    kp = jax.jit(lambda x: extract(x, cfg))(jnp.asarray(gray))
    kp = jax.device_get(kp)
    assert int(kp.n_dropped) == 0
    v = np.asarray(kp.valid)

    cx, cy, side, ang = viz_geometry(kp.x[v], kp.y[v], kp.octave[v],
                                     kp.scale[v], kp.orientation[v],
                                     subpixel=False)

    ours = {}
    for i in range(cx.shape[0]):
        key = (int(kp.octave[v][i]), int(kp.level[v][i]),
               int(kp.x[v][i]), int(kp.y[v][i]))
        ours[key] = (cx[i], cy[i], side[i], ang[i])

    # Expected geometry straight from the golden rows + main.cpp's math.
    n_checked = 0
    for row, ori in zip(z["kp"], z["ori"]):
        octv, lvl, x, y, scale = (int(row[0]), int(row[1]), int(row[2]),
                                  int(row[3]), float(row[4]))
        want_cx = x * 2.0 ** octv           # main.cpp:60-63, subpixel off
        want_cy = y * 2.0 ** octv
        want_side = scale * 10.0            # main.cpp:66
        got = ours[(octv, lvl, x, y)]
        np.testing.assert_allclose(got[0], want_cx, atol=1e-9)
        np.testing.assert_allclose(got[1], want_cy, atol=1e-9)
        np.testing.assert_allclose(got[2], want_side, atol=1e-3)
        # Angle = the keypoint orientation (main.cpp:66), NaN for the
        # reference's singular-parabola quirk keypoints.
        np.testing.assert_allclose(got[3], float(ori), atol=1e-3,
                                    equal_nan=True)
        n_checked += 1
    assert n_checked == 1445


def test_square_corners_rotation_math():
    """Corner positions equal an independent complex-number rotation of
    the axis-aligned square (cv::RotatedRect convention: degrees,
    clockwise in image coordinates)."""
    rng = np.random.default_rng(0)
    for _ in range(50):
        x, y = rng.uniform(-50, 50, 2)
        side = rng.uniform(0.1, 40)
        ang = rng.uniform(-720, 720)
        pts = square_corners(x, y, side, ang)
        rot = np.exp(1j * math.radians(ang))
        base = np.array([-1 - 1j, 1 - 1j, 1 + 1j, -1 + 1j]) * side / 2
        want = base * rot + (x + 1j * y)
        got = np.array([complex(px, py) for px, py in pts])
        np.testing.assert_allclose(got, want, atol=1e-9)
    # Side length and diagonal invariants.
    pts = np.asarray(square_corners(3.0, -2.0, 10.0, 37.0))
    d01 = np.linalg.norm(pts[1] - pts[0])
    d13 = np.linalg.norm(pts[3] - pts[1])
    np.testing.assert_allclose(d01, 10.0, atol=1e-9)
    np.testing.assert_allclose(d13, 10.0 * math.sqrt(2), atol=1e-9)


def test_draw_keypoints_marks_corner_pixels():
    """The rendered overlay actually contains the squares: the drawn-pixel
    set touches each computed corner (rounded), and NaN-angle keypoints
    neither crash nor paint."""
    img = np.zeros((64, 64, 3), np.uint8)
    out = draw_keypoints(img, [32.0], [30.0], [16.0], [30.0])
    drawn = np.argwhere((out != 0).any(axis=-1))
    assert drawn.shape[0] > 0
    for px, py in square_corners(32.0, 30.0, 16.0, 30.0):
        # PIL rasterizes line endpoints with integer truncation — allow a
        # 2-pixel L1 halo around the exact corner.
        d = np.abs(drawn - [round(py), round(px)]).sum(axis=1).min()
        assert d <= 2, (px, py, d)

    out_nan = draw_keypoints(img, [32.0], [30.0], [16.0], [float("nan")])
    assert (out_nan == 0).all()
