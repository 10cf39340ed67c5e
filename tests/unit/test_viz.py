"""Visualization helper tests (shapes + artifacts, headless)."""

import os

import numpy as np

from sift_tpu.io.viz import side_by_side_matches, plot_trajectory


def test_side_by_side_shapes_and_colors():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255, (40, 60))
    b = rng.uniform(0, 255, (50, 70))
    pa = np.asarray([[10.0, 10.0], [30.0, 20.0]])
    pb = np.asarray([[15.0, 12.0], [35.0, 22.0]])
    img = side_by_side_matches(a, b, pa, pb,
                               valid=np.asarray([True, True]),
                               inliers=np.asarray([True, False]))
    assert img.shape == (50, 130, 3)
    # one green-ish and one red-ish line must exist
    assert (img[:, :, 1] > 200).any()
    assert ((img[:, :, 0] > 200) & (img[:, :, 1] < 100)).any()


def test_plot_trajectory_writes_png(tmp_path):
    est = np.cumsum(np.random.default_rng(1).standard_normal((30, 3)), 0)
    gt = est + 0.1
    p = str(tmp_path / "traj.png")
    plot_trajectory(est, gt, path=p)
    assert os.path.getsize(p) > 1000
