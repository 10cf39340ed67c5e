"""ATE/RPE metric tests + dataset loader tests on synthetic on-disk fixtures."""

import os

import numpy as np
import pytest

from sift_tpu.eval.ate import umeyama_alignment, ate_rmse, rpe_rmse
from sift_tpu.io.datasets import load_tum_rgbd, load_kitti_odometry
from sift_tpu.io.image import save_image_gray


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.standard_normal((50, 3))
    from scipy.spatial.transform import Rotation
    R_true = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    dst = s_true * src @ R_true.T + t_true

    s, R, t = umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(s, s_true, rtol=1e-10)
    np.testing.assert_allclose(R, R_true, atol=1e-10)
    np.testing.assert_allclose(t, t_true, atol=1e-10)


def test_ate_zero_for_transformed_copy():
    rng = np.random.default_rng(1)
    gt = np.cumsum(rng.standard_normal((40, 3)), axis=0)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_rotvec([0.1, 0.2, -0.3]).as_matrix()
    est = 0.7 * gt @ R.T + np.array([3.0, 1.0, -2.0])
    assert ate_rmse(est, gt, align=True, with_scale=True) < 1e-9
    # Without scale alignment the scaled copy has nonzero ATE.
    assert ate_rmse(est, gt, align=True, with_scale=False) > 0.1


def test_ate_reports_noise_level():
    rng = np.random.default_rng(2)
    gt = np.cumsum(rng.standard_normal((200, 3)), axis=0)
    est = gt + rng.normal(0, 0.05, gt.shape)
    v = ate_rmse(est, gt)
    assert 0.04 < v < 0.12
    assert rpe_rmse(est, gt) < 0.3


@pytest.fixture
def tum_fixture(tmp_path):
    """Minimal synthetic TUM-RGBD sequence on disk."""
    d = tmp_path / "rgbd_dataset_freiburg1_synth"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    rng = np.random.default_rng(3)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(4):
        ts = 1000.0 + 0.033 * i
        img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
        save_image_gray(str(d / "rgb" / f"{ts:.6f}.png"), img)
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        dts = ts + 0.005
        from PIL import Image
        depth = (rng.uniform(0.5, 3.0, (48, 64)) * 5000).astype(np.uint16)
        Image.fromarray(depth).save(
            str(d / "depth" / f"{dts:.6f}.png"))
        depth_lines.append(f"{dts:.6f} depth/{dts:.6f}.png")
        gt_lines.append(f"{ts:.6f} {0.1*i} 0.0 0.0 0.0 0.0 0.0 1.0")
    (d / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (d / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines) + "\n")
    (d / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines) + "\n")
    return str(d)


def test_load_tum_rgbd(tum_fixture):
    seq = load_tum_rgbd(tum_fixture)
    assert len(seq) == 4
    assert seq.intrinsics[0] == 517.3          # freiburg1 default
    f = seq.frames[0]
    assert f.gray.shape == (48, 64)
    assert f.depth is not None and 0.4 < f.depth.mean() < 3.1
    pos = seq.gt_positions()
    np.testing.assert_allclose(pos[:, 0], [0.0, 0.1, 0.2, 0.3], atol=1e-6)


@pytest.fixture
def kitti_fixture(tmp_path):
    root = tmp_path / "kitti"
    seq = root / "sequences" / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    (root / "poses").mkdir()
    rng = np.random.default_rng(4)
    for i in range(3):
        img = rng.uniform(0, 255, (40, 120)).astype(np.float32)
        save_image_gray(str(seq / "image_0" / f"{i:06d}.png"), img)
        save_image_gray(str(seq / "image_1" / f"{i:06d}.png"), img[:, ::-1])
    # P1's fourth column encodes -fx * baseline (0.54 m here).
    (seq / "calib.txt").write_text(
        "P0: 718.856 0 607.1928 0 0 718.856 185.2157 0 0 0 1 0\n"
        "P1: 718.856 0 607.1928 -388.1822 0 718.856 185.2157 0 0 0 1 0\n")
    pose_lines = []
    for i in range(3):
        T = np.eye(4)
        T[0, 3] = 1.5 * i
        pose_lines.append(" ".join(str(x) for x in T[:3].reshape(-1)))
    (root / "poses" / "00.txt").write_text("\n".join(pose_lines) + "\n")
    return str(root)


def test_load_kitti(kitti_fixture):
    seq = load_kitti_odometry(kitti_fixture, "00")
    assert len(seq) == 3
    fx, fy, cx, cy = seq.intrinsics
    assert abs(fx - 718.856) < 1e-6 and abs(cy - 185.2157) < 1e-6
    assert abs(seq.baseline - 0.54) < 1e-4           # from P1
    assert seq.frames[0].gray_right is None          # stereo off by default
    pos = seq.gt_positions()
    np.testing.assert_allclose(pos[:, 0], [0.0, 1.5, 3.0], atol=1e-9)


def test_load_kitti_stereo(kitti_fixture):
    seq = load_kitti_odometry(kitti_fixture, "00", stereo=True)
    f = seq.frames[0]
    assert f.gray_right is not None
    assert f.gray_right.shape == f.gray.shape
    np.testing.assert_allclose(f.gray_right, f.gray[:, ::-1], atol=1.0)
