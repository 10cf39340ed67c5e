"""TUM-dialect trajectory export (io/trajectory.py).

The round-trip oracle is the TUM groundtruth PARSER in io/datasets.py
(`_read_tum_groundtruth`'s quaternion -> rotation formula): a written
trajectory re-read through the project's own reader must reproduce the
poses, which pins both the file grammar and the quaternion convention
(qx qy qz qw, camera-to-world)."""

import numpy as np
import pytest

from sift_tpu.io.trajectory import rotmat_to_quat, save_ply, save_tum


def _quat_to_R(qx, qy, qz, qw):
    """The exact formula io/datasets.py uses to parse groundtruth.txt."""
    return np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
         2 * (qx * qz + qy * qw)],
        [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qx * qw)],
        [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
         1 - 2 * (qx * qx + qy * qy)],
    ])


def _random_rotations(n, rng):
    """Uniform-ish random rotations via QR of Gaussian matrices."""
    out = []
    for _ in range(n):
        q, r = np.linalg.qr(rng.standard_normal((3, 3)))
        q *= np.sign(np.diag(r))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        out.append(q)
    return np.stack(out)


def test_rotmat_quat_roundtrip_random():
    rng = np.random.default_rng(0)
    Rs = _random_rotations(64, rng)
    q = rotmat_to_quat(Rs)
    for k in range(Rs.shape[0]):
        R2 = _quat_to_R(*q[k])
        np.testing.assert_allclose(R2, Rs[k], atol=1e-9)
    # unit norm, positive scalar part
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-12)
    assert np.all(q[:, 3] >= 0)


def test_rotmat_quat_near_pi_rotations():
    """180-degree rotations break single-branch trace formulas; the
    per-matrix pivot must stay well-conditioned there."""
    axes = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1],
                     [1, 1, 0], [1, -1, 1]], np.float64)
    Rs = []
    for a in axes:
        a = a / np.linalg.norm(a)
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]],
                      [-a[1], a[0], 0]])
        th = np.pi - 1e-7
        Rs.append(np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K)
    Rs = np.stack(Rs)
    q = rotmat_to_quat(Rs)
    for k in range(Rs.shape[0]):
        np.testing.assert_allclose(_quat_to_R(*q[k]), Rs[k], atol=1e-7)


def test_save_tum_roundtrip_through_dataset_parser(tmp_path):
    rng = np.random.default_rng(1)
    F = 12
    Rs = _random_rotations(F, rng)
    ts = rng.standard_normal((F, 3))
    stamps = 1305031102.0 + 0.033 * np.arange(F)
    path = str(tmp_path / "traj.txt")
    save_tum(path, Rs, ts, timestamps=stamps)

    from sift_tpu.io.datasets import _read_tum_groundtruth
    rows = _read_tum_groundtruth(path)
    assert len(rows) == F
    for k, (t_read, T) in enumerate(rows):
        assert abs(t_read - stamps[k]) < 1e-6
        np.testing.assert_allclose(T[:3, :3], Rs[k], atol=1e-6)
        np.testing.assert_allclose(T[:3, 3], ts[k], atol=1e-6)


def test_save_tum_default_stamps(tmp_path):
    Rs = np.tile(np.eye(3), (3, 1, 1))
    ts = np.zeros((3, 3))
    path = str(tmp_path / "t.txt")
    save_tum(path, Rs, ts)
    data = np.loadtxt(path)
    np.testing.assert_allclose(data[:, 0], [0, 1, 2], atol=1e-9)
    assert data.shape == (3, 8)


@pytest.mark.slow
def test_cli_sfm_traj_format_tum(tmp_path):
    """End-to-end: --traj-format tum writes a file the project's own TUM
    reader accepts, one row per frame, timestamps from the sequence."""
    import os
    from sift_tpu import cli
    FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    tum_dir = os.path.join(FIXDIR, "tum_mini",
                           "rgbd_dataset_freiburg1_mini")
    if not os.path.isdir(tum_dir):
        pytest.skip("tum fixture missing")
    traj = str(tmp_path / "traj_tum.txt")
    ply = str(tmp_path / "map.ply")
    rc = cli.main(["sfm", tum_dir, "--format", "tum", "--traj", traj,
                   "--traj-format", "tum", "--ply", ply])
    assert rc == 0
    from sift_tpu.io.datasets import _read_tum_groundtruth
    rows = _read_tum_groundtruth(traj)
    assert len(rows) == 10
    # timestamps must be the fixture's own frame stamps (not indices)
    assert rows[0][0] > 1e9
    head = open(ply).read().splitlines()
    assert head[0] == "ply"
    n = int([l for l in head if l.startswith("element vertex")][0].split()[-1])
    assert n > 0


def test_save_ply(tmp_path):
    pts = np.array([[0.0, 1.0, 2.0], [3.5, -1.25, 0.0]], np.float32)
    cols = np.array([[255, 0, 0], [0, 128, 255]], np.uint8)
    p1 = str(tmp_path / "plain.ply")
    p2 = str(tmp_path / "color.ply")
    save_ply(p1, pts)
    save_ply(p2, pts, cols)
    t1 = open(p1).read().splitlines()
    assert t1[0] == "ply" and "element vertex 2" in t1[2]
    assert t1[-1].startswith("3.5")
    t2 = open(p2).read().splitlines()
    assert "property uchar red" in t2
    assert t2[-1].endswith("0 128 255")
