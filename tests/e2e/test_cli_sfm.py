"""CLI-level end-to-end: a rendered TUM-RGBD sequence on disk driven through
`python -m sift_tpu.cli sfm` (loader + pipeline + ATE report in one go)."""

import numpy as np
import pytest
from PIL import Image

from sift_tpu import cli
from sift_tpu.io.image import save_image_gray
from tests.e2e.test_image_sfm import (_render, _depth_map, N_FRAMES, STEP,
                                      INTR, H, W)


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rgbd_dataset_freiburg1_planes")
    (d / "rgb").mkdir()
    (d / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    depth_png = (_depth_map() * 5000.0).astype(np.uint16)
    for i in range(N_FRAMES):
        ts = 100.0 + i / 30.0
        save_image_gray(str(d / "rgb" / f"{ts:.6f}.png"), _render(STEP * i))
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        dts = ts + 0.002
        Image.fromarray(depth_png).save(str(d / "depth" / f"{dts:.6f}.png"))
        depth_lines.append(f"{dts:.6f} depth/{dts:.6f}.png")
        gt_lines.append(f"{ts:.6f} {STEP * i} 0.0 0.0 0.0 0.0 0.0 1.0")
    (d / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (d / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (d / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    return str(d)


@pytest.mark.slow
def test_cli_sfm_tum(tum_dir, tmp_path, capsys, monkeypatch):
    # The CLI builds PipelineConfig(); steer its intrinsics via the loader's
    # auto-detection (freiburg1 name) being wrong for our renderer — patch
    # the loader default instead.
    import sift_tpu.io.datasets as ds
    monkeypatch.setattr(ds, "TUM_FR1_INTRINSICS", INTR)

    traj = str(tmp_path / "traj.txt")
    rc = cli.main(["sfm", tum_dir, "--format", "tum", "--traj", traj])
    out = capsys.readouterr().out
    assert rc == 0
    assert "ATE RMSE" in out, out
    ate = float(out.split("ATE RMSE")[1].split(":")[1].split("m")[0])
    assert ate < 0.05, out
    est = np.loadtxt(traj)
    assert est.shape == (N_FRAMES, 3)


def test_cli_kitti_stereo_missing_right_falls_back(tmp_path, monkeypatch):
    """A KITTI sequence with one missing right image must not crash the
    batched stereo path — the CLI detects the gap and keeps the per-frame
    route (which degrades those frames to monocular)."""
    import sift_tpu.io.datasets  # noqa: F401  (import before building dirs)
    from sift_tpu.io.image import save_image_gray

    root = tmp_path / "kitti"
    seq = root / "sequences" / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 6
    for i in range(n):
        img = (rng.random((64, 96)) * 255).astype(np.float32)
        save_image_gray(str(seq / "image_0" / f"{i:06d}.png"), img)
        if i != 3:                       # drop one right frame
            save_image_gray(str(seq / "image_1" / f"{i:06d}.png"), img)
    (seq / "calib.txt").write_text(
        "P0: 100 0 48 0 0 100 32 0 0 0 1 0\n"
        "P1: 100 0 48 -50 0 100 32 0 0 0 1 0\n")
    (seq / "times.txt").write_text(
        "".join(f"{i/10.0:.6f}\n" for i in range(n)))

    rc = cli.main(["sfm", str(root), "--format", "kitti", "--stereo",
                   "--batch", "4"])
    assert rc in (0, 1)      # ran to completion (bootstrap may not succeed)
