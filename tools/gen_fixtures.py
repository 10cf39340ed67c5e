"""Generate the checked-in real-format dataset fixtures.

VERDICT r2 #4: the TUM/KITTI loaders had only ever read the test suite's
own synthetic layouts. These fixtures are tiny RENDERED sequences written
in the datasets' ACTUAL file dialects — TUM's three-line comment headers
and timestamp-named rgb/depth PNGs (uint16 depth at scale 5000), KITTI's
scientific-notation calib.txt with P0..P3 + Tr rows, times.txt, and
poses/NN.txt 3x4 rows — self-consistent end to end: the images are
rendered from the ground-truth camera trajectory with the intrinsics the
loader will recover (TUM: the freiburg1 defaults implied by the directory
name; KITTI: the calib file itself), so `cli sfm --format tum|kitti` can
genuinely track them and hit an ATE bound.

Scene: two textured fronto-parallel planes at different depths (the e2e
renderer's geometry), camera translating in +x. Textures come from the
reference's example image at generation time; the committed fixture is
self-contained.

Usage: python tools/gen_fixtures.py    (writes tests/fixtures/)
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FIXDIR = os.path.join(REPO, "tests", "fixtures")

from sift_tpu.io.image import load_image_gray    # noqa: E402

# ---- TUM fixture geometry (real freiburg1 intrinsics & image size) ----
TUM_H, TUM_W = 480, 640
TUM_FX = 517.3
TUM_Z_TOP, TUM_Z_BOT = 2.0, 3.5
TUM_STEP = 0.03
TUM_N = 10

# ---- KITTI fixture geometry (intrinsics live in calib.txt) ----
KIT_H, KIT_W = 120, 400
KIT_FX, KIT_CX, KIT_CY = 200.0, 200.0, 60.0
KIT_BASELINE = 0.54
KIT_Z_TOP, KIT_Z_BOT = 5.0, 9.0
KIT_STEP = 0.08
KIT_N = 10


def _textures(h, w, margin):
    import scipy.ndimage as ndi
    base = load_image_gray("/root/reference/example/parrot.jpg")
    base = np.concatenate([base, base[:, ::-1], base], axis=1)
    base = np.concatenate([base, base[::-1]], axis=0)

    def enrich(t, seed):
        # Blob detail on top of the photo: keypoint density high enough
        # that even small crops bootstrap (the raw crop can be smooth).
        r = np.random.default_rng(seed)
        blobs = ndi.gaussian_filter(r.random(t.shape), 2.0)
        blobs = (blobs - blobs.min()) / max(np.ptp(blobs), 1e-9)
        out = 0.6 * t + 0.4 * 255.0 * blobs
        out = (out - out.min()) / max(np.ptp(out), 1e-9)
        return (out * 255.0).astype(np.float64)

    t1 = enrich(base[40:40 + h // 2, 0:w + margin], 11)
    t2 = enrich(base[500:500 + (h - h // 2), 80:80 + w + margin], 12)
    return t1, t2


def _render(tx, h, w, fx, z_top, z_bot, tex):
    t1, t2 = tex

    def sample(texi, shift):
        cols = np.clip(np.arange(w) + shift + 40.0, 0, texi.shape[1] - 2)
        c0 = np.floor(cols).astype(int)
        f = cols - c0
        return texi[:, c0] * (1 - f) + texi[:, c0 + 1] * f

    top = sample(t1, fx * tx / z_top)
    bot = sample(t2, fx * tx / z_bot)
    img = np.concatenate([top, bot], axis=0)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def gen_tum():
    d = os.path.join(FIXDIR, "tum_mini", "rgbd_dataset_freiburg1_mini")
    os.makedirs(os.path.join(d, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(d, "depth"), exist_ok=True)
    tex = _textures(TUM_H, TUM_W, 400)
    depth = np.empty((TUM_H, TUM_W), np.float64)
    depth[:TUM_H // 2] = TUM_Z_TOP
    depth[TUM_H // 2:] = TUM_Z_BOT
    depth_png = np.round(depth * 5000.0).astype(np.uint16)

    rgb_rows, depth_rows, gt_rows = [], [], []
    t0 = 1305031100.0                      # freiburg-era epoch timestamps
    for i in range(TUM_N):
        ts = t0 + i / 30.0
        dts = ts + 0.0021
        img = _render(TUM_STEP * i, TUM_H, TUM_W, TUM_FX,
                      TUM_Z_TOP, TUM_Z_BOT, tex)
        Image.fromarray(img, mode="L").save(
            os.path.join(d, "rgb", f"{ts:.6f}.png"))
        Image.fromarray(depth_png).save(
            os.path.join(d, "depth", f"{dts:.6f}.png"))
        rgb_rows.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        depth_rows.append(f"{dts:.6f} depth/{dts:.6f}.png")
        gt_rows.append(f"{ts:.4f} {TUM_STEP * i:.4f} 0.0000 0.0000 "
                       f"0.0000 0.0000 0.0000 1.0000")

    def hdr(kind, cols):
        return (f"# {kind}\n"
                f"# file: 'rgbd_dataset_freiburg1_mini.bag'\n"
                f"# {cols}\n")

    with open(os.path.join(d, "rgb.txt"), "w") as f:
        f.write(hdr("color images", "timestamp filename")
                + "\n".join(rgb_rows) + "\n")
    with open(os.path.join(d, "depth.txt"), "w") as f:
        f.write(hdr("depth maps", "timestamp filename")
                + "\n".join(depth_rows) + "\n")
    with open(os.path.join(d, "groundtruth.txt"), "w") as f:
        f.write(hdr("ground truth trajectory",
                    "timestamp tx ty tz qx qy qz qw")
                + "\n".join(gt_rows) + "\n")
    print(f"wrote {d} ({TUM_N} frames)")


def _sci(v):
    return f"{v:.12e}"


def gen_kitti():
    root = os.path.join(FIXDIR, "kitti_mini")
    seq = os.path.join(root, "sequences", "05")
    os.makedirs(os.path.join(seq, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(seq, "image_1"), exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    tex = _textures(KIT_H, KIT_W, 500)

    times, pose_rows = [], []
    for i in range(KIT_N):
        tx = KIT_STEP * i
        left = _render(tx, KIT_H, KIT_W, KIT_FX,
                       KIT_Z_TOP, KIT_Z_BOT, tex)
        # Right camera sits +baseline along x (P1's -fx*b column).
        right = _render(tx + KIT_BASELINE, KIT_H, KIT_W, KIT_FX,
                        KIT_Z_TOP, KIT_Z_BOT, tex)
        Image.fromarray(left, mode="L").save(
            os.path.join(seq, "image_0", f"{i:06d}.png"))
        Image.fromarray(right, mode="L").save(
            os.path.join(seq, "image_1", f"{i:06d}.png"))
        times.append(f"{i * 0.103:.6e}")
        T = np.eye(4)
        T[0, 3] = tx
        pose_rows.append(" ".join(_sci(x) for x in T[:3].reshape(-1)))

    def P(fx, cx, cy, tx_px):
        vals = [fx, 0.0, cx, tx_px, 0.0, fx, cy, 0.0,
                0.0, 0.0, 1.0, 0.0]
        return " ".join(_sci(v) for v in vals)

    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write(f"P0: {P(KIT_FX, KIT_CX, KIT_CY, 0.0)}\n")
        f.write(f"P1: {P(KIT_FX, KIT_CX, KIT_CY, -KIT_FX * KIT_BASELINE)}\n")
        f.write(f"P2: {P(KIT_FX, KIT_CX, KIT_CY, 0.0)}\n")
        f.write(f"P3: {P(KIT_FX, KIT_CX, KIT_CY, -KIT_FX * KIT_BASELINE)}\n")
        tr = np.eye(4)[:3].reshape(-1)
        f.write("Tr: " + " ".join(_sci(v) for v in tr) + "\n")
    with open(os.path.join(seq, "times.txt"), "w") as f:
        f.write("\n".join(times) + "\n")
    with open(os.path.join(root, "poses", "05.txt"), "w") as f:
        f.write("\n".join(pose_rows) + "\n")
    print(f"wrote {root} ({KIT_N} stereo frames)")


if __name__ == "__main__":
    os.makedirs(FIXDIR, exist_ok=True)
    gen_tum()
    gen_kitti()
