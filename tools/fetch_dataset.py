"""One-command benchmark-dataset ingestion (VERDICT r5 #7).

Downloads, verifies, unpacks, and layout-checks the two BASELINE
evaluation sequences so the "ATE within reference bound on real data" row
becomes measurable the moment network access exists:

  python tools/fetch_dataset.py tum_fr1_xyz   [--dest data/]
  python tools/fetch_dataset.py kitti_odom_00 [--dest data/]
  python tools/fetch_dataset.py --verify-only <path>   # layout check only

After a successful fetch the BASELINE command is printed, e.g.:

  python -m sift_tpu.cli sfm data/rgbd_dataset_freiburg1_xyz --format tum \
      --chunked --ba-async --loop-closure --sim3 --global-ba

In-environment outcome (recorded r5): this build environment has ZERO
network egress — both fetch attempts fail at connect time, which is the
expected result here; the script's verification path is exercised by
tests/unit/test_fetch_dataset.py against the checked-in mini fixtures.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tarfile
import urllib.error
import urllib.request
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATASETS = {
    "tum_fr1_xyz": {
        "url": ("https://cvg.cit.tum.de/rgbd/dataset/freiburg1/"
                "rgbd_dataset_freiburg1_xyz.tgz"),
        # Published by TUM CVG; verify after first successful download and
        # pin (the site does not publish digests).
        "sha256": None,
        "unpacked": "rgbd_dataset_freiburg1_xyz",
        "format": "tum",
        "cli": ("python -m sift_tpu.cli sfm {path} --format tum "
                "--chunked --ba-async --loop-closure --global-ba"),
    },
    "tum_fr1_desk": {
        "url": ("https://cvg.cit.tum.de/rgbd/dataset/freiburg1/"
                "rgbd_dataset_freiburg1_desk.tgz"),
        "sha256": None,
        "unpacked": "rgbd_dataset_freiburg1_desk",
        "format": "tum",
        "cli": ("python -m sift_tpu.cli sfm {path} --format tum "
                "--chunked --ba-async --loop-closure --global-ba"),
    },
    "kitti_odom_00": {
        # KITTI odometry requires a registration token for the full
        # grayscale set; the URLs below are the official archive names —
        # place manually downloaded archives into --dest to skip the
        # network step.
        "url": ("https://s3.eu-central-1.amazonaws.com/avg-kitti/"
                "data_odometry_gray.zip"),
        "extra": [("https://s3.eu-central-1.amazonaws.com/avg-kitti/"
                   "data_odometry_poses.zip")],
        "sha256": None,
        "unpacked": "dataset",
        "format": "kitti",
        "cli": ("python -m sift_tpu.cli sfm {path} --format kitti "
                "--sequence 00 --stereo --chunked --ba-async "
                "--loop-closure --global-ba"),
    },
}


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify_layout(path: str, fmt: str) -> list:
    """Return a list of layout problems ([] = loadable by io.datasets)."""
    problems = []
    if fmt == "tum":
        for req in ("rgb.txt", "rgb"):
            if not os.path.exists(os.path.join(path, req)):
                problems.append(f"missing {req}")
        if not os.path.exists(os.path.join(path, "groundtruth.txt")):
            problems.append("missing groundtruth.txt (ATE not computable)")
    elif fmt == "kitti":
        seqs = os.path.join(path, "sequences")
        if not os.path.isdir(seqs):
            problems.append("missing sequences/")
        else:
            found = [s for s in sorted(os.listdir(seqs))
                     if os.path.isdir(os.path.join(seqs, s, "image_0"))]
            if not found:
                problems.append("no sequences/<id>/image_0 directories")
        if not os.path.isdir(os.path.join(path, "poses")):
            problems.append("missing poses/ (ATE not computable)")
    else:
        problems.append(f"unknown format {fmt}")
    if not problems:
        # Deep check: the real loader must accept it.
        try:
            from sift_tpu.io.datasets import (load_tum_rgbd,
                                              load_kitti_odometry)
            if fmt == "tum":
                seq = load_tum_rgbd(path, max_frames=2)
            else:
                sid = sorted(os.listdir(os.path.join(path, "sequences")))[0]
                seq = load_kitti_odometry(path, sequence=sid, max_frames=2)
            if len(seq) == 0:
                problems.append("loader returned 0 frames")
        except Exception as e:  # pragma: no cover - env-specific
            problems.append(f"loader failed: {e}")
    return problems


def fetch(name: str, dest: str) -> int:
    spec = DATASETS[name]
    os.makedirs(dest, exist_ok=True)
    urls = [spec["url"]] + list(spec.get("extra", []))
    archives = []
    for url in urls:
        fn = os.path.join(dest, os.path.basename(url))
        archives.append(fn)
        if os.path.exists(fn):
            print(f"already downloaded: {fn}")
            continue
        print(f"downloading {url} ...")
        try:
            urllib.request.urlretrieve(url, fn + ".part")
            os.replace(fn + ".part", fn)
        except (urllib.error.URLError, OSError) as e:
            print(f"FETCH FAILED: {e}\n"
                  f"(no network egress? download manually and place the "
                  f"archive at {fn}, then re-run)", file=sys.stderr)
            return 2
    for fn in archives:
        want = spec.get("sha256")
        if want:
            got = sha256_file(fn)
            if got != want:
                print(f"CHECKSUM MISMATCH for {fn}: {got} != {want}",
                      file=sys.stderr)
                return 3
        else:
            print(f"sha256 {os.path.basename(fn)} = {sha256_file(fn)} "
                  f"(pin this in DATASETS)")
        print(f"unpacking {fn} ...")
        if fn.endswith((".tgz", ".tar.gz")):
            with tarfile.open(fn) as tf:
                tf.extractall(dest)
        elif fn.endswith(".zip"):
            with zipfile.ZipFile(fn) as zf:
                zf.extractall(dest)
    path = os.path.join(dest, spec["unpacked"])
    problems = verify_layout(path, spec["format"])
    if problems:
        print("layout problems: " + "; ".join(problems), file=sys.stderr)
        return 4
    print(f"OK: {path}")
    print("BASELINE command:\n  " + spec["cli"].format(path=path))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", choices=sorted(DATASETS))
    ap.add_argument("--dest", default=os.path.join(REPO, "data"))
    ap.add_argument("--verify-only", metavar="PATH",
                    help="layout-check an existing directory (format "
                    "inferred from contents)")
    args = ap.parse_args()
    if args.verify_only:
        fmt = "kitti" if os.path.isdir(
            os.path.join(args.verify_only, "sequences")) else "tum"
        problems = verify_layout(args.verify_only, fmt)
        if problems:
            print("; ".join(problems), file=sys.stderr)
            return 1
        print(f"OK ({fmt})")
        return 0
    if not args.name:
        ap.error("dataset name required (or --verify-only)")
    return fetch(args.name, args.dest)


if __name__ == "__main__":
    sys.exit(main())
