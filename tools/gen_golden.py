"""Golden-file generator for the parity test suite (VERDICT r1 items 1/4/9).

Produces, reproducibly:
  tests/parity/golden_refsim.npz      — three synthetic cases (seeds 0/1/5),
                                        keypoints + descriptors from refsim,
                                        cross-checked bit-exactly against the
                                        REBUILT reference binary.
  tests/parity/golden_ref_parrot.npz  — the reference's own showcase image
                                        (/root/reference/example/parrot.jpg,
                                        README.md:8-11) at full 488x600
                                        scale, from the rebuilt binary.

"Rebuilt reference binary" = the UNMODIFIED /root/reference/sift.cpp +
algorithms.cpp compiled against tools/refbuild/vigra_shim (see the Makefile
there): real C++ semantics, shimmed Vigra math. The generator builds it with
the local g++, runs both it and refsim on every case, and refuses to write a
golden on any mismatch — so the committed goldens are grounded in compiled
reference logic, not only in the Python oracle.

Usage:  python tools/gen_golden.py [--check]
  --check: regenerate in memory and compare against the committed files
           (exit 1 on drift) without writing.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARITY_DIR = os.path.join(REPO, "tests", "parity")

sys.path.insert(0, REPO)
from sift_tpu.oracle.refsim import refsim_extract          # noqa: E402
from sift_tpu.oracle.refbuild import (                      # noqa: E402
    smooth_image, parrot_gray, build_ref_binary, run_ref_binary,
)


def refsim_rows(img: np.ndarray, subpixel: bool, sigma: float = 1.6,
                k: float = math.sqrt(2.0), octaves: int = 4, dogs: int = 3):
    kps = refsim_extract(img, sigma=sigma, k=k, octaves=octaves,
                         dogs_per_epoch=dogs, subpixel=subpixel)
    return [(p.x, p.y, p.octave, p.level, p.scale, p.orientation,
             p.desc if p.desc is not None else np.zeros(128, np.float32))
            for p in kps]


def assert_equal_sets(ref_rows, sim_rows, label):
    rset = sorted((r[2], r[3], r[0], r[1]) for r in ref_rows)
    sset = sorted((r[2], r[3], r[0], r[1]) for r in sim_rows)
    if rset != sset:
        raise AssertionError(
            f"{label}: keypoint sets differ "
            f"(rebuilt {len(rset)} vs refsim {len(sset)}; "
            f"rebuilt-only {sorted(set(rset) - set(sset))[:5]}, "
            f"refsim-only {sorted(set(sset) - set(rset))[:5]})")
    smap = {(r[2], r[3], r[0], r[1]): r for r in sim_rows}
    for r in ref_rows:
        s = smap[(r[2], r[3], r[0], r[1])]
        if abs(r[4] - s[4]) > 1e-5:
            raise AssertionError(f"{label}: scale mismatch at {r[:4]}")
        if not (math.isnan(r[5]) and math.isnan(s[5])) and \
                abs(r[5] - s[5]) > 1e-4:
            raise AssertionError(f"{label}: orientation mismatch at {r[:4]}")
        d = float(np.abs(r[6] - s[6]).max()) if r[6].size == s[6].size else 1.0
        if d > 1e-5:
            raise AssertionError(
                f"{label}: descriptor mismatch at {r[:4]} (max {d})")
    print(f"  {label}: {len(ref_rows)} keypoints, rebuilt == refsim")


def rows_to_arrays(rows):
    kp = np.array([[r[2], r[3], r[0], r[1], r[4]] for r in rows], np.float32)
    desc = np.stack([r[6] for r in rows]).astype(np.float32) \
        if rows else np.zeros((0, 128), np.float32)
    return kp, desc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    exe = build_ref_binary()

    # --- synthetic cases (golden_refsim.npz) -----------------------------
    cases = {
        "s0_sub0": (smooth_image(44, 52, seed=0), False),
        "s1_sub0": (smooth_image(44, 52, seed=1), False),
        "s5_sub1": (smooth_image(30, 34, seed=5), True),
    }
    blob = {}
    for key, (img, subpixel) in cases.items():
        ref = run_ref_binary(exe, img, subpixel)
        sim = refsim_rows(img, subpixel)
        assert_equal_sets(ref, sim, key)
        kp, desc = rows_to_arrays(ref)
        blob[f"{key}_img"] = img
        blob[f"{key}_kp"] = kp
        blob[f"{key}_desc"] = desc

    # --- parrot (golden_ref_parrot.npz) ----------------------------------
    gray = parrot_gray()
    ref = run_ref_binary(exe, gray, False)
    sim = refsim_rows(gray, False)
    assert_equal_sets(ref, sim, "parrot")
    pkp, pdesc = rows_to_arrays(ref)
    per_oct = np.bincount(pkp[:, 0].astype(int), minlength=4)
    print(f"  parrot per-octave keypoints: {per_oct.tolist()}")
    # Orientations ride along for the visualization golden (they are NOT
    # in `kp` because rows_to_arrays predates them; NaN values are the
    # reference's singular-parabola quirk and compare with equal_nan).
    pori = np.asarray([r[5] for r in ref], np.float32)
    parrot_blob = {"kp": pkp, "desc": pdesc, "ori": pori,
                   "image_sha": np.frombuffer(
                       __import__("hashlib").sha256(gray.tobytes()).digest(),
                       np.uint8)}

    # --- flag grid (golden_grid.npz): parity beyond the defaults ---------
    # The reference's CLI exposes -s/-k/-o/-d/-p (main.cpp:33-38); -d 4/5
    # activates MULTIPLE interior DoG levels in the extrema scan
    # (sift.cpp:352-355), a path the default-flag goldens never touch.
    # Each case: (image, sigma, k, octaves, dogs, subpixel).
    rt2 = math.sqrt(2.0)
    crop = parrot_gray()[140:260, 180:330].copy()     # real-texture crop
    grid = {
        "d4": (smooth_image(64, 72, seed=2), 1.6, rt2, 4, 4, False),
        "d5": (smooth_image(64, 72, seed=3), 1.6, rt2, 4, 5, False),
        "o2": (smooth_image(44, 52, seed=4), 1.6, rt2, 2, 3, False),
        "o5": (smooth_image(96, 112, seed=6), 1.6, rt2, 5, 3, False),
        "s10": (smooth_image(44, 52, seed=7), 1.0, rt2, 4, 3, False),
        "s20": (smooth_image(44, 52, seed=8), 2.0, rt2, 4, 3, False),
        "k12": (smooth_image(44, 52, seed=9), 1.6, 1.2, 4, 3, False),
        "real_sub": (crop, 1.6, rt2, 4, 3, True),
        "real_d4": (crop, 1.6, rt2, 4, 4, False),
        "d4_o5": (smooth_image(96, 112, seed=10), 1.6, rt2, 5, 4, False),
    }
    grid_blob = {}
    for key, (img, sigma, k, octaves, dogs, subpixel) in grid.items():
        ref = run_ref_binary(exe, img, subpixel, sigma=sigma, k=k,
                             octaves=octaves, dogs=dogs)
        sim = refsim_rows(img, subpixel, sigma=sigma, k=k,
                          octaves=octaves, dogs=dogs)
        assert_equal_sets(ref, sim, f"grid/{key}")
        kp, desc = rows_to_arrays(ref)
        grid_blob[f"{key}_img"] = img
        grid_blob[f"{key}_kp"] = kp
        grid_blob[f"{key}_desc"] = desc
        grid_blob[f"{key}_params"] = np.asarray(
            [sigma, k, octaves, dogs, int(subpixel)], np.float64)

    golden_path = os.path.join(PARITY_DIR, "golden_refsim.npz")
    parrot_path = os.path.join(PARITY_DIR, "golden_ref_parrot.npz")
    grid_path = os.path.join(PARITY_DIR, "golden_grid.npz")

    if args.check:
        ok = True
        z = np.load(golden_path)
        for k, v in blob.items():
            if not np.array_equal(z[k], v):
                print(f"DRIFT: {k}")
                ok = False
        z2 = np.load(parrot_path)
        for k, v in parrot_blob.items():
            if not np.array_equal(z2[k], v):
                print(f"DRIFT: parrot/{k}")
                ok = False
        z3 = np.load(grid_path)
        for k, v in grid_blob.items():
            if not np.array_equal(z3[k], v):
                print(f"DRIFT: grid/{k}")
                ok = False
        sys.exit(0 if ok else 1)

    np.savez_compressed(golden_path, **blob)
    np.savez_compressed(parrot_path, **parrot_blob)
    np.savez_compressed(grid_path, **grid_blob)
    print(f"wrote {golden_path}, {parrot_path} and {grid_path}")


if __name__ == "__main__":
    main()
