"""refsim: NumPy simulation of the reference's observable behaviour.

Implements the 9-stage pipeline of `Sift::calculate` (sift.cpp:19-57) with
every quirk from SURVEY.md §2, as plain Python loops over NumPy arrays —
an *executable spec*, deliberately naive and independent of the JAX code.

Decisions where C++ behaviour is undefined/unknowable (documented in
frontend/parity.py as well):
  * keypoint order after the unstable std::sort: canonical
    (octave, level, x, y) ascending;
  * NaN float->u16 conversion in histogram binning: x86 semantics (bin 0);
  * vigra linearSolve on the always-singular parabola system: fails, result
    stays zero-initialized, vertex = -0/0 = NaN.

Arrays are indexed [y, x] (row-major); the reference's Vigra arrays are
(x, y) — the mapping is transparent because every stencil here is written in
(x, y) terms against [y, x] storage.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import scipy.ndimage as ndi


def _blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Vigra convolveWithGauss: sampled kernel radius round(3s), mirror border."""
    return ndi.gaussian_filter(img.astype(np.float32), sigma,
                               truncate=3.0, mode="mirror").astype(np.float32)


def _resize_nearest(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    h, w = img.shape

    def idx(s, d):
        if d == 1:
            return np.zeros(1, np.int64)
        r = (s - 1) / (d - 1)
        return np.minimum((np.arange(d) * r + 0.5).astype(np.int64), s - 1)

    return img[idx(h, oh)[:, None], idx(w, ow)[None, :]]


@dataclass
class RefKeypoint:
    x: int
    y: int
    octave: int
    level: int
    scale: float
    orientation: float = 0.0
    filtered: bool = False
    desc: Optional[np.ndarray] = None


def _u16_bin(v: float, width: float, fold: int) -> int:
    """floor(v/width) cast to u16 then % fold, with x86 NaN semantics."""
    q = v / width
    if math.isnan(q) or math.isinf(q):
        return 0  # cvttss2si -> 0x80000000, truncated to u16 -> 0, % fold -> 0
    return int(math.floor(q)) % fold


def refsim_extract(img: np.ndarray, sigma: float = 1.6,
                   k: float = math.sqrt(2.0), octaves: int = 4,
                   dogs_per_epoch: int = 3, subpixel: bool = False
                   ) -> List[RefKeypoint]:
    img = img.astype(np.float32)
    if subpixel:
        b = _blur(img, 1.0)
        img = _resize_nearest(b, img.shape[0] * 2, img.shape[1] * 2)

    d = dogs_per_epoch
    # --- pyramid (sift.cpp:381-417) ---
    gauss = [[None] * (d + 1) for _ in range(octaves)]
    gscale = np.zeros((octaves, d + 1), np.float32)
    dogs = [[None] * d for _ in range(octaves)]
    dscale = np.zeros((octaves, d), np.float32)

    gscale[0, 0] = sigma
    gauss[0][0] = _blur(img, sigma)
    exp = 0
    for i in range(octaves):
        for j in range(1, d + 1):
            s = (k ** exp) * sigma
            gscale[i, j] = s
            gauss[i][j] = _blur(gauss[i][j - 1], s)
            dscale[i, j - 1] = gscale[i, j] - gscale[i, j - 1]
            dogs[i][j - 1] = 128.0 + (gauss[i][j] - gauss[i][j - 1])
            exp += 1
        if i < octaves - 1:
            src = gauss[i][d - 1]
            b = _blur(src, float(gscale[i, d - 1]))
            gauss[i + 1][0] = _resize_nearest(b, (src.shape[0] + 1) // 2,
                                              (src.shape[1] + 1) // 2)
            gscale[i + 1, 0] = gscale[i, d - 1]
            exp -= 2

    # --- extrema (sift.cpp:348-379): 2x2 up-left quadrant, ties allowed ---
    kps: List[RefKeypoint] = []
    for e in range(octaves):
        for i in range(1, d - 1):
            cur, under, above = dogs[e][i], dogs[e][i - 1], dogs[e][i + 1]
            h, w = cur.shape
            for x in range(1, w - 1):
                for y in range(1, h - 1):
                    c = cur[y, x]
                    wins = (cur[y - 1:y + 1, x - 1:x + 1],
                            under[y - 1:y + 1, x - 1:x + 1],
                            above[y - 1:y + 1, x - 1:x + 1])
                    if all(not (wv > c).any() for wv in wins) or \
                       all(not (wv < c).any() for wv in wins):
                        kps.append(RefKeypoint(x, y, e, i, float(dscale[e, i])))

    # --- edge responses (sift.cpp:288-346) ---
    t = (10.0 + 1.0) ** 2 / 10.0
    for p in kps:
        im0 = dogs[p.octave][p.level - 1]
        im1 = dogs[p.octave][p.level]
        im2 = dogs[p.octave][p.level + 1]
        x, y = p.x, p.y
        dx = (im1[y, x - 1] - im1[y, x + 1]) / 2.0      # sign-flipped
        dy = (im1[y - 1, x] - im1[y + 1, x]) / 2.0
        ds = (im0[y, x] - im2[y, x]) / 2.0
        g = np.array([dx, dy, ds], np.float32)

        dxx = im1[y, x + 1] + im1[y, x - 1] - 2 * im1[y, x]
        dyy = im1[y + 1, x] + im1[y - 1, x] - 2 * im1[y, x]
        dss = im2[y, x] + im0[y, x] - 2 * im1[y, x]
        dxy = (im1[y + 1, x + 1] - im1[y + 1, x - 1]
               - im1[y - 1, x + 1] + im1[y - 1, x - 1]) / 2.0
        dxs = (im2[y, x + 1] - im2[y, x - 1]
               - im0[y, x + 1] + im0[y, x - 1]) / 2.0
        dys = (im0[y - 1, x] - im0[y + 1, x]) / 2.0     # dys bug
        hess = np.array([[dxx, dxy, dxs], [dxy, dyy, dys], [dxs, dys, dss]],
                        np.float32)

        neg = -hess
        det_neg = float(np.linalg.det(neg.astype(np.float64)))
        if abs(det_neg) <= 1e-12:
            p.filtered = True
            continue
        extremum = neg @ g                                # x = (-H) g
        if (extremum > 127.5).any():
            p.filtered = True
            continue
        fv = float(g @ extremum) * (0.5 + im1[y, x])
        if fv < 7.65:
            p.filtered = True
            continue
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        if det < 0:
            p.filtered = True
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = tr * tr / det
        if ratio > t:                                     # NaN -> False
            p.filtered = True

    kps = sorted([p for p in kps if not p.filtered],
                 key=lambda p: (p.octave, p.level, p.x, p.y))

    # --- magnitude/orientation pyramids (sift.cpp:130-160) ---
    mags = [[None] * (d + 1) for _ in range(octaves)]
    oris = [[None] * (d + 1) for _ in range(octaves)]
    for o in range(octaves):
        for i in range(d + 1):
            g2 = gauss[o][i]
            m = np.zeros_like(g2)
            th = np.zeros_like(g2)
            gx = g2[1:-1, 2:] - g2[1:-1, :-2]
            gy = g2[2:, 1:-1] - g2[:-2, 1:-1]
            m[1:-1, 1:-1] = np.sqrt(gx * gx + gy * gy)
            th[1:-1, 1:-1] = np.fmod(np.arctan2(gy, gx) + 360.0, 360.0)
            mags[o][i] = m
            oris[o][i] = th

    # --- nearest gaussian (sift.cpp:205-218) ---
    def nearest(scale):
        best = 100.0
        bo, bl = 0, 0
        for o in range(octaves):
            for i in range(d + 1):
                cd = abs(float(gscale[o, i]) - scale)
                if cd < best:
                    best = cd
                    bo, bl = o, i
        return bo, bl

    # --- orientation assignment (sift.cpp:163-203): NaN + >= bounds ---
    region = 8
    for p in kps:
        o, l = nearest(p.scale)
        h, w = gauss[o][l].shape
        if p.x < region or p.x >= w - region or p.y < region or p.y >= h - region:
            p.filtered = True
            continue
        p.orientation = float("nan")  # singular vertexParabola (SURVEY #21)

    kps = sorted([p for p in kps if not p.filtered],
                 key=lambda p: (p.octave, p.level, p.x, p.y))

    # --- descriptors with pyramid mutation (sift.cpp:60-110) ---
    for p in kps:
        o, l = nearest(p.scale)
        cur = gauss[o][l]
        h, w = cur.shape
        if p.x < region or p.x > w - region or p.y < region or p.y > h - region:
            p.filtered = True
            continue
        ys, xs = p.y - region, p.x - region
        ori_win = oris[o][l][ys:ys + 16, xs:xs + 16]
        mag_win = mags[o][l][ys:ys + 16, xs:xs + 16]
        gauss_win = cur[ys:ys + 16, xs:xs + 16]

        ori_win += p.orientation                 # in-place pyramid mutation
        weighting = _blur(cur, 1.6)
        mag_win += weighting[0:16, 0:16]         # top-left corner, in-place

        desc = []
        for cx in range(0, 16, 4):               # x-major cell order
            for cy in range(0, 16, 4):
                hist = np.zeros(8, np.float32)
                for xx in range(4):
                    for yy in range(4):
                        s = (mag_win[cy + yy, cx + xx]
                             * gauss_win[cy + yy, cx + xx])
                        hist[_u16_bin(float(ori_win[cy + yy, cx + xx]),
                                      45.0, 7)] += s
                tot = float(hist.sum())
                if tot != 0.0:
                    hist /= tot
                desc.extend(hist.tolist())
        p.desc = np.asarray(desc, np.float32)

    return [p for p in kps if not p.filtered]
