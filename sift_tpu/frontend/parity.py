"""Parity-mode pipeline: bit-faithful replication of the reference's
`Sift::calculate` (sift.cpp:19-57) including its order-dependent descriptor
stage.

Key quirks replicated here (others live in the kernels/stage modules):

* Canonical keypoint order. The reference detects in (octave, level, x, y)
  scan order (sift.cpp:352-355) and compacts with a *non-stable* std::sort on
  the filtered flag (sift.cpp:37,49) — survivor order is therefore
  implementation-defined in C++. We define the canonical parity order as
  (octave, level, x, y) ascending with invalid slots last, which equals the
  detection order when the unstable sort happens to be stable (documented
  decision; golden comparisons are set-based, descriptor goldens come from
  the repo's own refsim oracle which uses the same canonical order).

* Descriptor-stage pyramid mutation (sift.cpp:74-92): each keypoint ADDS its
  (NaN) orientation to the shared orientation pyramid's 16x16 window and ADDS
  `blur(full gaussian, 1.6)[0:16, 0:16]` — the blurred image's TOP-LEFT
  corner, not the window — to the magnitude pyramid's window, in keypoint
  order, before computing its own histograms. Later overlapping keypoints see
  mutated values. Implemented as a `lax.scan` over the (sorted) keypoint
  buffer carrying the padded magnitude/orientation pyramids.

* Per-cell L1 normalization: `_eliminateVectorThreshold`'s return value is
  discarded (sift.cpp:103); the only surviving effect is the in-place L1
  normalization of each 8-bin cell (algorithms.cpp:210-223). Cells are
  ordered x-major (sift.cpp:95-96).

* 8-bin histogram fold `% 7` and NaN->bin0 (algorithms.cpp:144-145 + x86
  float->int conversion; see kernels/histogram.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sift_tpu.config import SiftConfig
from sift_tpu.types import Keypoints
from sift_tpu.frontend.pyramid import build_pyramid, Pyramid
from sift_tpu.frontend.extrema import detect_extrema_octave
from sift_tpu.frontend.refine import refine_octave_parity
from sift_tpu.frontend.orientation import assign_orientation_parity, R
from sift_tpu.kernels.gradients import gradient_magnitude_orientation
from sift_tpu.kernels.gaussian import gaussian_blur
from sift_tpu.kernels.histogram import weighted_histogram


def _pad_to(arr: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    ph = h - arr.shape[-2]
    pw = w - arr.shape[-1]
    pad = [(0, 0)] * (arr.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(arr, pad)


def _canonical_sort(kp: dict) -> dict:
    """(octave, level, x, y) ascending, invalid last (module docstring)."""
    invalid = jnp.logical_not(kp["valid"]).astype(jnp.int32)
    order = jnp.lexsort((kp["y"].astype(jnp.int32), kp["x"].astype(jnp.int32),
                         kp["level"], kp["octave"], invalid))
    return {k: v[order] for k, v in kp.items()}


def descriptor_scan_parity(kp: dict, mag_stack, ori_stack, gauss_stack,
                           weight_tl, shapes: np.ndarray, cfg: SiftConfig):
    """Sequential descriptor computation with pyramid mutation.

    *_stack: (O, Lg, Hmax, Wmax) padded pyramids; weight_tl: (O, Lg, 16, 16).
    Returns (desc (N,128), desc_valid (N,)).
    """
    hs = jnp.asarray(shapes[:, 0], jnp.int32)
    ws = jnp.asarray(shapes[:, 1], jnp.int32)
    win = 2 * R

    def body(carry, slot):
        mag_p, ori_p = carry
        o, l = slot["gauss_o"], slot["gauss_l"]
        xi = slot["x"].astype(jnp.int32)
        yi = slot["y"].astype(jnp.int32)
        h, w = hs[o], ws[o]
        # `>` form bounds check (sift.cpp:65-70): keep x in [R, W-R]
        ok = ((xi >= R) & (xi <= w - R) & (yi >= R) & (yi <= h - R)
              & slot["valid"])
        # clamp starts so the slice is always legal; writes are masked by ok
        y0 = jnp.clip(yi - R, 0, mag_p.shape[2] - win)
        x0 = jnp.clip(xi - R, 0, mag_p.shape[3] - win)
        start = (o, l, y0, x0)

        ori_win = lax.dynamic_slice(ori_p, start, (1, 1, win, win))[0, 0]
        mag_win = lax.dynamic_slice(mag_p, start, (1, 1, win, win))[0, 0]
        gauss_win = lax.dynamic_slice(gauss_stack, start, (1, 1, win, win))[0, 0]

        # mutations (sift.cpp:80-92): += orientation; += blurred top-left
        ori_new = ori_win + slot["orientation"]
        mag_new = mag_win + weight_tl[o, l]

        upd = lambda p, new, old: lax.dynamic_update_slice(
            p, jnp.where(ok, new, old)[None, None], start)
        mag_p = upd(mag_p, mag_new, mag_win)
        ori_p = upd(ori_p, ori_new, ori_win)

        # histograms from the mutated values (the keypoint sees its own writes)
        ori_c = jnp.where(ok, ori_new, ori_win)
        mag_c = jnp.where(ok, mag_new, mag_win)
        # cells: x-major order (sift.cpp:95-96); window arrays are [y, x]
        oc = ori_c.reshape(4, 4, 4, 4)   # (cy, sy, cx, sx)
        mc = mag_c.reshape(4, 4, 4, 4)
        gc = gauss_win.reshape(4, 4, 4, 4)
        ocx = jnp.transpose(oc, (2, 0, 3, 1)).reshape(16, 16)  # (cell=cx*4+cy, 16)
        mcx = jnp.transpose(mc, (2, 0, 3, 1)).reshape(16, 16)
        gcx = jnp.transpose(gc, (2, 0, 3, 1)).reshape(16, 16)
        hist = weighted_histogram(ocx, mcx * gcx, 8, 45.0, parity_fold=True)
        s = hist.sum(-1, keepdims=True)
        hist = jnp.where(s > 0, hist / jnp.where(s > 0, s, 1.0), hist)
        desc = hist.reshape(128)
        return (mag_p, ori_p), (desc, ok)

    (_, _), (descs, ok) = lax.scan(body, (mag_stack, ori_stack), kp)
    return descs, ok


def extract_parity(img: jnp.ndarray, cfg: SiftConfig) -> Keypoints:
    """Full parity pipeline for a single (H, W) image."""
    pyr = build_pyramid(img, cfg)
    O = pyr.num_octaves
    Lg = cfg.gaussians_per_octave

    # detection + refinement per octave
    buffers = []
    dropped = jnp.asarray(0, jnp.int32)
    for o in range(O):
        x, y, lvl, score, valid, n_drop = detect_extrema_octave(
            pyr.dogs[o], cfg)
        dropped = dropped + n_drop
        cand = dict(x=x, y=y, level=lvl, score=score, valid=valid,
                    octave=jnp.full_like(lvl, o),
                    scale=jnp.asarray(pyr.dog_sigmas[o], jnp.float32)[lvl])
        cand = refine_octave_parity(pyr.dogs[o], cand, cfg)
        buffers.append(cand)
    kp = {k: jnp.concatenate([b[k] for b in buffers]) for k in buffers[0]}
    kp = _canonical_sort(kp)

    # Compact to the global survivor capacity before the per-keypoint
    # stages: the canonical sort puts valid slots first, so truncation only
    # drops invalid padding unless the survivor count exceeds
    # cfg.max_keypoints — which is counted into n_dropped (the candidate
    # buffers above are sized for the permissive ties-allowed extrema test,
    # e.g. ~18k raw candidates on parrot.jpg octave 0, of which ~1.4k
    # survive refinement; scanning descriptor mutation over all raw slots
    # would waste 10x+ compute).
    N = cfg.max_keypoints
    if kp["x"].shape[0] > N:
        n_valid_all = jnp.sum(kp["valid"].astype(jnp.int32))
        kp = {k: v[:N] for k, v in kp.items()}
        kept = jnp.sum(kp["valid"].astype(jnp.int32))
        dropped = dropped + jnp.maximum(n_valid_all - kept, 0)

    # magnitude/orientation pyramids (sift.cpp:130-160), padded stacks
    h0, w0 = pyr.gauss[0].shape[-2:]
    shapes = np.array([[pyr.gauss[o].shape[-2], pyr.gauss[o].shape[-1]]
                       for o in range(O)])
    mags, oris, gausses, wtls = [], [], [], []
    for o in range(O):
        g = pyr.gauss[o]
        m, th = gradient_magnitude_orientation(g, parity=True)
        # weighting image: blur of the FULL gaussian, top-left 16x16
        # (sift.cpp:87-92) — computed once per level, not per keypoint.
        # Tiny octaves (< 16px) can never host a valid window; pad with 0.
        wtl = _pad_to(gaussian_blur(g, 1.6)[..., 0:2 * R, 0:2 * R], 2 * R, 2 * R)
        mags.append(_pad_to(m, h0, w0))
        oris.append(_pad_to(th, h0, w0))
        gausses.append(_pad_to(g, h0, w0))
        wtls.append(wtl)
    mag_stack = jnp.stack(mags)
    ori_stack = jnp.stack(oris)
    gauss_stack = jnp.stack(gausses)
    weight_tl = jnp.stack(wtls)

    # orientation assignment (NaN + bounds filter, sift.cpp:163-203)
    kp = assign_orientation_parity(kp, mag_stack, ori_stack, gauss_stack,
                                   pyr.gauss_sigmas, shapes, cfg)

    # descriptors with mutation ordering
    desc, desc_ok = descriptor_scan_parity(kp, mag_stack, ori_stack,
                                           gauss_stack, weight_tl, shapes, cfg)
    valid = kp["valid"] & desc_ok

    return Keypoints(
        x=kp["x"], y=kp["y"], octave=kp["octave"], level=kp["level"],
        scale=kp["scale"], score=kp["score"], orientation=kp["orientation"],
        valid=valid, desc=desc, n_dropped=dropped,
    )
