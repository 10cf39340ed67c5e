"""Scale-space extrema detection + static top-K selection.

This replaces the reference's quadruple pixel loop
(`Sift::_findScaleSpaceExtrema`, sift.cpp:348-379) with whole-map window
reductions — one fused VPU pass per interior DoG level — followed by a
`lax.top_k` over candidate scores to produce *fixed-size* keypoint buffers
(the central static-shape decision; see SURVEY §7 "hard parts").

parity neighbourhood quirk: the reference's `subarray(x-1,y-1 -> x+1,y+1)` is
end-exclusive, i.e. a 2x2 window covering only the up-left quadrant
{(x-1,y-1),(x-1,y),(x,y-1),(x,y)} of each of the three levels (11 effective
comparisons, ties allowed). lowe mode uses the standard 26-neighbour 3x3x3
test with strict inequality plus a DoG magnitude pre-threshold.

Ordering: candidates are ranked by |centered DoG| so truncation under the
per-octave cap drops the weakest responses first. Parity golden tests must
therefore size the cap above the true candidate count (asserted in tests).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sift_tpu.config import SiftConfig
from sift_tpu.frontend.pyramid import Pyramid


def _window_extreme(x: jnp.ndarray, quadrant: bool, is_max: bool) -> jnp.ndarray:
    """Windowed max/min of a (..., H, W) map.

    quadrant=True: 2x2 up-left window ending at the pixel (parity quirk);
    quadrant=False: full 3x3 window centred on the pixel.
    """
    op = jnp.maximum if is_max else jnp.minimum
    init = -jnp.inf if is_max else jnp.inf
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad, constant_values=init)
    offs = [(0, 0), (0, 1), (1, 0), (1, 1)] if quadrant else \
           [(dy, dx) for dy in range(3) for dx in range(3)]
    h, w = x.shape[-2], x.shape[-1]
    out = None
    for dy, dx in offs:
        s = xp[..., dy:dy + h, dx:dx + w]
        out = s if out is None else op(out, s)
    return out


def detect_extrema_octave(dogs: jnp.ndarray, cfg: SiftConfig,
                          octave: int = 0) -> Tuple[jnp.ndarray, ...]:
    """dogs: (L, H, W) one octave's DoG stack. Returns fixed-size candidate
    buffers (x, y, level, score, valid), each (K,) with
    K = cfg.octave_cap(octave) in lowe mode (descending caps — higher
    octaves have 4^-o the pixels) and the flat cfg.max_keypoints_per_octave
    in parity mode (golden tests must not truncate).

    Scans interior levels 1..L-2 (the reference's loop bound, sift.cpp:353).

    Also returns `n_dropped`, a scalar int32 counting true candidates that
    did not fit in the K-slot buffer (0 when the cap is sized safely —
    parity goldens require that; the CLI warns at runtime when nonzero).
    """
    parity = cfg.mode == "parity"
    L, H, W = dogs.shape
    K = cfg.max_keypoints_per_octave if parity else cfg.octave_cap(octave)

    wmax = _window_extreme(dogs, quadrant=parity, is_max=True)
    wmin = _window_extreme(dogs, quadrant=parity, is_max=False)

    masks = []
    scores = []
    for i in range(1, L - 1):
        c = dogs[i]
        if parity:
            # no neighbour strictly greater (max) / smaller (min) in the
            # three 2x2 quadrant windows; centre is inside its own window so
            # the test is ties-allowed by construction (sift.cpp:366-372).
            is_max = (wmax[i] <= c) & (wmax[i - 1] <= c) & (wmax[i + 1] <= c)
            is_min = (wmin[i] >= c) & (wmin[i - 1] >= c) & (wmin[i + 1] >= c)
            score = jnp.abs(c - 128.0)
        else:
            # strict 26-neighbour test: centre must beat the 3x3 windows of
            # the adjacent levels and the 8 neighbours of its own level.
            own_max = _window_extreme(c[None], quadrant=False, is_max=True)[0]
            own_min = _window_extreme(c[None], quadrant=False, is_max=False)[0]
            # own window includes the centre; strictness via "no other pixel
            # >= centre" == windowed max of (map with centre removed).
            # Cheaper equivalent: max over window == centre AND centre is
            # unique. Uniqueness rarely matters for float DoGs; use >= with
            # neighbour-count tie-break skipped (standard practice).
            is_max = (own_max <= c) & (wmax[i - 1] < c) & (wmax[i + 1] < c)
            is_min = (own_min >= c) & (wmin[i - 1] > c) & (wmin[i + 1] > c)
            thresh = 0.5 * cfg.contrast_threshold * cfg.image_max / max(L - 2, 1)
            is_max &= c > thresh
            is_min &= c < -thresh
            score = jnp.abs(c)

        cand = is_max | is_min
        # interior pixels only (sift.cpp:354-355)
        interior = jnp.zeros((H, W), bool).at[1:-1, 1:-1].set(True)
        masks.append(cand & interior)
        scores.append(score)

    mask = jnp.stack(masks)                      # (L-2, H, W)
    score = jnp.stack(scores)
    flat_score = jnp.where(mask, score, -1.0).reshape(-1)
    k_eff = min(K, flat_score.shape[0])          # tiny top octaves
    if not parity and cfg.extrema_topk == "approx":
        # TPU-optimized partial sort; recall_target bounds how many true
        # top-K candidates the tail may miss (weakest responses only —
        # candidate ordering by |DoG| makes the miss set the least
        # valuable ones). Parity mode stays exact (golden tests).
        top_scores, top_idx = lax.approx_max_k(flat_score, k_eff,
                                               recall_target=0.99)
    else:
        top_scores, top_idx = lax.top_k(flat_score, k_eff)
    if k_eff < K:
        top_scores = jnp.pad(top_scores, (0, K - k_eff), constant_values=-1.0)
        top_idx = jnp.pad(top_idx, (0, K - k_eff))
    valid = top_scores >= 0.0

    n_cand = jnp.sum(mask.astype(jnp.int32))
    n_dropped = jnp.maximum(n_cand - jnp.sum(valid.astype(jnp.int32)), 0)

    lvl = top_idx // (H * W) + 1
    rem = top_idx % (H * W)
    y = rem // W
    x = rem % W
    return (x.astype(jnp.float32), y.astype(jnp.float32),
            lvl.astype(jnp.int32), top_scores, valid, n_dropped)


def detect_extrema(pyr: Pyramid, cfg: SiftConfig):
    """Run detection over all octaves; concatenate fixed-size buffers.

    Returns dict of (octaves*K,) arrays: x, y, octave, level, scale, score, valid.
    """
    xs, ys, lvls, octs, scales, scores, valids = [], [], [], [], [], [], []
    dropped = jnp.asarray(0, jnp.int32)
    for o in range(pyr.num_octaves):
        x, y, lvl, score, valid, n_drop = detect_extrema_octave(
            pyr.dogs[o], cfg, o)
        xs.append(x); ys.append(y); lvls.append(lvl)
        octs.append(jnp.full_like(lvl, o))
        # keypoint "scale" = recorded DoG scale of its level (sift.cpp:373)
        sigma_table = jnp.asarray(pyr.dog_sigmas[o], jnp.float32)
        scales.append(sigma_table[lvl])
        scores.append(score); valids.append(valid)
        dropped = dropped + n_drop
    return dict(
        x=jnp.concatenate(xs), y=jnp.concatenate(ys),
        octave=jnp.concatenate(octs), level=jnp.concatenate(lvls),
        scale=jnp.concatenate(scales), score=jnp.concatenate(scores),
        valid=jnp.concatenate(valids), n_dropped=dropped,
    )
