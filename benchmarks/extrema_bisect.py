"""Bisect the extrema stage: window reductions vs top_k (r5).

The r5 roofline put extrema at 4.27 ms / 12.8x over its bytes floor at
SLAM chunk shapes. Two sub-stages could own that: the 26-neighbour
window reductions (fused VPU passes over the DoG stack) or the
`lax.top_k` over the flat (H*W) score map. This times (a) masks+scores
only, (b) + top_k, (c) an `approx_max_k` variant, per octave.

Run ON TPU: python benchmarks/extrema_bisect.py    (JSON lines)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BISECT_BATCH", "16"))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    import jax
    import jax.numpy as jnp
    from jax import lax
    from bench import make_frames
    from sift_tpu.config import SiftConfig
    from sift_tpu.frontend.pyramid import build_pyramid
    from sift_tpu.frontend.extrema import _window_extreme
    from sift_tpu.utils.timing import chained_time

    cfg = SiftConfig(mode="lowe")
    imgs = jnp.asarray(make_frames(BATCH))
    pyr = jax.jit(lambda im: build_pyramid(im, cfg))(imgs)
    n_oct = pyr.num_octaves

    def masks_scores(dogs, octave):
        L, H, W = dogs.shape[-3:]
        wmax = _window_extreme(dogs, quadrant=False, is_max=True)
        wmin = _window_extreme(dogs, quadrant=False, is_max=False)
        outs = []
        for i in range(1, L - 1):
            c = dogs[..., i, :, :]
            own_max = _window_extreme(c, quadrant=False, is_max=True)
            own_min = _window_extreme(c, quadrant=False, is_max=False)
            is_max = ((own_max <= c) & (wmax[..., i - 1, :, :] < c)
                      & (wmax[..., i + 1, :, :] < c))
            is_min = ((own_min >= c) & (wmin[..., i - 1, :, :] > c)
                      & (wmin[..., i + 1, :, :] > c))
            thr = 0.5 * cfg.contrast_threshold * cfg.image_max / max(L - 2, 1)
            cand = (is_max & (c > thr)) | (is_min & (c < -thr))
            outs.append(jnp.where(cand, jnp.abs(c), -1.0))
        return jnp.stack(outs, axis=-3)          # (B, L-2, H, W)

    def t_masks(d0, *rest):
        ds = (d0,) + rest
        s = jnp.float32(0)
        for o in range(n_oct):
            s += jnp.sum(masks_scores(ds[o], o))
        return s

    def t_topk(d0, *rest):
        ds = (d0,) + rest
        s = jnp.float32(0)
        for o in range(n_oct):
            fs = masks_scores(ds[o], o).reshape(BATCH, -1)
            k = min(cfg.octave_cap(o), fs.shape[1])
            tv, ti = lax.top_k(fs, k)
            s += jnp.sum(tv) + jnp.sum(ti)
        return s

    def t_approx(d0, *rest):
        ds = (d0,) + rest
        s = jnp.float32(0)
        for o in range(n_oct):
            fs = masks_scores(ds[o], o).reshape(BATCH, -1)
            k = min(cfg.octave_cap(o), fs.shape[1])
            tv, ti = lax.approx_max_k(fs, k, recall_target=0.99)
            s += jnp.sum(tv) + jnp.sum(ti.astype(jnp.float32))
        return s

    for name, fn in (("masks_only", t_masks), ("masks_topk", t_topk),
                     ("masks_approxk", t_approx)):
        t = chained_time(fn, tuple(pyr.dogs), reps_lo=2, reps_hi=8)
        print(json.dumps({"metric": f"extrema_{name}_ms",
                          "value": round(t * 1e3, 3), "unit": "ms",
                          "batch": BATCH}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
