"""Bisect the full-extract vs sum-of-stages gap (r4).

The r4 stage table: pyramid 1.45 + extrema 2.11 + refine 2.47 + windows
2.94 + orientation 0.55 + descriptors 5.62 + compaction 0.04 = 15.2 ms,
but the full jitted extract measures 19.4 ms (batch 8). This measures
cumulative prefixes of the real pipeline in ONE program each, so the gap
attributes to a stage boundary instead of staying folklore.

Usage: python benchmarks/extract_bisect.py   (JSON lines)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BISECT_BATCH", "8"))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    import jax
    import jax.numpy as jnp
    from bench import make_frames
    from sift_tpu.config import SiftConfig
    from sift_tpu.frontend.pyramid import build_pyramid
    from sift_tpu.frontend.extrema import detect_extrema_octave
    from sift_tpu.frontend.refine import refine_octave_lowe
    from sift_tpu.frontend.sift import (_gradient_xy, extract_batch,
                                        MAX_ORI_PEAKS)
    from sift_tpu.frontend.windows import (
        R_DESC, R_ORI, gather_gradient_windows, orientation_from_windows)
    from sift_tpu.utils.timing import chained_time, tree_scalar

    cfg = SiftConfig(mode="lowe")
    imgs = jnp.asarray(make_frames(BATCH))
    octave_factor = cfg.k ** (cfg.dogs_per_epoch - 1)
    out = []

    def prefix(upto: str):
        """One-image pipeline prefix; vmapped over the batch below."""
        def run(img):
            pyr = build_pyramid(img, cfg)
            acc = [jnp.sum(g) for o in range(pyr.num_octaves)
                   for g in (pyr.gauss[o],)]
            if upto == "pyramid":
                return sum(acc)
            vals = []
            for o in range(pyr.num_octaves):
                x, y, lvl, score, valid, nd = detect_extrema_octave(
                    pyr.dogs[o], cfg, o)
                cand = dict(x=x, y=y, level=lvl, score=score, valid=valid)
                if upto != "extrema":
                    cand = refine_octave_lowe(pyr.dogs[o], cand, cfg,
                                              pyr.dog_sigmas, o,
                                              octave_factor)
                vals.append(tree_scalar(cand))
                if upto in ("extrema", "refine"):
                    continue
                g = pyr.gauss[o]
                H, W = g.shape[-2:]
                dxm, dym = _gradient_xy(g)
                sigma_within = cand["scale"] / jnp.float32(
                    octave_factor ** o)
                table = jnp.asarray(pyr.gauss_sigmas[o], jnp.float32)
                gl = jnp.argmin(jnp.abs(table[None, :]
                                        - sigma_within[:, None]), axis=-1)
                in_bounds = ((cand["x"] >= R_ORI) & (cand["x"] < W - R_ORI)
                             & (cand["y"] >= R_ORI)
                             & (cand["y"] < H - R_ORI))
                r_eff = min(R_DESC, H // 2, W // 2)
                if r_eff < R_ORI:
                    continue
                gxw, gyw, oy0, ox0 = gather_gradient_windows(
                    dxm, dym, gl, cand["y"], cand["x"], radius=r_eff,
                    pallas=cfg.pallas)
                if upto == "windows":
                    vals.append(tree_scalar((gxw, gyw)))
                    continue
                peak_oris, peak_valid = orientation_from_windows(
                    gxw, gyw, oy0, ox0, sigma_within, in_bounds, cfg,
                    MAX_ORI_PEAKS)
                vals.append(tree_scalar((peak_oris, peak_valid)))
            return sum(acc) + sum(vals)

        return run

    for upto in ("pyramid", "extrema", "refine", "windows", "orientation"):
        fn = prefix(upto)

        def f(ims):
            return tree_scalar(jax.vmap(fn)(ims))

        t = chained_time(f, (imgs,), reps_lo=1, reps_hi=4)
        out.append(dict(metric=f"prefix_{upto}_ms",
                        value=round(t * 1e3, 3), unit="ms"))
        print(json.dumps(out[-1]), flush=True)

    def f_full(ims):
        return tree_scalar(extract_batch(ims, cfg, True))

    t = chained_time(f_full, (imgs,), reps_lo=1, reps_hi=4)
    out.append(dict(metric="prefix_full_ms", value=round(t * 1e3, 3),
                    unit="ms"))
    print(json.dumps(out[-1]), flush=True)

    def f_nodesc(ims):
        return tree_scalar(extract_batch(ims, cfg, False))

    t = chained_time(f_nodesc, (imgs,), reps_lo=1, reps_hi=4)
    out.append(dict(metric="prefix_full_nodesc_ms",
                    value=round(t * 1e3, 3), unit="ms"))
    print(json.dumps(out[-1]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
