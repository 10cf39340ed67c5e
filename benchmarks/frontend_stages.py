"""Per-stage device time of the lowe extraction pipeline.

Times each stage of `extract_lowe` in isolation with realistic
intermediates (the pyramid / candidates / windows the real pipeline
produces for the bench frames) so optimization work attacks the measured
bottleneck instead of the suspected one. All times via `chained_time`
(RTT-proof; CLAUDE.md).

Usage: python benchmarks/frontend_stages.py        (JSON lines)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("STAGES_BATCH", "8"))


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
    from sift_tpu.frontend.sift import _gradient_xy, extract_lowe, MAX_ORI_PEAKS
    from sift_tpu.frontend.windows import (
        R_DESC, R_ORI, gather_gradient_windows, orientation_from_windows,
        descriptors_from_windows)
    from sift_tpu.utils.timing import chained_time, tree_scalar

    cfg = SiftConfig(mode="lowe")
    imgs = jnp.asarray(make_frames(BATCH))
    octave_factor = cfg.k ** (cfg.dogs_per_epoch - 1)

    # ---- precompute realistic intermediates (device-resident) ----
    pyr = jax.jit(lambda im: build_pyramid(im, cfg))(imgs)
    n_oct = pyr.num_octaves

    @jax.jit
    def _cands(pyr):
        out = []
        for o in range(n_oct):
            def one(dogs):
                x, y, lvl, score, valid, _ = detect_extrema_octave(
                    dogs, cfg, o)
                return dict(x=x, y=y, level=lvl, score=score, valid=valid)
            out.append(jax.vmap(one)(pyr.dogs[o]))
        return out

    cands = _cands(pyr)

    @jax.jit
    def _refined(pyr, cands):
        return [jax.vmap(lambda d, c: refine_octave_lowe(
            d, c, cfg, pyr.dog_sigmas, o, octave_factor))(pyr.dogs[o],
                                                          cands[o])
                for o in range(n_oct)]

    refined = _refined(pyr, cands)

    @jax.jit
    def _windows(pyr, refined):
        out = []
        for o in range(n_oct):
            g = pyr.gauss[o]
            H, W = g.shape[-2:]
            r_eff = min(R_DESC, H // 2, W // 2)
            if r_eff < R_ORI:
                continue

            def one(g1, c):
                dxm, dym = _gradient_xy(g1)
                sw = c["scale"] / jnp.float32(octave_factor ** o)
                table = jnp.asarray(pyr.gauss_sigmas[o], jnp.float32)
                gl = jnp.argmin(jnp.abs(table[None] - sw[:, None]), -1)
                return gather_gradient_windows(
                    dxm, dym, gl, c["y"], c["x"], radius=r_eff,
                    pallas=cfg.pallas) + (sw,)
            out.append(jax.vmap(one)(g, refined[o]))
        return out

    wins = _windows(pyr, refined)

    # ---- timed stages ----
    res = []

    only = os.environ.get("STAGES_ONLY", "")
    wanted = set(only.split(",")) if only else None

    def want(name):
        return wanted is None or name in wanted

    def add(name, t_s, note=""):
        res.append(dict(metric=f"fe_{name}_ms", unit="ms",
                        value=round(t_s * 1e3, 3), detail=note))
        print(json.dumps(res[-1]), flush=True)

    if want("pyramid"):
        t = chained_time(lambda im: tree_scalar(build_pyramid(im, cfg)), (imgs,))
        add("pyramid", t, f"batch={BATCH}")

    def fn_ex(d0, *rest):
        ds = (d0,) + rest
        s = jnp.float32(0)
        for o in range(n_oct):
            out = jax.vmap(lambda d: detect_extrema_octave(d, cfg, o))(ds[o])
            s += tree_scalar(out)
        return s

    if want("extrema"):
        t = chained_time(fn_ex, tuple(pyr.dogs))
        add("extrema", t)

    def fn_rf(d0, *rest):
        ds = rest[:n_oct - 1]
        cs = rest[n_oct - 1:]
        dall = (d0,) + ds
        s = jnp.float32(0)
        for o in range(n_oct):
            c = cs[o]
            cand = dict(x=c[0], y=c[1], level=c[2].astype(jnp.int32),
                        score=c[3], valid=c[4] > 0)
            out = jax.vmap(lambda d, *cv: refine_octave_lowe(
                d, dict(x=cv[0], y=cv[1], level=cv[2].astype(jnp.int32),
                        score=cv[3], valid=cv[4] > 0), cfg,
                pyr.dog_sigmas, o, octave_factor))(
                dall[o], c[0], c[1], c[2], c[3], c[4])
            s += tree_scalar(out)
        return s

    cand_packs = [jnp.stack([c["x"], c["y"], c["level"].astype(jnp.float32),
                             c["score"], c["valid"].astype(jnp.float32)], 1)
                  for c in cands]
    cand_args = [jnp.stack([p[:, 0], p[:, 1], p[:, 2], p[:, 3], p[:, 4]])
                 for p in cand_packs]
    if want("refine"):
        t = chained_time(fn_rf, tuple(pyr.dogs) + tuple(cand_args))
        add("refine", t)

    def fn_gr(g0, *rest):
        gs = (g0,) + rest
        s = jnp.float32(0)
        for o in range(n_oct):
            dx, dy = _gradient_xy(gs[o])
            s += jnp.sum(dx) + jnp.sum(dy)
        return s

    if want("gradients"):
        t = chained_time(fn_gr, tuple(pyr.gauss))
        add("gradients", t)

    def fn_wf(g0, *rest):
        gs = (g0,) + rest[:n_oct - 1]
        rfs = rest[n_oct - 1:]
        s = jnp.float32(0)
        for o in range(n_oct):
            H, W = gs[o].shape[-2:]
            r_eff = min(R_DESC, H // 2, W // 2)
            if r_eff < R_ORI:
                continue
            r = rfs[o]

            def one(g1, y, x, sc):
                dxm, dym = _gradient_xy(g1)
                sw = sc / jnp.float32(octave_factor ** o)
                table = jnp.asarray(pyr.gauss_sigmas[o], jnp.float32)
                gl = jnp.argmin(jnp.abs(table[None] - sw[:, None]), -1)
                return gather_gradient_windows(dxm, dym, gl, y, x,
                                               radius=r_eff,
                                               pallas=cfg.pallas)
            out = jax.vmap(one)(gs[o], r[0], r[1], r[2])
            s += tree_scalar(out)
        return s

    rf_args = [jnp.stack([refined[o]["y"], refined[o]["x"],
                          refined[o]["scale"]]) for o in range(n_oct)]
    if want("window_fetch"):
        t = chained_time(fn_wf, tuple(pyr.gauss) + tuple(rf_args),
                         reps_lo=2, reps_hi=8)
        add("window_fetch_incl_grad", t, "includes per-octave gradient maps")

    def fn_or(w0, *rest):
        ws = (w0,) + rest
        s = jnp.float32(0)
        for o in range(len(wins)):
            gx, gy, oy0, ox0, sw = [ws[o * 5 + i] for i in range(5)]
            out = jax.vmap(lambda a, b, c, d, e: orientation_from_windows(
                a, b, c, d, e, jnp.ones(a.shape[0], bool), cfg,
                MAX_ORI_PEAKS))(gx, gy, oy0, ox0, sw)
            s += tree_scalar(out)
        return s

    win_args = []
    for wset in wins:
        win_args.extend(wset)
    if want("orientation"):
        t = chained_time(fn_or, tuple(win_args))
        add("orientation", t)

    def fn_de(mode):
        from sift_tpu.frontend.windows import descriptors_from_windows_multi

        def run(w0, *rest):
            ws = (w0,) + rest
            s = jnp.float32(0)
            for o in range(len(wins)):
                gx, gy, oy0, ox0, sw = [ws[o * 5 + i] for i in range(5)]
                B, K = gx.shape[:2]
                flat = lambda a: a.reshape((B * K,) + a.shape[2:])
                oris = (jnp.arange(B * K * MAX_ORI_PEAKS, dtype=jnp.float32)
                        .reshape(B * K, MAX_ORI_PEAKS) % 360.0)
                out = descriptors_from_windows_multi(
                    flat(gx), flat(gy), flat(oy0), flat(ox0), oris,
                    flat(sw), cfg, pallas=mode)
                s += tree_scalar(out)
            return s

        return run

    if want("descriptors"):
        # Shipped path (pallas auto -> kernel on TPU) and the XLA
        # fallback, both on the flattened shapes the pipeline uses.
        t = chained_time(fn_de("auto"), tuple(win_args))
        add("descriptors", t, f"{MAX_ORI_PEAKS} peaks, pallas=auto")
        t = chained_time(fn_de("off"), tuple(win_args))
        add("descriptors_xla", t, f"{MAX_ORI_PEAKS} peaks, pallas=off")

    # Global compaction: top-K over the concatenated per-octave buffers +
    # the field/descriptor gathers (the "unaccounted" tail of the r3
    # profile). Realistic shapes: total slots = sum of octave caps x peaks.
    slots = sum(cfg.octave_cap(o) for o in range(n_oct)) * MAX_ORI_PEAKS
    rngc = np.random.default_rng(0)
    score_c = jnp.asarray(
        rngc.standard_normal((BATCH, slots)).astype(np.float32))
    desc_c = jnp.asarray(
        rngc.standard_normal((BATCH, slots, 128)).astype(np.float32))
    fields_c = jnp.asarray(
        rngc.standard_normal((BATCH, 7, slots)).astype(np.float32))

    def fn_cp(score, desc, fields):
        from jax import lax as _lax

        def one(sc, de, fl):
            top, idx = _lax.top_k(sc, cfg.max_keypoints)
            return (jnp.sum(top) + jnp.sum(de[idx])
                    + jnp.sum(fl[:, idx]))
        return jnp.sum(jax.vmap(one)(score, desc, fields))

    if want("compaction"):
        t = chained_time(fn_cp, (score_c, desc_c, fields_c))
        add("compaction", t, f"{slots} slots -> {cfg.max_keypoints}")

    def fn_full(im):
        return tree_scalar(jax.vmap(
            lambda i: extract_lowe(i, cfg, True))(im))

    if want("full"):
        t = chained_time(fn_full, (imgs,))
        add("full_extract", t, f"batch={BATCH}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
