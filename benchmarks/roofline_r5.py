"""Per-stage roofline of the SHIPPED batched extractor (VERDICT r5 #5).

Replaces the r2-era roofline table in BENCH.md. Methodology:

  * stage attribution by PREFIX DIFFERENCING of the real fused program
    (`extract_lowe_batched(..., _upto=stage)`) at the SLAM chunk shapes
    (B=16, per-octave cap 384) — not re-derived stage replicas, so fusion
    across stage boundaries is charged where XLA actually spends it;
  * FLOPs/bytes from XLA `cost_analysis()` of each compiled prefix,
    differenced the same way;
  * time via `chained_time` (RTT-proof on tunneled backends);
  * a THEORETICAL-MINIMUM-BYTES column per stage (semantic inputs read
    once + semantic outputs written once), so every "memory-bound" claim
    carries its distance-to-floor.

Run ON TPU:  python benchmarks/roofline_r5.py          (JSON lines)
Env: ROOF_BATCH (default 16), ROOF_PALLAS (auto|on|off),
     ROOF_WDT (float32|bfloat16), ROOF_TOPK (exact|approx).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("ROOF_BATCH", "16"))
PALLAS = os.environ.get("ROOF_PALLAS", "auto")
WDT = os.environ.get("ROOF_WDT", "float32")
TOPK = os.environ.get("ROOF_TOPK", "exact")


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    import jax
    import jax.numpy as jnp
    from bench import make_frames
    from sift_tpu.config import SiftConfig
    from sift_tpu.frontend.sift import extract_lowe_batched
    from sift_tpu.frontend.windows import R_DESC
    from sift_tpu.utils.timing import chained_time, tree_scalar
    from sift_tpu.utils.roofline import compiled_costs, roofline

    cfg = SiftConfig(mode="lowe", pallas=PALLAS, window_dtype=WDT,
                     extrema_topk=TOPK)
    imgs = jnp.asarray(make_frames(BATCH))
    B, H, W = imgs.shape

    stages = ["pyramid", "extrema", "refine", "windows", "orientation",
              None]  # None = full program
    names = ["pyramid", "extrema", "refine", "windows", "orientation",
             "desc+compact"]

    prefix = {}
    for upto in stages:
        def fn(ims, _u=upto):
            return tree_scalar(extract_lowe_batched(ims, cfg, True,
                                                    _upto=_u))
        t = chained_time(fn, (imgs,), reps_lo=1, reps_hi=5)
        c = compiled_costs(fn, imgs)
        prefix[upto] = dict(t=t, **c)

    # ---- theoretical minimum bytes per stage (semantic in+out, f32) ----
    # Shapes from one traced run.
    pyr = jax.eval_shape(lambda im: extract_lowe_batched(im, cfg, True,
                                                         _upto="pyramid"),
                         imgs)
    pyr_bytes = sum(int(np.prod(g.shape)) * 4 for g in
                    jax.tree.leaves(pyr))
    n_oct = len(pyr.gauss) if hasattr(pyr, "gauss") else cfg.octaves
    caps = [cfg.octave_cap(o) for o in range(n_oct)]
    Ktot = B * sum(caps)
    d = 2 * R_DESC
    win_bytes = Ktot * 2 * d * d * 4
    dog_bytes = sum(int(np.prod(g.shape)) * 4
                    for g in jax.tree.leaves(pyr.dogs)) \
        if hasattr(pyr, "dogs") else pyr_bytes // 2
    gauss_bytes = pyr_bytes - dog_bytes
    min_bytes = {
        "pyramid": B * H * W * 4 + pyr_bytes,
        "extrema": dog_bytes + Ktot * 5 * 4,
        "refine": dog_bytes + Ktot * 6 * 4,       # re-reads DoG patches
        "windows": gauss_bytes * 2 + win_bytes,   # grad maps + windows out
        "orientation": Ktot * 2 * 256 * 4,        # central 16x16, both maps
        "desc+compact": win_bytes + Ktot * 2 * 128 * 4,
    }

    rows = []
    prev = None
    for upto, name in zip(stages, names):
        cur = prefix[upto]
        if prev is None:
            t, fl, by = cur["t"], cur["flops"], cur["bytes"]
        else:
            t = cur["t"] - prev["t"]
            fl = cur["flops"] - prev["flops"]
            by = cur["bytes"] - prev["bytes"]
        prev = cur
        r = roofline(name, max(t, 1e-9), max(fl, 0.0), max(by, 1.0))
        mb = min_bytes.get(name)
        if mb:
            r["min_bytes_mb"] = round(mb / 1e6, 1)
            r["x_over_floor"] = round(by / mb, 2)
        rows.append(r)
        print(json.dumps(r), flush=True)

    full = prefix[None]
    print(json.dumps({
        "full_extract_ms": round(full["t"] * 1e3, 2),
        "batch": B, "caps": caps, "pallas": PALLAS,
        "sum_stage_ms": round(sum(max(prefix[s]["t"] -
                                      (prefix[stages[i - 1]]["t"]
                                       if i else 0.0), 0.0)
                                  for i, s in enumerate(stages)) * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
