"""Image-size scaling sweep vs the reference's published grid.

The C++ reference publishes ~0.7 s at ~300x300, ~15 s at ~600x600 and
~11 min at ~1500x1500 (super-quadratic: a per-keypoint convolution of the
ENTIRE image during descriptor creation, /root/reference/sift.cpp:87;
grid at /root/reference/README.md:68-71). This sweep measures the TPU
extractor at the same sizes — also a stress test of the static-shape
handling, the blur-matrix/band-conv crossover (kernels/gaussian.py) and
the Pallas window kernel layout at large W.

Usage: python benchmarks/size_sweep.py     (JSON lines; TPU)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, H, W, reference seconds per image)
GRID = [("300", 300, 300, 0.7),
        ("600", 600, 600, 15.0),
        ("1500", 1500, 1500, 660.0)]
BATCH = int(os.environ.get("SWEEP_BATCH", "4"))


def make(h, w, batch):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 11.0)
            + 40 * rng.standard_normal((h, w))).clip(0, 255)
    shifts = rng.uniform(-2, 2, (batch, 1, 1)).astype(np.float32)
    return np.clip(base[None] + shifts, 0, 255).astype(np.float32)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    import jax.numpy as jnp
    from sift_tpu.config import SiftConfig
    from sift_tpu.frontend.sift import extract_batch
    from sift_tpu.utils.timing import chained_time, tree_scalar

    for label, h, w, ref_s in GRID:
        # Larger images host proportionally more keypoints.
        per_oct = 512 if h <= 640 else 1024
        cfg = SiftConfig(mode="lowe", max_keypoints=2 * per_oct,
                         max_keypoints_per_octave=per_oct)
        batch = BATCH if h <= 640 else max(1, BATCH // 4)
        imgs = jnp.asarray(make(h, w, batch))

        def fn(x):
            return tree_scalar(extract_batch(x, cfg, True))

        t = chained_time(fn, (imgs,), reps_lo=1, reps_hi=4)
        per_img = t / batch
        print(json.dumps(dict(
            metric=f"size_sweep_{label}_img_per_s",
            value=round(1.0 / per_img, 2), unit="img/s",
            detail=(f"{h}x{w} batch={batch} {per_img*1e3:.2f} ms/img, "
                    f"reference {ref_s:g}s -> {ref_s/per_img:.0f}x"))),
            flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
