"""Quality groundwork for bf16 gradient-map windows (r6 candidate).

The window fetch sits at 62% of HBM peak (r5 roofline); bf16 maps would
halve its bytes, but the Pallas fetch kernel's (.., 8, 128) band layout
violates the bf16 (16, 128) tiling — adopting bf16 means retiling the
kernel. Before that surgery is worth scheduling, measure the QUALITY
cost: quantize the gradient maps to bf16 ahead of the (XLA) window
fetch and compare descriptors + e2e trajectory vs f32.

Usage: JAX_PLATFORMS=cpu python tools/diag_bf16_windows.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

import sift_tpu.frontend.sift as sift_mod
from sift_tpu.frontend.sift import extract_batch
from sift_tpu.slam.pipeline import SfmPipeline
from sift_tpu.eval.ate import ate_rmse
from tests.e2e.test_image_sfm import _render, _cfg, INTR, STEP


def patch_bf16(enabled):
    """Monkeypatch the gradient maps to round-trip through bf16."""
    orig = sift_mod._gradient_xy

    def bf16_grad(g):
        dx, dy = orig(g)
        if enabled:
            dx = dx.astype(jnp.bfloat16).astype(jnp.float32)
            dy = dy.astype(jnp.bfloat16).astype(jnp.float32)
        return dx, dy

    sift_mod._gradient_xy = bf16_grad
    return orig


def main():
    cfg = _cfg()
    frames = np.stack([_render(STEP * i) for i in range(4)])

    outs = {}
    for mode in (False, True):
        orig = patch_bf16(mode)
        try:
            outs[mode] = jax.tree.map(
                np.asarray, extract_batch(jnp.asarray(frames), cfg.sift,
                                          True))
        finally:
            sift_mod._gradient_xy = orig
    a, b = outs[False], outs[True]
    v = a.valid & b.valid
    dd = np.abs(a.desc[v] - b.desc[v])
    print(f"valid flips: {int((a.valid != b.valid).sum())} / {a.valid.size}")
    print(f"descriptor |delta|: mean={dd.mean():.2e} max={dd.max():.2e}")
    print(f"orientation |delta| deg: "
          f"{np.abs(a.orientation[v] - b.orientation[v]).max():.2e}")

    # e2e trajectory with bf16 maps.
    n_out = 12
    txs = ([STEP * i for i in range(n_out)]
           + [STEP * (n_out - 2 - i) for i in range(n_out - 1)])
    seq = [_render(t) for t in txs]
    gt = np.stack([[t, 0.0, 0.0] for t in txs])
    for mode in (False, True):
        orig = patch_bf16(mode)
        try:
            pipe = SfmPipeline(INTR, _cfg())
            for f in seq:
                pipe.process_frame(f)
            tracked = np.asarray([r["tracked"] for r in pipe.trajectory])
            ate = ate_rmse(pipe.positions(), gt, align=True,
                           with_scale=True)
            print(f"bf16={mode}: tracked={tracked.mean():.2f} "
                  f"ATE={ate:.4f}")
        finally:
            sift_mod._gradient_xy = orig


if __name__ == "__main__":
    main()
