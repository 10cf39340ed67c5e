"""Perturbation robustness of the out-and-back e2e (VERDICT r4 #2).

The r4 build flipped its loop e2e (ATE 0.13 vs the 0.06 bound) on ~1e-3
descriptor/keypoint perturbations. Diagnosis (tools/diag_bootstrap.py):
the cliff was NOT the loop-closure gates — it was two-view bootstrap
model selection, which compared raw epipolar inlier counts; at ~2 px
parallax a degenerate essential matrix "wins" that comparison with a
reconstruction that triangulates zero healthy points, and which basin the
single RANSAC draw landed in flipped with the perturbation. The r5
hardening selects the model by triangulation health and takes consensus
across `boot_attempts` independent draws.

This test locks the property: inject ~1e-3 descriptor noise AND keypoint
position jitter, and the pipeline must still bootstrap promptly, track
every frame, and hold the ATE bound with >=2x margin.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sift_tpu.slam.pipeline import SfmPipeline
from sift_tpu.eval.ate import ate_rmse
from sift_tpu.frontend.sift import extract
from tests.e2e.test_image_sfm import _render, _cfg, INTR, STEP


def _noisy_frontend(cfg, desc_noise, pos_noise, seed):
    rng = np.random.default_rng(seed)

    @jax.jit
    def fe(gray):
        return extract(gray.astype(jnp.float32), cfg.sift,
                       with_descriptors=True)

    def noisy(gray):
        kp = jax.tree.map(np.asarray, fe(gray))
        d = kp.desc + rng.normal(0.0, desc_noise,
                                 kp.desc.shape).astype(np.float32)
        return kp.replace(
            desc=d,
            x=kp.x + rng.normal(0.0, pos_noise,
                                kp.x.shape).astype(np.float32),
            y=kp.y + rng.normal(0.0, pos_noise,
                                kp.y.shape).astype(np.float32))

    return noisy


@pytest.mark.slow
@pytest.mark.parametrize("seed", [7, 11])
def test_out_and_back_survives_descriptor_noise(seed):
    n_out = 12
    txs = ([STEP * i for i in range(n_out)]
           + [STEP * (n_out - 2 - i) for i in range(n_out - 1)])
    seq = [_render(t) for t in txs]
    # window_size=12 spans the outbound leg, so the sliding-window BA
    # anchors scale across the turnaround regardless of WHICH frame the
    # (perturbation-sensitive) bootstrap lands on: measured ATE 0.014 for
    # the worst-case deferred bootstrap vs 0.041 at window 8
    # (tools/diag_knife_edge.py, r5).
    cfg = _cfg().replace(enable_loop_closure=True, loop_min_inliers=25,
                         loop_max_rmse=2.0, window_size=12)
    pipe = SfmPipeline(INTR, cfg,
                       frontend=_noisy_frontend(cfg, 1e-3, 5e-3, seed))
    for f in seq:
        pipe.process_frame(f)
    assert pipe.state == "tracking"
    tracked = np.asarray([r["tracked"] for r in pipe.trajectory])
    # Bootstrap must succeed promptly: no lost frames at all.
    assert tracked.all(), np.nonzero(~tracked)
    gt = np.stack([[t, 0.0, 0.0] for t in txs])
    ate = ate_rmse(pipe.positions(), gt, align=True, with_scale=True)
    # The e2e bound is 0.06; robustness demands >=2x margin under noise.
    assert ate < 0.03, ate
