"""Deep-dive the bootstrap gate at the knife-edge frame (VERDICT r5 #2).

Intercepts `_jit_bootstrap` inputs on the first frames of the out-and-back
scenario (both frontends) and recomputes the H-vs-E internals offline:
per-model inlier counts, the model-selection verdict, and the
triangulation-health count for EACH model — so the exact decision that
flips under ~1e-3 perturbation is visible.

Usage:  JAX_PLATFORMS=cpu python tools/diag_bootstrap.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from tests.e2e.test_image_sfm import _render, _cfg, INTR, STEP
from sift_tpu.slam.pipeline import SfmPipeline
from sift_tpu.frontend.sift import extract, extract_batch
from sift_tpu.geometry.epipolar import estimate_relative_pose
from sift_tpu.geometry.homography import (ransac_homography,
                                          decompose_homography)
from sift_tpu.geometry.triangulation import triangulate_dlt


def analyze(tag, pa, pb, valid, cfg, key):
    fx, fy, cx, cy = INTR
    focal = 0.5 * (fx + fy)
    na = jnp.stack([(pa[:, 0] - cx) / fx, (pa[:, 1] - cy) / fy], -1)
    nb = jnp.stack([(pb[:, 0] - cx) / fx, (pb[:, 1] - cy) / fy], -1)
    for att in range(4):
        k = jax.random.fold_in(key, att)
        ke, kh = jax.random.split(k)
        Re, te, est_e = estimate_relative_pose(ke, na, nb, valid,
                                               cfg.ransac, focal=focal)
        cfg_h = cfg.ransac.replace(
            inlier_threshold=cfg.ransac.inlier_threshold / focal)
        est_h = ransac_homography(kh, na, nb, valid, cfg_h)
        Rh, th, _, _ = decompose_homography(
            est_h.model, na, nb, est_h.inliers.astype(jnp.float32))

        def health(R, t, inliers):
            P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
            P2 = jnp.concatenate([R, t[:, None]], 1)
            X = triangulate_dlt(P1, P2, na, nb)
            za = X[:, 2]
            zb = (X @ R.T + t)[:, 2]
            good = inliers & (za > 1e-3) & (zb > 1e-3)
            ra = (X[:, :2] / jnp.maximum(za[:, None], 1e-6) - na)
            err = jnp.linalg.norm(ra, axis=-1) * focal
            return int(jnp.sum(good & (err < cfg.max_reproj_error_px)))

        ne = int(est_e.num_inliers)
        nh = int(est_h.num_inliers)
        use_h = nh > 1.2 * ne
        print(f"  [{tag} att{att}] E: inl={ne} ok={bool(est_e.success)} "
              f"good={health(Re, te, est_e.inliers)} | "
              f"H: inl={nh} ok={bool(est_h.success)} "
              f"good={health(Rh, th, est_h.inliers)} | "
              f"use_h={bool(use_h)}")


def run(name, fe):
    cfg = _cfg().replace(enable_loop_closure=True, loop_min_inliers=25,
                         loop_max_rmse=2.0)
    pipe = SfmPipeline(INTR, cfg, frontend=fe)
    orig = pipe._jit_bootstrap
    print(f"\n=== {name} ===")

    calls = []

    def spy(key, pa, pb, valid, _orig=orig):
        calls.append((np.asarray(key), np.asarray(pa), np.asarray(pb),
                      np.asarray(valid)))
        out = _orig(key, pa, pb, valid)
        n_good = int(np.asarray(out[3]).sum())
        print(f" frame {pipe._frame_idx}: bootstrap n_inl="
              f"{int(np.asarray(out[4]))} n_good={n_good} "
              f"success={bool(np.asarray(out[5]))} "
              f"median_flow={float(np.median(np.linalg.norm(np.asarray(pa) - np.asarray(pb), axis=-1)[np.asarray(valid)])):.1f}")
        analyze(f"f{pipe._frame_idx}", pa, pb, np.asarray(valid), cfg,
                jnp.asarray(key))
        return out

    pipe._jit_bootstrap = spy
    for i in range(6):
        pipe.process_frame(_render(STEP * i))
        if pipe.state == "tracking":
            break
    print(f" -> bootstrapped at frame {pipe._frame_idx} "
          f"(state={pipe.state})")


def main():
    cfg = _cfg()

    @jax.jit
    def fe_single(gray):
        return extract(gray.astype(jnp.float32), cfg.sift,
                       with_descriptors=True)

    @jax.jit
    def fe_b1(gray):
        kp = extract_batch(gray.astype(jnp.float32)[None], cfg.sift,
                           with_descriptors=True)
        return jax.tree.map(lambda a: a[0], kp)

    run("single-image extract (shipped)", fe_single)
    run("batched extractor at B=1", fe_b1)


if __name__ == "__main__":
    main()
