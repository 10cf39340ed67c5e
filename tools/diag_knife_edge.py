"""Diagnose the loop-closure knife edge (VERDICT r4 #2).

Runs the `test_loop_closure_from_pixels` scenario (out-and-back from
pixels, per-frame path) under three frontends:
  a) single-image extract (the shipped path),
  b) batched extractor at B=1 (the unification candidate that flipped the
     e2e in r4: ATE 0.13 vs the 0.06 bound),
  c) single-image extract with ~1e-3 descriptor noise injected
     (perturbation robustness probe).

For each run prints: per-candidate loop-probe gate values (votes ->
n_has/n_inl/rmse vs thresholds), accepted closures, tracking rate, and
final sim3 ATE — so the gate that sits on the cliff is identified by
measurement, not conjecture.

Usage:  JAX_PLATFORMS=cpu python tools/diag_knife_edge.py
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
from sift_tpu.eval.ate import ate_rmse
from sift_tpu.frontend.sift import extract_batch


def run(name, frontend, noise=0.0, seed=7, n_out=12, **cfg_over):
    txs = ([STEP * i for i in range(n_out)]
           + [STEP * (n_out - 2 - i) for i in range(n_out - 1)])
    seq = [_render(t) for t in txs]
    cfg = _cfg().replace(enable_loop_closure=True, loop_min_inliers=25,
                         loop_max_rmse=2.0, **cfg_over)

    fe = frontend
    if noise > 0.0:
        rng = np.random.default_rng(seed)
        base = frontend

        def fe(gray):
            kp = base(gray)
            kp = jax.tree.map(np.asarray, kp)
            d = kp.desc + rng.normal(0.0, noise,
                                     kp.desc.shape).astype(np.float32)
            return kp.replace(desc=d)

    pipe = SfmPipeline(INTR, cfg, frontend=fe)
    for f in seq:
        pipe.process_frame(f)
    tracked = [r["tracked"] for r in pipe.trajectory]
    gt = np.stack([[t, 0.0, 0.0] for t in txs])
    ate = ate_rmse(pipe.positions(), gt, align=True, with_scale=True)

    print(f"\n=== {name} ===")
    print(f"state={pipe.state} tracked={np.mean(tracked):.2f} "
          f"kfs={len(pipe.keyframes)} closures={pipe.num_loop_closures} "
          f"ATE={ate:.4f}")
    half = pipe.cfg.keyframe_min_inliers // 2
    # Aligned per-frame position error (where the ATE accumulates).
    from sift_tpu.eval.ate import umeyama_alignment
    est = np.asarray(pipe.positions(), np.float64)
    s_, R_, t_ = umeyama_alignment(est, gt, with_scale=True)
    ali = (s_ * (R_ @ est.T)).T + t_
    perr = np.linalg.norm(ali - gt, axis=1)
    steps = np.r_[0.0, np.linalg.norm(np.diff(ali, axis=0), axis=1)]
    gsteps = np.r_[0.0, np.linalg.norm(np.diff(gt, axis=0), axis=1)]
    for r, e, st_, gs in zip(pipe.trajectory, perr, steps, gsteps):
        flag = "" if r["tracked"] else "  <-- LOST"
        ratio = st_ / gs if gs > 1e-9 else float("nan")
        print(f"  f{r['frame_idx']:3d} inl={r.get('n_inliers', -1):4d} "
              f"(gate {half}) kf={int(bool(r.get('is_keyframe')))} "
              f"rmse={float(r.get('rmse', float('nan'))):.2f} "
              f"err={e:.3f} step_ratio={ratio:.3f}{flag}")
    for rec in pipe.loop_probe_log:
        print(f"  probe kf={rec['kf']} old={rec['old']} "
              f"n_has={rec['n_has']} n_inl={rec['n_inl']} "
              f"rmse={rec['rmse']:.3f} accepted={rec['accepted']}")
    if not pipe.loop_probe_log:
        print("  (no candidates ever probed — gate is at the vote/"
              "covisibility stage)")
    return ate, pipe


def main():
    from sift_tpu.config import SiftConfig
    from sift_tpu.frontend.sift import extract

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

    only = os.environ.get("DIAG_ONLY", "")
    scenarios = [
        ("single-image extract (shipped)", fe_single, {}, {}),
        ("batched extractor at B=1", fe_b1, {}, {}),
        ("single + 1e-3 descriptor noise", fe_single, {"noise": 1e-3}, {}),
        ("batched B=1, parallax gate 3.5px", fe_b1, {},
         {"min_bootstrap_parallax": 3.5}),
        ("single, parallax gate 3.5px (late boot isolate)", fe_single, {},
         {"min_bootstrap_parallax": 3.5}),
        ("lateboot+tri_angle 0.5", fe_single, {},
         {"min_bootstrap_parallax": 3.5,
          "min_triangulation_angle_deg": 0.5}),
        ("lateboot+window 8", fe_single, {},
         {"min_bootstrap_parallax": 3.5, "window_size": 8}),
        ("w8 single", fe_single, {}, {"window_size": 8}),
        ("w8 B=1", fe_b1, {}, {"window_size": 8}),
        ("w8 noise", fe_single, {"noise": 1e-3}, {"window_size": 8}),
        ("w8 noise seed2", fe_single, {"noise": 1e-3, "seed": 11},
         {"window_size": 8}),
        ("w12 noise", fe_single, {"noise": 1e-3}, {"window_size": 12}),
        ("w16 noise", fe_single, {"noise": 1e-3}, {"window_size": 16}),
    ]
    for name, fe, kw, cfg_over in scenarios:
        if only and only not in name:
            continue
        run(name, fe, **kw, **cfg_over)


if __name__ == "__main__":
    main()
