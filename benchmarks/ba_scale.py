"""Global BA at map scale (VERDICT r5 #4).

Problem: forward-motion corridor, >=256 cameras / >=32k landmarks /
>=250k observations (`io/synthetic.make_corridor_scene` — the KITTI-shaped
sparsity, each camera sees a local window). Measures the matrix-free
Schur + block-Jacobi PCG path:

  * convergence: reprojection RMSE per LM iteration (the curve, not just
    the endpoint);
  * device time per LM iteration (chained on-device; axon-safe);
  * HBM footprint: XLA-reported peak memory of the compiled program + the
    analytic live-buffer budget.

Run ON TPU:        python benchmarks/ba_scale.py
On the 8-dev CPU mesh (sharded): BA_SCALE_MESH=8 JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python benchmarks/ba_scale.py

Prints JSON lines.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CAMS = int(os.environ.get("BA_SCALE_CAMS", "256"))
N_LMS = int(os.environ.get("BA_SCALE_LMS", "32768"))
OBS_PER_CAM = int(os.environ.get("BA_SCALE_OBS_PER_CAM", "1024"))
MESH_N = int(os.environ.get("BA_SCALE_MESH", "0"))
ITERS = int(os.environ.get("BA_SCALE_ITERS", "10"))
LOSS = os.environ.get("BA_SCALE_LOSS", "huber")
CG = int(os.environ.get("BA_SCALE_CG", "50"))
POSE_NOISE = float(os.environ.get("BA_SCALE_POSE_NOISE", "0.02"))
LM_NOISE = float(os.environ.get("BA_SCALE_LM_NOISE", "0.2"))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    import jax
    import jax.numpy as jnp
    from sift_tpu.config import BAConfig
    from sift_tpu.io.synthetic import make_corridor_scene
    from sift_tpu.ba.solver import run_ba_jit
    from sift_tpu.ba.residuals import reprojection_residuals

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    sc = make_corridor_scene(rng, num_cameras=N_CAMS, num_landmarks=N_LMS,
                             obs_per_camera=OBS_PER_CAM,
                             pose_noise=POSE_NOISE,
                             landmark_noise=LM_NOISE)
    n_obs = sc["obs_cam"].shape[0]
    n_lms = sc["landmarks_init"].shape[0]
    print(json.dumps({"scene": {"cams": N_CAMS, "lms": n_lms,
                                "obs": int(n_obs),
                                "gen_s": round(time.perf_counter() - t0, 1)}}),
          flush=True)

    cfg = BAConfig(max_iterations=ITERS, cg_iterations=CG,
                   solver="pcg", loss=LOSS)
    fixed = np.zeros(N_CAMS, bool)
    fixed[:2] = True

    args = [jnp.asarray(sc[k]) for k in
            ("poses_init", "intrinsics", "landmarks_init", "obs_cam",
             "obs_lm", "obs_uv", "obs_valid")]

    @jax.jit
    def _stats(poses, lms):
        r, _ = reprojection_residuals(poses, args[1], lms, args[3],
                                      args[4], args[5])
        rn = jnp.linalg.norm(r, axis=-1)
        rn = jnp.where(args[6], rn, jnp.nan)
        rmse_ = jnp.sqrt(jnp.nansum(rn ** 2)
                         / jnp.maximum(jnp.sum(args[6]), 1))
        med = jnp.nanmedian(rn)
        return rmse_, med

    def stats(poses, lms):
        """(raw rmse, median |r|, camera-position rmse vs gt) — raw RMSE
        alone misleads for ROBUST solves: a few bounded-cost wrecked
        observations inflate it while the pose estimate is fine."""
        from sift_tpu.geometry import lie_np
        from sift_tpu.eval.ate import ate_rmse
        rmse_, med = _stats(poses, lms)
        _, centers = lie_np.se3_exp(np.asarray(poses, np.float64))
        _, gt_c = lie_np.se3_exp(np.asarray(sc["poses_gt"], np.float64))
        pos = ate_rmse(centers, gt_c, align=True, with_scale=False)
        return float(rmse_), float(med), pos

    def rmse(poses, lms):
        return stats(poses, lms)[0]

    # ---- convergence curve: one compiled program per iteration count is
    # wasteful; instead run the full solve and read its internal cost, then
    # sample the curve with per-iteration runs at a few budgets.
    curve = []
    for it in (0, 1, 2, 4, ITERS):
        c = cfg.replace(max_iterations=max(it, 0))
        if it == 0:
            curve.append((0,) + stats(args[0], args[2]))
            continue
        st = run_ba_jit(*args, c, jnp.asarray(fixed))
        curve.append((it,) + stats(st.poses, st.landmarks))
    print(json.dumps({"curve_it_rmse_median_posrmse": [
        [i, round(v, 4), round(m, 4), round(p, 4)]
        for i, v, m, p in curve]}), flush=True)

    # ---- device time per LM iteration: difference two iteration budgets
    # of the SAME compiled solve (the solver is one jitted program; the
    # delta isolates per-iteration device time, axon-safe).
    def timed(it):
        c = cfg.replace(max_iterations=it)
        st = run_ba_jit(*args, c, jnp.asarray(fixed))
        jax.block_until_ready(st.poses)
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            st = run_ba_jit(*args, c, jnp.asarray(fixed))
            float(jnp.sum(st.poses) + jnp.sum(st.landmarks))
            best = min(best, time.perf_counter() - t1)
        return best

    lo, hi = timed(2), timed(ITERS)
    per_iter = (hi - lo) / (ITERS - 2)

    # ---- memory: XLA peak for the compiled solve.
    mem_mb = None
    try:
        c = cfg.replace(max_iterations=ITERS)
        comp = jax.jit(run_ba_jit, static_argnums=(7,)).lower(
            *args, c, jnp.asarray(fixed)).compile()
        m = comp.memory_analysis()
        if m is not None:
            mem_mb = round(
                (m.temp_size_in_bytes + m.argument_size_in_bytes
                 + m.output_size_in_bytes) / 1e6, 1)
    except Exception:
        pass
    analytic_mb = round((n_obs * (12 * 4 + 2 * 63 * 4) + n_lms * 9 * 4
                         + N_CAMS * 36 * 4) / 1e6, 1)
    print(json.dumps({
        "ba_iter_device_s": round(per_iter, 4),
        "ba_solve_10it_s": round(hi, 3),
        "xla_peak_mb": mem_mb, "analytic_live_mb": analytic_mb,
    }), flush=True)

    if MESH_N:
        from sift_tpu.config import MeshConfig
        from sift_tpu.dist.mesh import make_mesh
        from sift_tpu.dist.ba_dist import run_ba_sharded
        mesh = make_mesh(MeshConfig(data=MESH_N, model=1))
        c = cfg.replace(max_iterations=ITERS)
        st = run_ba_sharded(mesh, *[np.asarray(a) for a in args],
                            c, fixed)
        jax.block_until_ready(st.poses)
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            st = run_ba_sharded(mesh, *[np.asarray(a) for a in args],
                                c, fixed)
            float(jnp.sum(st.poses) + jnp.sum(st.landmarks))
            best = min(best, time.perf_counter() - t1)
        print(json.dumps({
            "sharded_mesh": MESH_N,
            "sharded_solve_s": round(best, 3),
            "sharded_rmse_px": round(rmse(st.poses, st.landmarks), 4),
            "per_device_obs": int(-(-n_obs // MESH_N)),
            "per_device_obs_mb": round(
                -(-n_obs // MESH_N) * (12 * 4 + 2 * 63 * 4) / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
