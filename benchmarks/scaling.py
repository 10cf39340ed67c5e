"""Scaling-efficiency report: frontend + distributed BA over mesh sizes.

BASELINE.json asks for keyframes/s at 1 chip / 1 host / N>=2 hosts with
>=80% efficiency. This script measures sharded extraction throughput and
distributed-BA step time for every power-of-two mesh that fits the attached
devices and prints one JSON line per configuration with efficiency relative
to the single-device run.

On real multi-chip hardware this is the report; on a CPU dev box run with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to validate mechanics (virtual-device numbers measure overhead, not ICI).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sift_tpu.config import SiftConfig, BAConfig, MeshConfig
    from sift_tpu.dist.mesh import make_mesh
    from sift_tpu.dist.ba_dist import run_ba_sharded
    from sift_tpu.frontend.sift import extract
    from sift_tpu.io.synthetic import make_scene, pad_observations
    from sift_tpu.utils.timing import chained_time, tree_scalar

    small = bool(int(os.environ.get("BENCH_SMALL", "0")))
    ndev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]
    per_dev_batch = 1 if small else 4
    h, w = (128, 160) if small else (488, 600)
    rng = np.random.default_rng(0)
    cfg = SiftConfig(mode="lowe", octaves=2 if small else 4,
                     max_keypoints=128 if small else 1024,
                     max_keypoints_per_octave=128 if small else 512)

    base_kfps = None
    for n in sizes:
        mesh = make_mesh(MeshConfig(data=n, model=1))
        b = per_dev_batch * n
        frames = rng.uniform(0, 255, (b, h, w)).astype(np.float32)
        sharding = NamedSharding(mesh, P(("data",)))
        imgs = jax.device_put(jnp.asarray(frames), sharding)

        def fn(x):
            kp = jax.vmap(lambda im: extract(im, cfg, True))(x)
            return tree_scalar((kp.x, kp.score, kp.desc))

        t = chained_time(fn, (imgs,), reps_lo=2, reps_hi=8)
        kfps = b / t
        if base_kfps is None:
            base_kfps = kfps / n  # per-device baseline at n=1
        eff = kfps / (base_kfps * n)
        print(json.dumps({
            "metric": "frontend_scaling", "devices": n,
            "value": round(kfps, 1), "unit": "kf/s",
            "efficiency": round(eff, 3)}))

    # Distributed BA step time across meshes.
    scene = make_scene(np.random.default_rng(1), num_cameras=16,
                       num_landmarks=1024, pose_noise=0.01,
                       landmark_noise=0.05)
    scene = pad_observations(scene, 32768)
    fixed = np.zeros(16, bool)
    fixed[:2] = True
    ba_cfg = BAConfig(max_iterations=3, cg_iterations=30)

    import time
    base_t = None
    for n in sizes:
        mesh = make_mesh(MeshConfig(data=n, model=1))
        args = (jnp.asarray(scene["poses_init"]),
                jnp.asarray(scene["intrinsics"]),
                jnp.asarray(scene["landmarks_init"]),
                scene["obs_cam"], scene["obs_lm"], scene["obs_uv"],
                scene["obs_valid"])
        # Both landmark-block reshard strategies (SURVEY §5): psum
        # (replicate V, invert everywhere) vs reduce_scatter (Ulysses-style
        # by-landmark ownership of the inverse).
        for v_mode in ("psum", "reduce_scatter"):
            run = lambda: run_ba_sharded(mesh, *args, cfg=ba_cfg,
                                         fixed_cam_mask=jnp.asarray(fixed),
                                         v_mode=v_mode)
            st = run()
            float(st.cost)              # warm/compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                st = run()
                float(st.cost)
                best = min(best, time.perf_counter() - t0)
            if base_t is None:
                base_t = best
            print(json.dumps({
                "metric": "ba_step_scaling", "devices": n,
                "v_mode": v_mode,
                "value": round(best * 1e3, 2), "unit": "ms",
                "speedup": round(base_t / best, 3)}))

    # Row-sharded large-N matching across meshes (dist/matching_dist.py).
    from sift_tpu.config import MatchConfig
    from sift_tpu.dist.matching_dist import match_large_sharded
    na, nb = (1024, 1024) if small else (8192, 8192)
    dm = rng.standard_normal((na + nb, 128)).astype(np.float32)
    da, db = jnp.asarray(dm[:na]), jnp.asarray(dm[na:])
    va, vb = jnp.ones(na, bool), jnp.ones(nb, bool)
    mcfg = MatchConfig(max_matches=1024, impl="xla")
    base_m = None
    for n in sizes:
        mesh = make_mesh(MeshConfig(data=n, model=1))
        m = match_large_sharded(mesh, da, va, db, vb, mcfg)
        jax.block_until_ready(m)            # warm/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            m = match_large_sharded(mesh, da, va, db, vb, mcfg)
            jax.block_until_ready(m)
            best = min(best, time.perf_counter() - t0)
        if base_m is None:
            base_m = best
        print(json.dumps({
            "metric": "match_large_scaling", "devices": n,
            "value": round(best * 1e3, 2), "unit": "ms",
            "speedup": round(base_m / best, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
