"""Long out-and-back trajectory with a genuine loop: drift + closure ATE.

VERDICT r2 #2: the e2e scenes were 8-40 frames; nothing scored a long
trajectory where drift accumulates and loop closure must repair it. This
runs 220 VGA-class frames out-and-back (the return leg revisits the
outbound views — a genuine loop for place recognition), full system on:
loop closure + Sim(3) pose graph + landmark compaction + final global
BA, and reports sim3-aligned ATE plus throughput.

Usage: python benchmarks/long_loop.py          (JSON lines)
       BENCH_SMALL=1 ...                       (CPU-sized smoke)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import slam_bench  # noqa: E402   (scene renderer + base config)

SMALL = bool(int(os.environ.get("BENCH_SMALL", "0")))
N_OUT = 24 if SMALL else 112       # outbound frames; total = 2*N_OUT - 4


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    from sift_tpu.slam.pipeline import SfmPipeline
    from sift_tpu.eval.ate import ate_rmse

    txs = ([slam_bench.STEP * i for i in range(N_OUT)]
           + [slam_bench.STEP * (N_OUT - 3 - i) for i in range(N_OUT - 4)])
    frames = [slam_bench.render(t) for t in txs]
    cfg = slam_bench._pipeline_cfg().replace(
        enable_loop_closure=True, pose_graph_sim3=True,
        loop_min_inliers=30, loop_max_rmse=2.0,
        compact_interval_kf=12)
    pipe = SfmPipeline(slam_bench.INTR, cfg)

    t0 = time.perf_counter()
    results = pipe.process_sequence(frames, batch=16)
    elapsed = time.perf_counter() - t0

    # Final global refinement over the whole map.
    try:
        gstats = pipe.run_global_ba()
    except Exception as e:                      # capacity overflow etc.
        gstats = dict(error=str(e))

    gt = np.stack([[t, 0.0, 0.0] for t in txs])
    tracked = np.asarray([bool(r["tracked"]) for r in results])
    est = pipe.positions()
    ate = float(ate_rmse(est[tracked], gt[tracked], align=True,
                         with_scale=True))
    print(json.dumps(dict(
        metric="long_loop_ate_m", value=round(ate, 4), unit="m",
        detail=(f"{len(frames)} frames out-and-back, "
                f"tracked={float(tracked.mean()):.2f}, "
                f"keyframes={len(pipe.keyframes)}, "
                f"landmarks={len(pipe.landmarks)}, "
                f"loop_closures={pipe.num_loop_closures}, "
                f"global_ba={gstats}"))))
    print(json.dumps(dict(
        metric="long_loop_kf_per_s", value=round(len(frames) / elapsed, 2),
        unit="kf/s", detail=f"{elapsed:.1f}s wall incl. closures+PGO")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
