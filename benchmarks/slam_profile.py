"""Host-side phase profile of the steady-state SLAM loop.

Wraps the pipeline's host methods (and the blocking chunk read) with
wall-clock timers and prints per-phase totals over the steady-state
frames — the tool for deciding which term of the per-chunk budget to
attack next. RTT-inclusive by design (this is the host loop, not the
device roofline; benchmarks/slam_bench.py's stage table covers that).

Usage: python benchmarks/slam_profile.py     (JSON on stdout)
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import slam_bench  # noqa: E402  (sibling module: scene + config)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    from sift_tpu.slam.pipeline import SfmPipeline

    frames = [slam_bench.render(slam_bench.STEP * i)
              for i in range(slam_bench.N_FRAMES)]
    pipe = SfmPipeline(slam_bench.INTR, slam_bench._pipeline_cfg())
    chunk = int(os.environ.get("SLAM_BENCH_BATCH", "8"))
    pipe.process_sequence(frames[:slam_bench.N_WARMUP], batch=chunk)

    totals = defaultdict(float)
    counts = defaultdict(int)

    def wrap(name, fn):
        def inner(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            totals[name] += time.perf_counter() - t0
            counts[name] += 1
            return out
        return inner

    for name in ("_promote_keyframe", "_try_loop_closure",
                 "_run_window_ba", "_flush_ba", "_build_local_map",
                 "_process_chunk_tracked", "_index_keyframe",
                 "_run_pose_graph", "compact_landmarks",
                 "_jit_track_chunk_promo", "_jit_extract_batch"):
        setattr(pipe, name, wrap(name, getattr(pipe, name)))

    n_steady = len(frames) - slam_bench.N_WARMUP
    pipe._phase_log = {}
    t0 = time.perf_counter()
    pipe.process_sequence(frames[slam_bench.N_WARMUP:], batch=chunk)
    elapsed = time.perf_counter() - t0

    # _promote_keyframe nests loop-closure + window BA; report both raw
    # and exclusive.
    excl_promo = (totals["_promote_keyframe"] - totals["_try_loop_closure"]
                  - totals["_run_window_ba"] - totals["compact_landmarks"]
                  - totals["_run_pose_graph"] - totals["_index_keyframe"])
    report = {
        "total_s": round(elapsed, 3),
        "kf_per_s": round(n_steady / elapsed, 2),
        "phases_ms": {k: round(v * 1e3, 1) for k, v in
                      sorted(totals.items(), key=lambda kv: -kv[1])},
        "calls": dict(counts),
        "promote_exclusive_ms": round(excl_promo * 1e3, 1),
        "unaccounted_ms": round(
            (elapsed - totals["_process_chunk_tracked"]
             - totals["_jit_extract_batch"]) * 1e3, 1),
        "inner_ms": {k: [round(x * 1e3, 1) for x in v]
                     for k, v in pipe._phase_log.items()},
    }
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
