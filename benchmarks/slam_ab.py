"""Same-process A/B of SLAM pipeline config knobs.

Tunnel RTT drifts across sessions (round 2's 40.9-vs-61.2 discrepancy),
so config comparisons are only meaningful back-to-back in one process,
interleaved A/B/A/B to cancel drift within the session too.

Usage:
  SLAM_AB="ba_defer_kickoff=0|ba_defer_kickoff=1" python benchmarks/slam_ab.py
  (each variant: comma-separated PipelineConfig field overrides)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import slam_bench  # noqa: E402

ROUNDS = int(os.environ.get("SLAM_AB_ROUNDS", "2"))


def parse_variant(spec: str):
    out = {}
    for kv in spec.split(","):
        k, v = kv.split("=")
        out[k] = (v in ("1", "True", "true")) if v in (
            "0", "1", "True", "False", "true", "false") else float(v)
    return out


def run_variant(cfg_kw, frames, chunk):
    from sift_tpu.slam.pipeline import SfmPipeline
    kw = dict(cfg_kw)
    chunk = int(kw.pop("batch", chunk))     # pseudo-field: chunk size
    cfg = slam_bench._pipeline_cfg().replace(**kw)
    pipe = SfmPipeline(slam_bench.INTR, cfg)
    pipe.process_sequence(frames[:slam_bench.N_WARMUP], batch=chunk)
    n_steady = len(frames) - slam_bench.N_WARMUP
    t0 = time.perf_counter()
    pipe.process_sequence(frames[slam_bench.N_WARMUP:], batch=chunk)
    return n_steady / (time.perf_counter() - t0)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    specs = os.environ.get(
        "SLAM_AB", "ba_defer_kickoff=0|ba_defer_kickoff=1").split("|")
    variants = [parse_variant(s) for s in specs]
    frames = [slam_bench.render(slam_bench.STEP * i)
              for i in range(slam_bench.N_FRAMES)]
    chunk = int(os.environ.get("SLAM_BENCH_BATCH", "8"))

    rates = {s: [] for s in specs}
    for r in range(ROUNDS):
        for spec, kw in zip(specs, variants):
            rates[spec].append(run_variant(kw, frames, chunk))
            print(json.dumps(dict(round=r, variant=spec,
                                  kf_per_s=round(rates[spec][-1], 2))),
                  flush=True)
    for spec in specs:
        print(json.dumps(dict(variant=spec,
                              median=round(float(np.median(rates[spec])), 2),
                              all=[round(x, 2) for x in rates[spec]])))
    return 0


if __name__ == "__main__":
    sys.exit(main())
