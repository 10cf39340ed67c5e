"""Headline benchmark: SIFT keyframe throughput per chip.

Measures batched lowe-mode SIFT extraction (full pipeline: pyramid, extrema,
refinement, orientation, 128-D descriptors) on VGA-class frames — the
keyframe-frontend workload of the SLAM engine.

Timing methodology (important on remote/tunneled TPU backends, where
`block_until_ready` returns before execution and a single host read carries
~26 ms of RTT): repetitions are chained *on device* inside one jit'd
`lax.scan` whose carry perturbs the input (defeats CSE) and whose body
reduces every output field (defeats dead-code elimination); wall time between
two repetition counts isolates pure per-iteration device time.

Prints ONE JSON line:
  {"metric": "keyframes_per_s_per_chip", "value": N, "unit": "kf/s",
   "vs_baseline": M}

`vs_baseline` is the speedup over the reference C++ implementation, which
needs ~15 s for a ~600x600 image on a desktop CPU core
(/root/reference/README.md:68-70, mirrored in BASELINE.md) -> 0.0667 img/s.
The BASELINE.json north-star target is >100 keyframes/s per v5e chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

REFERENCE_IMG_PER_S = 1.0 / 15.0   # README.md:68-70, ~600x600 image
BATCH = 8
REPS_LO, REPS_HI = 2, 12


def make_frames(batch: int, h: int = 488, w: int = 600) -> np.ndarray:
    """A batch of VGA-class test frames in [0, 255].

    Uses the reference's example parrot.jpg when available (realistic
    keypoint density); otherwise a synthetic textured pattern.
    """
    base = None
    for cand in (os.path.join(REPO, "data", "parrot.jpg"),
                 "/root/reference/example/parrot.jpg"):
        if os.path.exists(cand):
            try:
                from sift_tpu.io.image import load_image_gray
                base = load_image_gray(cand)
                h, w = base.shape
                break
            except Exception:
                pass
    if base is None:
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = (128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 11.0)
                + 40 * rng.standard_normal((h, w))).clip(0, 255).astype(np.float32)
    rng = np.random.default_rng(1)
    shifts = rng.uniform(-2.0, 2.0, size=(batch, 1, 1)).astype(np.float32)
    return np.clip(base[None] + shifts, 0.0, 255.0).astype(np.float32)


def make_chained(cfg, reps: int):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from sift_tpu.frontend.sift import extract_batch

    @jax.jit
    def run(imgs):
        def body(c, _):
            out = extract_batch(imgs + c, cfg, True)
            # Touch every output field so no stage is dead code.
            s = (jnp.sum(out.x) + jnp.sum(out.y) + jnp.sum(out.score) +
                 jnp.sum(out.orientation) + jnp.sum(out.scale) +
                 jnp.sum(out.desc) + jnp.sum(out.valid))
            return s * 1e-24, None

        c, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    return run


def probe_backend_alive(timeout_s: int = 120) -> bool:
    """True iff the JAX backend initializes and executes in a subprocess.

    The tunneled axon TPU can go unreachable in a way that hangs
    `jax.devices()` itself (observed r4: backend init blocked >300 s).
    A hung bench leaves the driver with NOTHING — probing in a killable
    subprocess converts that into a fast, diagnosable failure.
    """
    import re
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((8, 8));"
            "print('alive sum=%s platform=%s' % (float((x @ x).sum()),"
            " jax.devices()[0].platform))")
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout_s)
        # Parse the single marker line with a regex over ALL of stdout:
        # plugin/atexit chatter printed after our line must not confuse
        # the platform detection.
        m = re.search(r"alive sum=\S+ platform=(\w+)", p.stdout)
        if p.returncode != 0 or m is None:
            return False
        # A failed accelerator plugin can fall back to the always-present
        # CPU backend; that would silently publish CPU numbers as the
        # headline. Accept cpu only when the environment asked for it.
        if m.group(1) == "cpu" and \
                os.environ.get("JAX_PLATFORMS", "") != "cpu":
            print("bench.py: backend probe landed on CPU (accelerator "
                  "plugin failed?)", file=sys.stderr)
            return False
        return True
    except Exception:
        return False


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    if not probe_backend_alive() and not probe_backend_alive(timeout_s=240):
        print("bench.py: JAX backend unreachable (tunnel down?) — "
              "no measurement possible", file=sys.stderr)
        return 3
    import jax
    import jax.numpy as jnp
    from sift_tpu.config import SiftConfig

    cfg = SiftConfig(mode="lowe")
    frames = jnp.asarray(make_frames(BATCH))

    times = {}
    for reps in (REPS_LO, REPS_HI):
        fn = make_chained(cfg, reps)
        float(fn(frames))                     # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(frames))                 # host read forces execution
            best = min(best, time.perf_counter() - t0)
        times[reps] = best

    per_batch = (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)
    per_batch = max(per_batch, 1e-9)
    kf_per_s = BATCH / per_batch

    out = {
        "metric": "keyframes_per_s_per_chip",
        "value": round(kf_per_s, 2),
        "unit": "kf/s",
        "vs_baseline": round(kf_per_s / REFERENCE_IMG_PER_S, 1),
    }
    slam = run_slam_bench()
    if slam is not None:
        out["slam_kf_per_s"] = slam["value"]
        # Link weather at measurement time: the SLAM loop is wall-clock
        # over a shared tunnel whose host->device bandwidth swings
        # 20-210 MB/s (measured 37.8 vs 119.7 kf/s same-day, r3).
        # Weather-independent device floor: the same steady-state programs
        # re-timed with chained on-device reps (what the engine sustains
        # per chip with a co-located host; see slam_bench.bench_device_floor).
        for k in ("tunnel_rtt_ms", "tunnel_upload_mb_s",
                  "slam_kf_per_s_device", "device_ms_extract",
                  "device_ms_chunk_track", "device_ms_window_ba",
                  "device_ba_solves_per_chunk", "device_floor_error"):
            if k in slam:
                out[k] = slam[k]
    print(json.dumps(out))
    return 0


def run_slam_bench(timeout_s: int = 1500):
    """End-to-end SLAM system throughput (benchmarks/slam_bench.py) in a
    subprocess; None on any failure so the headline never breaks."""
    import subprocess
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "benchmarks", "slam_bench.py")],
            capture_output=True, text=True, timeout=timeout_s,
            env={**os.environ, "SLAM_BENCH_SYSTEM_ONLY": "1"})
        for line in p.stdout.splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("metric") == "slam_kf_per_s":
                return rec
    except Exception:
        pass
    return None


if __name__ == "__main__":
    sys.exit(main())
