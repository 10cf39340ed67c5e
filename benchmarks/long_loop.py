"""Long out-and-back trajectory with a GENUINE loop: drift + closure ATE.

VERDICT r2 #2: the e2e scenes were 8-40 frames; nothing scored a long
trajectory where drift accumulates and loop closure must repair it.

Scene design matters here: the slam_bench scene's planes span a ~7-14 m
FOV footprint, so a 2.8 m out-and-back never actually LEAVES the start
region — every keyframe stays genuinely covisible with keyframe 0 and
the covisibility gate rightly suppresses loop edges (measured r3: 35-65
shared landmarks between the far end and keyframe 0). This bench
therefore travels 11+ m over planes at z=4/7 m (FOV footprints 4.6/8 m),
so the start region fully exits view mid-trajectory and the return leg
must be recognized by place recognition, not tracked continuously.

Full system on: loop closure + Sim(3) pose graph + landmark compaction +
final global BA; reports sim3-aligned ATE + closures + throughput.

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

SMALL = bool(int(os.environ.get("BENCH_SMALL", "0")))

H, W = (180, 240) if SMALL else (480, 600)
FX = 200.0 if SMALL else 520.0
Z_TOP, Z_BOT = 4.0, 7.0
STEP = 0.1                       # m/frame: ~5-13 px/frame of flow
N_OUT = 28 if SMALL else 112     # out: 11.1 m >> FOV footprint at z_top
INTR = (FX, FX, W / 2.0, H / 2.0)

_TEX = None


def _textures():
    """Wide bands covering the full pan (fx*t_max/z px) with detail."""
    import scipy.ndimage as ndi
    from sift_tpu.io.image import load_image_gray
    base = load_image_gray("/root/reference/example/parrot.jpg")
    t_max = STEP * N_OUT
    need_top = int(W + FX * t_max / Z_TOP) + 120
    need_bot = int(W + FX * t_max / Z_BOT) + 120

    def band(rows, width, seed):
        reps = int(np.ceil(width / base.shape[1])) + 1
        t = np.tile(base[rows[0]:rows[1]], (1, reps))[:, :width]
        r = np.random.default_rng(seed)
        blobs = ndi.gaussian_filter(r.random(t.shape), 2.0)
        blobs = (blobs - blobs.min()) / max(np.ptp(blobs), 1e-9)
        out = 0.65 * t + 0.35 * 255.0 * blobs
        out -= out.min()
        out *= 255.0 / max(np.ptp(out), 1e-9)
        return out

    t1 = band((40, 40 + H // 2), need_top, 21)
    t2 = band((300, 300 + H - H // 2), need_bot, 22)
    return t1, t2


def render(tx: float) -> np.ndarray:
    global _TEX
    if _TEX is None:
        _TEX = _textures()
    t1, t2 = _TEX

    def sample(tex, shift):
        cols = np.clip(np.arange(W) + shift + 60.0, 0, tex.shape[1] - 2)
        c0 = np.floor(cols).astype(int)
        f = cols - c0
        return tex[:, c0] * (1 - f) + tex[:, c0 + 1] * f

    top = sample(t1, FX * tx / Z_TOP)
    bot = sample(t2, FX * tx / Z_BOT)
    img = np.concatenate([top, bot], axis=0)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


CYCLES = int(os.environ.get("CYCLES", "1"))


def _cfg():
    import slam_bench
    return slam_bench._pipeline_cfg().replace(
        enable_loop_closure=True, pose_graph_sim3=True,
        loop_min_inliers=30, loop_max_rmse=2.0,
        compact_interval_kf=12, track_saturation=True,
        # Multi-cycle runs promote ~1 keyframe per 2 frames; 256 nodes
        # saturate around frame ~500 — size the static PGO capacity to
        # the run (VERDICT r5 #4 map-scale demonstration).
        max_pose_graph_nodes=max(256, CYCLES * 256),
        max_pose_graph_edges=max(1024, CYCLES * 1024))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    from sift_tpu.slam.pipeline import SfmPipeline
    from sift_tpu.eval.ate import ate_rmse

    cycle = ([STEP * i for i in range(N_OUT)]
             + [STEP * (N_OUT - 3 - i) for i in range(N_OUT - 4)])
    txs = list(cycle)
    for _ in range(CYCLES - 1):          # re-traverse: multi-loop closure
        txs += [t + STEP for t in cycle[:-1]]
    frames = [render(t) for t in txs]
    pipe = SfmPipeline(INTR, _cfg())

    t0 = time.perf_counter()
    results = pipe.process_sequence(frames, batch=8 if SMALL else 16)
    elapsed = time.perf_counter() - t0

    gt = np.stack([[t, 0.0, 0.0] for t in txs])
    tracked = np.asarray([bool(r["tracked"]) for r in results])
    ate_online = float(ate_rmse(pipe.positions()[tracked], gt[tracked],
                                align=True, with_scale=True))

    # Final global refinement over the whole map.
    try:
        gstats = pipe.run_global_ba()
    except Exception as e:                      # capacity overflow etc.
        gstats = dict(error=str(e))

    est = pipe.positions()
    ate = float(ate_rmse(est[tracked], gt[tracked], align=True,
                         with_scale=True))
    cfg = pipe.cfg
    sat = dict(
        extract_dropped=int(pipe.chunk_stats.get("extract_dropped", 0)),
        # strongest-N pre-refinement candidate pruning — quality-managed
        # coverage control, reported but not an invariant violation
        extract_cand_pruned=int(
            pipe.chunk_stats.get("extract_cand_pruned", 0)),
        pg_nodes_used=len(pipe.keyframes),
        pg_nodes_cap=cfg.max_pose_graph_nodes,
        pg_edges_used=len(pipe.pose_edges),
        pg_edges_cap=cfg.max_pose_graph_edges,
    )
    assert sat["extract_dropped"] == 0, sat       # no silent truncation
    assert sat["pg_nodes_used"] < sat["pg_nodes_cap"], sat
    assert sat["pg_edges_used"] < sat["pg_edges_cap"], sat
    print(json.dumps(dict(
        metric="long_loop_ate_m", value=round(ate, 4), unit="m",
        detail=(f"{len(frames)} frames x{CYCLES} cycles over "
                f"{STEP * N_OUT:.1f} m, "
                f"ate_online={ate_online:.4f}, "
                f"tracked={float(tracked.mean()):.2f}, "
                f"keyframes={len(pipe.keyframes)}, "
                f"landmarks={len(pipe.landmarks)}, "
                f"loop_closures={pipe.num_loop_closures}, "
                f"saturation={sat}, "
                f"global_ba={gstats}"))))
    print(json.dumps(dict(
        metric="long_loop_kf_per_s", value=round(len(frames) / elapsed, 2),
        unit="kf/s", detail=f"{elapsed:.1f}s wall incl. closures+PGO")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
