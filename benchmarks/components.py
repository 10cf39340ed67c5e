"""Component benchmarks: matching, RANSAC, bundle adjustment, blur.

Prints one JSON line per component. Run on whatever backend JAX selects
(the attached TPU in production; CPU in CI smoke runs with BENCH_SMALL=1).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = bool(int(os.environ.get("BENCH_SMALL", "0")))


def bench_matching():
    import jax.numpy as jnp
    from sift_tpu.config import MatchConfig
    from sift_tpu.matching.matcher import match_descriptors
    from sift_tpu.utils.timing import chained_time, tree_scalar

    n = 1024 if SMALL else 4096
    rng = np.random.default_rng(0)
    d = rng.standard_normal((2, n, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    cfg = MatchConfig(max_matches=n)
    valid = jnp.ones((n,), bool)

    def fn(da):
        m = match_descriptors(da, valid, jnp.asarray(d[1]), valid, cfg)
        return tree_scalar((m.distance, m.idx_a))

    t = chained_time(fn, (jnp.asarray(d[0]),))
    pairs = n * n
    return dict(metric="matching_pairs_per_s", value=round(pairs / t / 1e9, 3),
                unit="Gpairs/s", detail=f"{n}x{n} desc128, t={t*1e3:.2f}ms")


_MATCH_LARGE_SNIPPET = """
import time
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from sift_tpu.config import MatchConfig
from sift_tpu.matching.matcher import match_descriptors
from sift_tpu.utils.timing import tree_scalar
n, impl, nrep = {n}, {impl!r}, {nrep}
rng = np.random.default_rng(0)
d = rng.standard_normal((2, n, 128)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
valid = jnp.ones((n,), bool)
da, db = jnp.asarray(d[0]), jnp.asarray(d[1])
cfg = MatchConfig(max_matches=4096, impl=impl)
def fn(x):
    m = match_descriptors(x, valid, db, valid, cfg)
    return tree_scalar((m.distance, m.idx_a))
@jax.jit
def run(x):
    def body(c, _):
        return fn(x + c) * 1e-24, None
    c, _ = lax.scan(body, jnp.float32(0.0), None, length=nrep)
    return c
float(run(da))                                  # compile + warm
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter(); float(run(da))
    best = min(best, time.perf_counter() - t0)
print("RESULT", best)
"""


def bench_matching_large():
    """Large-N matching: streaming Pallas top-2 vs the XLA score-matrix
    formulation (place-recognition / offline-matching scale, where the
    materialized (N, N) matrix makes XLA memory-bound).

    Every (impl, rep-count) runs in its own subprocess and the per-call
    time is the cross-subprocess difference of the two rep counts (same
    cancellation as `chained_time`). One program per process is forced
    by a tunneled-axon runtime bug: the SECOND compiled executable
    containing this Pallas kernel in a process runs once and then trips
    INVALID_ARGUMENT on every re-execution (the first executable can be
    re-run forever; fresh process, either order — fine). Not a kernel
    property; kernel-level correctness is covered in
    tests/unit/test_pallas_match.py."""
    import subprocess

    n = 2048 if SMALL else 16384
    reps = (2, 8)
    out = {}
    for impl in ("xla", "pallas"):
        t = {}
        for nrep in reps:
            code = _MATCH_LARGE_SNIPPET.format(n=n, impl=impl, nrep=nrep)
            proc = subprocess.run([sys.executable, "-c", code], timeout=900,
                                  capture_output=True, text=True,
                                  cwd=os.path.dirname(os.path.dirname(
                                      os.path.abspath(__file__))))
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("RESULT")]
            if not line:
                raise RuntimeError(f"{impl} x{nrep} subprocess failed: "
                                   f"{proc.stderr.strip()[-300:]}")
            t[nrep] = float(line[0].split()[1])
        out[impl] = max((t[reps[1]] - t[reps[0]]) / (reps[1] - reps[0]), 1e-9)
    pairs = n * n
    return dict(metric="matching_large_pairs_per_s",
                value=round(pairs / out["pallas"] / 1e9, 3),
                unit="Gpairs/s",
                detail=(f"{n}x{n} desc128 pallas={out['pallas']*1e3:.2f}ms "
                        f"xla={out['xla']*1e3:.2f}ms "
                        f"speedup={out['xla']/out['pallas']:.2f}x"))


def bench_matching_q8():
    """int8-quantized matching (metric="l2q8") vs the f32 path at the same
    problem size — measures what the quantized dot buys on the MXU."""
    import jax.numpy as jnp
    from sift_tpu.config import MatchConfig
    from sift_tpu.matching.matcher import match_descriptors
    from sift_tpu.utils.timing import chained_time, tree_scalar

    n = 1024 if SMALL else 8192
    rng = np.random.default_rng(0)
    d = rng.standard_normal((2, n, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    valid = jnp.ones((n,), bool)
    da, db = jnp.asarray(d[0]), jnp.asarray(d[1])

    t = {}
    for metric in ("l2", "l2q8"):
        cfg = MatchConfig(max_matches=4096, metric=metric, impl="xla")

        # db as an arg, not a closure: closed-over device arrays are baked
        # into the HLO as constants (CLAUDE.md rule; ~100 MB tunnel limit).
        def fn(x, db_):
            m = match_descriptors(x, valid, db_, valid, cfg)
            return tree_scalar((m.distance, m.idx_a))

        t[metric] = chained_time(fn, (da, db))
    pairs = n * n
    return dict(metric="matching_q8_pairs_per_s",
                value=round(pairs / t["l2q8"] / 1e9, 3),
                unit="Gpairs/s",
                detail=(f"{n}x{n} desc128 l2q8={t['l2q8']*1e3:.2f}ms "
                        f"l2={t['l2']*1e3:.2f}ms "
                        f"speedup={t['l2']/t['l2q8']:.2f}x"))


def bench_ann():
    """IVF-Flat search vs brute force at the same problem size.

    The index pays off where FLOPs dominate: expected speedup ~
    n_clusters/nprobe at equal recall on clustered data (matching/ann.py).
    """
    import jax.numpy as jnp
    from sift_tpu.config import AnnConfig
    from sift_tpu.matching.ann import build_ivf, search_ivf
    from sift_tpu.matching.matcher import pairwise_sqdist
    from sift_tpu.utils.timing import chained_time, tree_scalar

    nq, ndb = (512, 4096) if SMALL else (4096, 131072)
    nc = 64 if SMALL else 256
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((nc, 128)).astype(np.float32)
    db = (centers[rng.integers(0, nc, ndb)]
          + 0.15 * rng.standard_normal((ndb, 128))).astype(np.float32)
    q = (centers[rng.integers(0, nc, nq)]
         + 0.15 * rng.standard_normal((nq, 128))).astype(np.float32)
    ann = AnnConfig(n_clusters=nc, nprobe=8,
                    bucket_capacity=max(256, 4 * ndb // nc),
                    kmeans_iters=10, query_tile=512)
    idx = build_ivf(jnp.asarray(db), jnp.ones(ndb, bool), ann)

    # The index / database ride as ARGUMENTS, not closures: a closed-over
    # device array is baked into the HLO as a constant, and at this size
    # (bucket_desc alone is ~270 MB) the serialized program overflows the
    # tunneled backend's compile-request limit (HTTP 413).
    def fn_ivf(x, idx_):
        b, s, a = search_ivf(idx_, x, jnp.ones(nq, bool), ann)
        return tree_scalar((b, s, a.astype(jnp.float32)))

    def fn_brute(x, db_):
        d = pairwise_sqdist(x, db_)
        return tree_scalar((jnp.min(d, -1), jnp.argmin(d, -1)))

    t_ivf = chained_time(fn_ivf, (jnp.asarray(q), idx))
    t_bf = chained_time(fn_brute, (jnp.asarray(q), jnp.asarray(db)))
    return dict(metric="ann_queries_per_s", value=round(nq / t_ivf, 1),
                unit="q/s",
                detail=(f"{nq}q x {ndb}db ivf={t_ivf*1e3:.2f}ms "
                        f"brute={t_bf*1e3:.2f}ms "
                        f"speedup={t_bf/t_ivf:.2f}x "
                        f"overflow={int(idx.n_overflow)}"))


def bench_ransac():
    import jax
    import jax.numpy as jnp
    from sift_tpu.config import RansacConfig
    from sift_tpu.geometry.homography import ransac_homography
    from sift_tpu.utils.timing import chained_time, tree_scalar

    n = 512 if SMALL else 2048
    hyp = 256 if SMALL else 1024
    rng = np.random.default_rng(1)
    pa = rng.uniform(0, 640, (n, 2)).astype(np.float32)
    H = np.array([[0.9, 0.05, 20], [-0.02, 1.05, -10], [1e-4, 5e-5, 1]])
    ph = np.concatenate([pa, np.ones((n, 1))], -1) @ H.T
    pb = (ph[:, :2] / ph[:, 2:]).astype(np.float32)
    cfg = RansacConfig(num_hypotheses=hyp)
    key = jax.random.PRNGKey(0)
    valid = jnp.ones((n,), bool)

    def fn(a):
        est = ransac_homography(key, a, jnp.asarray(pb), valid, cfg)
        return tree_scalar((est.model, est.num_inliers))

    t = chained_time(fn, (jnp.asarray(pa),))
    return dict(metric="ransac_hypotheses_per_s",
                value=round(hyp / t / 1e3, 1), unit="khyp/s",
                detail=f"{hyp} hyp x {n} matches, t={t*1e3:.2f}ms")


def bench_ba():
    import jax.numpy as jnp
    from sift_tpu.config import BAConfig
    from sift_tpu.ba.solver import run_ba
    from sift_tpu.io.synthetic import make_scene, pad_observations
    from sift_tpu.utils.timing import chained_time, tree_scalar

    ncam, nlm, cap = (8, 256, 2048) if SMALL else (32, 2048, 65536)
    scene = make_scene(np.random.default_rng(2), num_cameras=ncam,
                       num_landmarks=nlm, pose_noise=0.01,
                       landmark_noise=0.05)
    scene = pad_observations(scene, cap)
    fixed = np.zeros(ncam, bool)
    fixed[:2] = True
    iters = 5
    cfg = BAConfig(max_iterations=iters, cg_iterations=30)
    args = [jnp.asarray(scene[k]) for k in
            ("poses_init", "intrinsics", "landmarks_init", "obs_cam",
             "obs_lm", "obs_uv", "obs_valid")]

    def fn(poses, *rest):
        st = run_ba(poses, *rest, cfg, jnp.asarray(fixed))
        return tree_scalar((st.poses, st.landmarks, st.cost))

    t = chained_time(fn, tuple(args), reps_lo=1, reps_hi=4)
    n_obs = int(scene["obs_valid"].sum())
    return dict(metric="ba_obs_iters_per_s",
                value=round(n_obs * iters / t / 1e6, 3), unit="Mobs*it/s",
                detail=f"{ncam}cam/{nlm}lm/{n_obs}obs x{iters}LM, "
                       f"t={t*1e3:.1f}ms")


def bench_blur():
    import jax.numpy as jnp
    from sift_tpu.kernels.gaussian import gaussian_blur
    from sift_tpu.utils.timing import chained_time

    b, h, w = (2, 256, 256) if SMALL else (8, 488, 600)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (b, h, w)).astype(np.float32))

    def fn(x):
        return jnp.sum(gaussian_blur(x, 1.6))

    t = chained_time(fn, (img,))
    gb = b * h * w * 4 * 2 / 1e9
    return dict(metric="blur_throughput", value=round(gb / t, 1),
                unit="GB/s", detail=f"{b}x{h}x{w} sigma=1.6, t={t*1e3:.2f}ms")


def bench_roofline():
    """Per-stage roofline table (SURVEY §5): chained time + XLA-reported
    FLOPs/bytes -> achieved rate, % of v5e peaks, binding wall."""
    import jax
    import jax.numpy as jnp
    from sift_tpu.config import SiftConfig, MatchConfig, BAConfig
    from sift_tpu.frontend.sift import extract
    from sift_tpu.kernels.gaussian import gaussian_blur
    from sift_tpu.matching.matcher import match_descriptors
    from sift_tpu.ba.solver import run_ba
    from sift_tpu.io.synthetic import make_scene, pad_observations
    from sift_tpu.utils.roofline import measure_roofline
    from sift_tpu.utils.timing import tree_scalar

    rng = np.random.default_rng(0)
    rows = []

    # blur
    b, h, w = (2, 128, 128) if SMALL else (8, 488, 600)
    img = jnp.asarray(rng.uniform(0, 255, (b, h, w)).astype(np.float32))
    rows.append(measure_roofline(
        "gaussian_blur", lambda x: jnp.sum(gaussian_blur(x, 1.6)), (img,)))

    # full frontend (one frame)
    cfg = SiftConfig(mode="lowe")
    frame = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))

    def fn_frontend(x):
        kp = extract(x, cfg, True)
        return tree_scalar((kp.x, kp.score, kp.desc))

    rows.append(measure_roofline("frontend_extract", fn_frontend, (frame,),
                                 reps_lo=1, reps_hi=4))

    # matcher
    n = 1024 if SMALL else 4096
    d = rng.standard_normal((2, n, 128)).astype(np.float32)
    mc = MatchConfig(max_matches=n)
    valid = jnp.ones((n,), bool)

    def fn_match(da):
        m = match_descriptors(da, valid, jnp.asarray(d[1]), valid, mc)
        return tree_scalar((m.distance, m.idx_a))

    rows.append(measure_roofline("matcher", fn_match, (jnp.asarray(d[0]),)))

    # window BA (full visibility: obs = ncam * nlm must fit cap)
    ncam, nlm, cap = (8, 256, 2048) if SMALL else (8, 1024, 8192)
    scene = make_scene(np.random.default_rng(2), num_cameras=ncam,
                      num_landmarks=nlm, pose_noise=0.01,
                      landmark_noise=0.05)
    scene = pad_observations(scene, cap)
    fixed = np.zeros(ncam, bool)
    fixed[:2] = True
    bcfg = BAConfig(max_iterations=8, cg_iterations=20)
    args = tuple(jnp.asarray(scene[k]) for k in
                 ("poses_init", "intrinsics", "landmarks_init", "obs_cam",
                  "obs_lm", "obs_uv", "obs_valid"))

    def fn_ba(poses, *rest):
        st = run_ba(poses, *rest, bcfg, jnp.asarray(fixed))
        return tree_scalar((st.poses, st.landmarks, st.cost))

    rows.append(measure_roofline("window_ba", fn_ba, args,
                                 reps_lo=1, reps_hi=4))
    return rows


def main():
    for fn in (bench_matching, bench_matching_large, bench_matching_q8,
               bench_ann, bench_ransac, bench_ba, bench_blur):
        try:
            print(json.dumps(fn()))
        except Exception as e:  # keep the report going
            print(json.dumps({"metric": fn.__name__, "error": str(e)[:200]}))
    try:
        for row in bench_roofline():
            print(json.dumps({"metric": "roofline", **row}))
    except Exception as e:
        print(json.dumps({"metric": "roofline", "error": str(e)[:200]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
