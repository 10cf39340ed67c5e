"""Serving layer: a warm, fixed-capacity feature/matching service.

The reference is a one-shot CLI (`main.cpp`: decode one image, write two
files, exit); a production deployment keeps the compiled programs and the
device resident and answers requests at the latency of ONE dispatch. This
module provides that as

- `FeatureService` — the embeddable object: compiled-once extract /
  match / two-view programs over fixed-capacity buffers (no recompiles
  at serve time — the static-shape rule is exactly what makes a
  low-latency service possible on XLA), explicit `warmup()`, per-request
  device-time-free host API returning plain numpy.
- `python -m sift_tpu.serve --port 8080` — a minimal stdlib
  JSON-over-HTTP front (no new dependencies): POST /extract, /match,
  /twoview with base64 PNG/JPEG payloads; GET /healthz.

Batching: the embeddable API accepts (B, H, W) batches directly and the
HTTP front accepts multi-image payloads; with `batch_window_ms > 0`
concurrent single-image `extract()` requests are additionally co-batched
into one padded `extract_batch` dispatch (see the class docstring).
"""

from __future__ import annotations

import base64
import io as _io
import json
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from sift_tpu.config import MatchConfig, RansacConfig, SiftConfig


class FeatureService:
    """Compiled-once SIFT extraction + matching for serving.

    All programs are traced at construction against the configured
    (height, width, capacity) and reused for every request — a request
    with a different image size is resized-with-letterbox by default
    (`strict_shape=False`) or rejected (`strict_shape=True`), never
    recompiled.

    `batch_window_ms > 0` enables request co-batching: concurrent
    `extract()` calls within the window share ONE `extract_batch`
    dispatch of `max_batch` slots (what actually fills the MXU — eight
    VGA extractions cost barely more than one). Single callers pay at
    most the window in added latency.
    """

    def __init__(self, height: int, width: int,
                 sift: Optional[SiftConfig] = None,
                 match: Optional[MatchConfig] = None,
                 ransac: Optional[RansacConfig] = None,
                 strict_shape: bool = False,
                 batch_window_ms: float = 0.0, max_batch: int = 8,
                 desc_q8: bool = True):
        import jax
        import jax.numpy as jnp
        from sift_tpu.frontend.sift import extract
        from sift_tpu.matching.matcher import match_descriptors

        self.h, self.w = int(height), int(width)
        self.sift = sift or SiftConfig(mode="lowe")
        self.match_cfg = match or MatchConfig()
        self.ransac_cfg = ransac or RansacConfig(inlier_threshold=3.0)
        self.strict_shape = strict_shape
        self._jnp = jnp
        self._lock = threading.Lock()     # one dispatch stream per service

        cfg = self.sift

        self.desc_q8 = bool(desc_q8)

        def _pack_kp(kp):
            """Host-bound fields as ONE (7, N) buffer: every np.asarray of
            a device array costs a full round trip on tunneled backends —
            the r3 serve bench measured ~700 ms p50 for the field-by-field
            decode vs ~70 ms packed. Descriptors ride as a second output;
            with `desc_q8` they cross the link as uint8 (d * 255, 4x fewer
            bytes on a ~25-30 MB/s device->host tunnel; descriptors are
            unit-L2 with components <= 1, so quantization error is
            <= 1/510 per component — far below matching noise). The host
            dequantizes back to f32, keeping the client API unchanged."""
            xs, ys = kp.to_image_xy(cfg.subpixel)
            f32 = jnp.float32
            packed = jnp.stack([xs, ys, kp.scale,
                                kp.octave.astype(f32), kp.orientation,
                                kp.score, kp.valid.astype(f32)])
            desc = kp.desc
            if self.desc_q8:
                desc = jnp.clip(jnp.round(desc * 255.0), 0,
                                255).astype(jnp.uint8)
            return packed, desc

        @jax.jit
        def _extract1(img):
            return _pack_kp(extract(img.astype(jnp.float32), cfg,
                                    with_descriptors=True))

        @jax.jit
        def _extract_batch(imgs):
            return jax.vmap(lambda im: _pack_kp(extract(
                im.astype(jnp.float32), cfg, with_descriptors=True)))(imgs)

        @jax.jit
        def _match(da, va, db, vb):
            return match_descriptors(da, va, db, vb, self.match_cfg)

        @jax.jit
        def _match_packed(pa, da, pb, db):
            """Match two packed-keypoint results; returns ONE (6, M)
            buffer [xa, ya, xb, yb, distance, valid] in service-frame
            coordinates (match rows gathered on device). Dequantizes
            desc_q8 descriptors on device (matching math stays f32)."""
            if da.dtype == jnp.uint8:
                da = da.astype(jnp.float32) / 255.0
                db = db.astype(jnp.float32) / 255.0
            m = match_descriptors(da, pa[6] > 0.5, db, pb[6] > 0.5,
                                  self.match_cfg)
            return jnp.stack([
                pa[0][m.idx_a], pa[1][m.idx_a],
                pb[0][m.idx_b], pb[1][m.idx_b],
                m.distance, m.valid.astype(jnp.float32)])

        self._extract1 = _extract1
        self._extract_batch = _extract_batch
        self._match = _match
        self._match_packed = _match_packed
        self._batcher = (_RequestBatcher(self, batch_window_ms / 1e3,
                                         max_batch)
                         if batch_window_ms > 0 else None)
        self.dispatch_stats = {"extract_dispatches": 0,
                               "extract_requests": 0}
        # Per-dispatch phase decomposition (r5, VERDICT #8): upload is
        # measured by blocking on the device_put (forced anyway before
        # the program can run), read by blocking on the output fetch.
        # Bounded deques of seconds (a long-running service must not grow
        # them unboundedly); serve_bench aggregates percentiles.
        from collections import deque
        self.phase_stats: Dict[str, "deque"] = {
            k: deque(maxlen=4096) for k in
            ("decode_s", "upload_s", "dispatch_s", "read_s", "batch_size")}

    # ------------------------------------------------------------- helpers
    def _fit(self, img: np.ndarray) -> Tuple[np.ndarray, float, float]:
        """Letterbox `img` into the service shape; returns (canvas, sx, sy)
        where a service-frame coordinate maps back as (x/sx, y/sy)."""
        img = np.asarray(img)
        if img.ndim == 3:                       # RGB -> luma
            img = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114],
                                                    np.float32)
        h, w = img.shape
        if (h, w) == (self.h, self.w):
            return img.astype(np.float32), 1.0, 1.0
        if self.strict_shape:
            raise ValueError(f"image is {h}x{w}, service compiled for "
                             f"{self.h}x{self.w}")
        s = min(self.h / h, self.w / w)
        nh, nw = max(1, round(h * s)), max(1, round(w * s))
        # Bilinear resample (nearest-neighbour upscaling produces blocky
        # plateaus that suppress DoG extrema — measurably fewer keypoints).
        ys = ((np.arange(nh) + 0.5) / s - 0.5).clip(0, h - 1)
        xs = ((np.arange(nw) + 0.5) / s - 0.5).clip(0, w - 1)
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        fy = (ys - y0)[:, None].astype(np.float32)
        fx = (xs - x0)[None, :].astype(np.float32)
        img = img.astype(np.float32)
        top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
        bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
        canvas = np.zeros((self.h, self.w), np.float32)
        canvas[:nh, :nw] = top * (1 - fy) + bot * fy
        return canvas, nw / w, nh / h

    def _kp_to_host(self, packed: np.ndarray, desc: np.ndarray,
                    sx: float, sy: float) -> Dict[str, np.ndarray]:
        """Decode a host-side (7, N) packed buffer + (N, D) descriptors."""
        if desc.dtype == np.uint8:                 # desc_q8 dequantize
            desc = desc.astype(np.float32) / 255.0
        return dict(
            x=packed[0] / sx, y=packed[1] / sy,
            scale=packed[2], octave=packed[3].astype(np.int32),
            orientation=packed[4], score=packed[5],
            valid=packed[6] > 0.5, desc=desc,
        )

    # ----------------------------------------------------------------- api
    def warmup(self) -> None:
        """Compile + execute every program once (first request stays
        fast)."""
        blank = np.zeros((self.h, self.w), np.float32)
        kp = self.extract(blank)
        self.match_images(blank, blank)
        del kp

    def extract(self, img: np.ndarray) -> Dict[str, np.ndarray]:
        """SIFT keypoints + descriptors for one image (original-frame
        coordinates), as plain numpy."""
        canvas, sx, sy = self._fit(img)
        self.dispatch_stats["extract_requests"] += 1
        if self._batcher is not None:
            packed, desc = self._batcher.submit(canvas)
        else:
            with self._lock:
                self.dispatch_stats["extract_dispatches"] += 1
                packed_d, desc_d = self._extract1(self._jnp.asarray(canvas))
            packed, desc = np.asarray(packed_d), np.asarray(desc_d)
        return self._kp_to_host(packed, desc, sx, sy)

    def match_images(self, img_a: np.ndarray,
                     img_b: np.ndarray) -> Dict[str, np.ndarray]:
        """Extract both images and ratio/mutual-match the descriptors.

        Returns original-frame matched coordinates + distances."""
        ca, sxa, sya = self._fit(img_a)
        cb, sxb, syb = self._fit(img_b)
        with self._lock:
            pa, da = self._extract1(self._jnp.asarray(ca))
            pb, db = self._extract1(self._jnp.asarray(cb))
            mm = np.asarray(self._match_packed(pa, da, pb, db))  # ONE read
        return dict(
            xa=mm[0] / sxa, ya=mm[1] / sya,
            xb=mm[2] / sxb, yb=mm[3] / syb,
            distance=mm[4], valid=mm[5] > 0.5,
        )

    def two_view(self, img_a: np.ndarray, img_b: np.ndarray,
                 intrinsics: Optional[Tuple[float, float, float, float]]
                 = None) -> Dict:
        """Relative pose (R, t up to scale) between two views."""
        import jax
        from sift_tpu.geometry.epipolar import estimate_relative_pose

        mm = self.match_images(img_a, img_b)
        h, w = np.asarray(img_a).shape[:2]
        fx, fy, cx, cy = intrinsics if intrinsics is not None else \
            (float(max(h, w)), float(max(h, w)), w / 2.0, h / 2.0)
        na = np.stack([(mm["xa"] - cx) / fx, (mm["ya"] - cy) / fy], -1)
        nb = np.stack([(mm["xb"] - cx) / fx, (mm["yb"] - cy) / fy], -1)
        with self._lock:
            R, t, est = estimate_relative_pose(
                jax.random.PRNGKey(0), self._jnp.asarray(na),
                self._jnp.asarray(nb), self._jnp.asarray(mm["valid"]),
                self.ransac_cfg, focal=fx)
        return dict(R=np.asarray(R), t=np.asarray(t),
                    num_inliers=int(est.num_inliers),
                    success=bool(est.success),
                    n_matches=int(mm["valid"].sum()))


class _RequestBatcher:
    """Co-batches concurrent extract requests into one padded dispatch.

    A request parks its canvas in the pending list; whoever arrives first
    becomes the leader, waits `window` seconds for followers, then runs
    ONE `extract_batch` over up to `max_batch` canvases (padded with the
    first canvas; padding outputs are dropped) and hands each waiter its
    slot. Classic serve-side dynamic batching, sized to what fills the
    MXU.
    """

    def __init__(self, service: "FeatureService", window: float,
                 max_batch: int):
        import queue
        self.service = service
        self.window = window
        self.max_batch = max_batch
        self._q: "queue.Queue" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, canvas: np.ndarray):
        ev = threading.Event()
        box: Dict = {}
        self._q.put((canvas, ev, box))
        ev.wait()
        if "error" in box:
            raise box["error"]
        return box["kp"]

    def _run(self):
        import queue
        import time as _time
        while True:
            batch = [self._q.get()]          # block for the first request
            deadline = _time.monotonic() + self.window
            while len(batch) < self.max_batch:
                left = deadline - _time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            try:
                self._dispatch(batch)
            except Exception as e:  # noqa: BLE001 — fail the waiters, not us
                for _, ev, box in batch:
                    box["error"] = e
                    ev.set()

    def _dispatch(self, batch):
        import time as _time
        import jax as _jax
        svc = self.service
        canvases = [c for c, _, _ in batch]
        pad = self.max_batch - len(canvases)
        imgs = np.stack(canvases + [canvases[0]] * pad)
        ph = svc.phase_stats
        with svc._lock:
            svc.dispatch_stats["extract_dispatches"] += 1
            t0 = _time.perf_counter()
            imgs_d = svc._jnp.asarray(imgs)
            _jax.block_until_ready(imgs_d)      # upload phase, isolated
            t1 = _time.perf_counter()
            packed_d, desc_d = svc._extract_batch(imgs_d)
            t2 = _time.perf_counter()           # dispatch submission
        # TWO bulk reads for the whole batch, then numpy slices per
        # request (eager per-slot device slicing costs a round trip per
        # field per request on tunneled backends).
        packed = np.asarray(packed_d)
        desc = np.asarray(desc_d)
        t3 = _time.perf_counter()               # device exec + D2H read
        ph["upload_s"].append(t1 - t0)
        ph["dispatch_s"].append(t2 - t1)
        ph["read_s"].append(t3 - t2)
        ph["batch_size"].append(len(batch))
        for i, (_, ev, box) in enumerate(batch):
            box["kp"] = (packed[i], desc[i])
            ev.set()


# --------------------------------------------------------------- HTTP front
def _decode_image(b64: str) -> np.ndarray:
    from PIL import Image
    raw = base64.b64decode(b64)
    return np.asarray(Image.open(_io.BytesIO(raw)).convert("L"),
                      dtype=np.float32)


def _json_ready(obj):
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating, np.integer, np.bool_)):
        return obj.item()
    if isinstance(obj, dict):
        return {k: _json_ready(v) for k, v in obj.items()}
    return obj


def make_handler(service: FeatureService):
    """stdlib BaseHTTPRequestHandler bound to a FeatureService."""
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):            # quiet
            pass

        def _reply(self, code: int, payload: Dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "shape": [service.h, service.w]})
            elif self.path == "/stats":
                # Observability: request/dispatch counters + per-phase
                # latency percentiles (decode/upload/dispatch/read).
                def pct(xs):
                    if not xs:
                        return None
                    a = np.percentile(np.asarray(xs) * 1e3, [50, 99])
                    return {"p50_ms": round(float(a[0]), 2),
                            "p99_ms": round(float(a[1]), 2),
                            "n": len(xs)}
                phases = {k: pct(v) for k, v in
                          service.phase_stats.items() if k.endswith("_s")}
                bsz = service.phase_stats.get("batch_size", [])
                self._reply(200, {
                    "dispatch_stats": dict(service.dispatch_stats),
                    "phases": phases,
                    "mean_batch": (round(float(np.mean(bsz)), 2)
                                   if bsz else None)})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/extract":
                    import time as _time
                    td = _time.perf_counter()
                    img = _decode_image(req["image"])
                    # Decode runs in the HANDLER thread, before submit —
                    # with co-batching, follower decodes overlap the
                    # leader's batch window (decode is already hidden).
                    service.phase_stats["decode_s"].append(
                        _time.perf_counter() - td)
                    kp = service.extract(img)
                    valid = kp.pop("valid")
                    out = {k: v[valid] for k, v in kp.items()}
                    self._reply(200, {"n": int(valid.sum()),
                                      **_json_ready(out)})
                elif self.path == "/match":
                    mm = service.match_images(_decode_image(req["image_a"]),
                                              _decode_image(req["image_b"]))
                    v = mm.pop("valid")
                    out = {k: val[v] for k, val in mm.items()}
                    self._reply(200, {"n": int(v.sum()), **_json_ready(out)})
                elif self.path == "/twoview":
                    res = service.two_view(
                        _decode_image(req["image_a"]),
                        _decode_image(req["image_b"]),
                        tuple(req["intrinsics"])
                        if "intrinsics" in req else None)
                    self._reply(200, _json_ready(res))
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as e:  # noqa: BLE001 — serve errors as JSON
                self._reply(400, {"error": str(e)[:500]})

    return Handler


def main(argv=None) -> int:
    import argparse
    from http.server import ThreadingHTTPServer

    p = argparse.ArgumentParser(prog="sift_tpu.serve")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--mode", choices=("lowe", "parity"), default="lowe")
    p.add_argument("--max-keypoints", type=int, default=1024)
    p.add_argument("--batch-window-ms", type=float, default=2.0,
                   help="co-batch concurrent /extract requests arriving "
                        "within this window into one batched dispatch "
                        "(0 = per-request dispatches)")
    p.add_argument("--max-batch", type=int, default=8)
    args = p.parse_args(argv)

    service = FeatureService(
        args.height, args.width,
        sift=SiftConfig(mode=args.mode, max_keypoints=args.max_keypoints),
        batch_window_ms=args.batch_window_ms, max_batch=args.max_batch)
    print(f"warming up ({args.height}x{args.width}, {args.mode}) ...",
          flush=True)
    service.warmup()
    srv = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(f"serving on http://{args.host}:{args.port} "
          f"(/healthz /extract /match /twoview)", flush=True)
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
