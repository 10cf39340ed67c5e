"""Serving layer: warm FeatureService + the stdlib HTTP front."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from sift_tpu.config import MatchConfig, SiftConfig
from sift_tpu.io.image import load_image_gray
from sift_tpu.serve import FeatureService, make_handler

H, W = 180, 240


@pytest.fixture(scope="module")
def service():
    svc = FeatureService(
        H, W, sift=SiftConfig(mode="lowe", octaves=3, max_keypoints=256,
                              max_keypoints_per_octave=256),
        match=MatchConfig(max_matches=256))
    svc.warmup()
    return svc


@pytest.fixture(scope="module")
def img():
    full = load_image_gray("/root/reference/example/parrot.jpg")
    return full[100:100 + H, 60:60 + W]


def test_extract_and_match(service, img):
    kp = service.extract(img)
    n = int(kp["valid"].sum())
    assert n > 20
    assert np.isfinite(kp["x"][kp["valid"]]).all()

    shifted = np.roll(img, 5, axis=1)
    mm = service.match_images(img, shifted)
    v = mm["valid"]
    assert v.sum() > 15
    dx = mm["xb"][v] - mm["xa"][v]
    assert abs(np.median(dx) - 5.0) < 1.0      # recovered the shift


def test_letterbox_other_shapes(service, img):
    """A differently-sized image is letterboxed, NOT recompiled, and the
    returned coordinates live in the original frame."""
    small = img[: H // 2, : W // 2]
    kp = service.extract(small)
    v = kp["valid"]
    # Yield drops on a 2x upscale (half the high-frequency content); the
    # contract under test is the coordinate mapping, not detector yield.
    assert v.sum() >= 3
    assert (kp["x"][v] <= small.shape[1] + 1).all()
    assert (kp["y"][v] <= small.shape[0] + 1).all()


def test_strict_shape_rejects(img):
    svc = FeatureService(H, W, sift=SiftConfig(mode="lowe", octaves=2,
                                               max_keypoints=64,
                                               max_keypoints_per_octave=64),
                         strict_shape=True)
    with pytest.raises(ValueError):
        svc.extract(img[:50, :50])


def test_http_front(service, img):
    """End-to-end over a real localhost HTTP server."""
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    port = srv.server_address[1]
    try:
        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"

        def b64(arr):
            buf = io.BytesIO()
            Image.fromarray(arr.astype(np.uint8)).save(buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()

        out = post("/extract", {"image": b64(img)})
        assert out["n"] > 20
        out = post("/match", {"image_a": b64(img),
                              "image_b": b64(np.roll(img, 5, axis=1))})
        assert out["n"] > 15
        out = post("/twoview", {"image_a": b64(img),
                                "image_b": b64(np.roll(img, 5, axis=1))})
        assert "R" in out and out["n_matches"] > 15
        # Errors come back as JSON 400s, not connection resets.
        try:
            post("/extract", {"image": "not-base64!!"})
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # Observability endpoint: counters + per-phase percentiles.
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            st = json.loads(r.read())
        assert st["dispatch_stats"]["extract_requests"] >= 1
        assert st["phases"]["decode_s"]["n"] >= 1
    finally:
        srv.shutdown()


def test_request_cobatching(img):
    """Concurrent extract() calls within the batch window share one
    batched dispatch; results equal the unbatched service's."""
    sift = SiftConfig(mode="lowe", octaves=3, max_keypoints=256,
                      max_keypoints_per_octave=256)
    plain = FeatureService(H, W, sift=sift)
    batched = FeatureService(H, W, sift=sift, batch_window_ms=150,
                             max_batch=8)
    imgs = [np.roll(img, i, axis=1) for i in range(6)]
    ref = [plain.extract(im) for im in imgs]

    out = [None] * len(imgs)

    def worker(i):
        out[i] = batched.extract(imgs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    st = batched.dispatch_stats
    assert st["extract_requests"] == 6
    assert st["extract_dispatches"] < 6, st   # co-batching happened
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(r["valid"], o["valid"])
        v = r["valid"]
        np.testing.assert_allclose(r["x"][v], o["x"][v], atol=1e-4)
        # One uint8 quantization step (desc_q8 transfer): ~1e-5 numeric
        # noise between the single and vmapped extractors can flip a
        # round() at a bin boundary.
        np.testing.assert_allclose(r["desc"][v], o["desc"][v],
                                   atol=1.01 / 255)


def test_sustained_concurrent_load_coalesces():
    """Sustained load (32 requests, 8 concurrent workers): the co-batcher
    must keep dispatches well under one per request, every request must
    complete, and results must stay internally consistent (same image ->
    same keypoints regardless of which batch slot served it)."""
    from concurrent.futures import ThreadPoolExecutor

    sift = SiftConfig(mode="lowe", octaves=3, max_keypoints=256,
                      max_keypoints_per_octave=256)
    svc = FeatureService(H, W, sift=sift, batch_window_ms=50, max_batch=8)
    svc.warmup()
    full = load_image_gray("/root/reference/example/parrot.jpg")
    base = full[100:100 + H, 60:60 + W]
    imgs = [np.roll(base, i % 4, axis=1) for i in range(32)]

    # Warm the batched program once so the timed phase measures steady
    # state, then reset the counters.
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(svc.extract, imgs[:8]))
    svc.dispatch_stats.update(extract_requests=0, extract_dispatches=0)

    with ThreadPoolExecutor(max_workers=8) as ex:
        outs = list(ex.map(svc.extract, imgs))

    st = svc.dispatch_stats
    assert st["extract_requests"] == 32
    # 8-way concurrency with an 8-slot batcher: >= 2x coalescing.
    assert st["extract_dispatches"] <= 16, st
    # Identical inputs (i % 4) must produce identical outputs.
    for i in range(4, 32):
        np.testing.assert_array_equal(outs[i]["valid"],
                                      outs[i % 4]["valid"])
        v = outs[i]["valid"]
        np.testing.assert_allclose(outs[i]["x"][v], outs[i % 4]["x"][v],
                                   atol=1e-4)
