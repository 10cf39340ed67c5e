"""Image-level end-to-end SfM: real SIFT extraction on rendered frames.

The scene is two textured fronto-parallel planes at different depths; a
camera translating in x shifts each plane's image region by fx*tx/z — an
exactly-renderable scene with non-degenerate two-view geometry (single
planes make the essential matrix ambiguous). The full pipeline runs from
pixels: extraction -> matching -> essential bootstrap -> triangulation ->
tracking -> window BA, with ground-truth positions for ATE and per-keypoint
ground-truth depth for the RGB-D path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sift_tpu.config import (PipelineConfig, SiftConfig, MatchConfig,
                             RansacConfig, BAConfig)
from sift_tpu.io.image import load_image_gray
from sift_tpu.slam.pipeline import SfmPipeline
from sift_tpu.eval.ate import ate_rmse

H, W = 180, 240
FX = 200.0
INTR = (FX, FX, W / 2.0, H / 2.0)
Z_TOP, Z_BOT = 6.0, 12.0
N_FRAMES = 8
STEP = 0.06     # meters per frame in x


def _textures():
    base = load_image_gray("/root/reference/example/parrot.jpg")
    t1 = base[100:100 + H // 2, 60:60 + W + 80]
    t2 = base[320:320 + H - H // 2, 20:20 + W + 80]
    return t1, t2


def _render(tx: float):
    """Camera at (tx, 0, 0): top rows show the z=Z_TOP plane, bottom rows
    the z=Z_BOT plane, each shifted by fx*tx/z (sampled with bilinear)."""
    t1, t2 = _textures()

    def sample(tex, shift):
        xs = np.arange(tex.shape[1] - 1)
        cols = np.clip(np.arange(W) + shift + 40.0, 0, tex.shape[1] - 2)
        c0 = np.floor(cols).astype(int)
        f = cols - c0
        return tex[:, c0] * (1 - f) + tex[:, c0 + 1] * f

    top = sample(t1, FX * tx / Z_TOP)
    bot = sample(t2, FX * tx / Z_BOT)
    return np.concatenate([top, bot], axis=0).astype(np.float32)


def _depth_map():
    d = np.empty((H, W), np.float32)
    d[:H // 2] = Z_TOP
    d[H // 2:] = Z_BOT
    return d


@pytest.fixture(scope="module")
def frames():
    return [_render(STEP * i) for i in range(N_FRAMES)]


def _cfg():
    return PipelineConfig(
        sift=SiftConfig(mode="lowe", octaves=3, max_keypoints=512,
                        max_keypoints_per_octave=256),
        match=MatchConfig(ratio=0.8, max_matches=512),
        ransac=RansacConfig(num_hypotheses=256, inlier_threshold=1.5,
                            min_inliers=15),
        ba=BAConfig(max_iterations=8, cg_iterations=30),
        window_size=8, ba_max_landmarks=1024, ba_max_observations=4096,
        min_bootstrap_parallax=2.0, min_bootstrap_matches=25,
        kf_min_tracked=60, kf_max_interval=3,
        min_triangulation_angle_deg=0.1,
    )


@pytest.mark.slow
def test_monocular_from_pixels(frames):
    pipe = SfmPipeline(INTR, _cfg())
    for f in frames:
        pipe.process_frame(f)
    assert pipe.state == "tracking", \
        [r["state"] for r in pipe.trajectory]
    tracked = [r["tracked"] for r in pipe.trajectory]
    assert np.mean(tracked) > 0.7, tracked

    gt = np.stack([[STEP * i, 0.0, 0.0] for i in range(N_FRAMES)])
    est = pipe.positions()
    # Monocular: similarity alignment; trajectory spans 0.42 m.
    ate = ate_rmse(est, gt, align=True, with_scale=True)
    assert ate < 0.05, ate


@pytest.mark.slow
def test_process_sequence_matches_per_frame(frames):
    """Batched-extraction sequence path tracks the same trajectory as the
    per-frame path. (Raw positions can differ: vmapped extraction has ~1e-5
    float noise, which can shift WHICH frame passes the bootstrap gate and
    therefore the monocular gauge — so compare via aligned ATE, the metric
    that is invariant to the gauge.)"""
    gt = np.stack([[STEP * i, 0.0, 0.0] for i in range(N_FRAMES)])

    a = SfmPipeline(INTR, _cfg())
    for f in frames:
        a.process_frame(f)
    b = SfmPipeline(INTR, _cfg())
    b.process_sequence(list(frames), batch=4)

    from sift_tpu.eval.ate import ate_rmse
    assert a.state == "tracking" and b.state == "tracking"
    assert ate_rmse(a.positions(), gt, align=True, with_scale=True) < 0.05
    assert ate_rmse(b.positions(), gt, align=True, with_scale=True) < 0.05


def _render_planar(tx: float):
    """Single plane at Z_TOP (distinct textures top/bottom, same depth) — a
    scene where the essential model is degenerate and bootstrap must go
    through the homography path."""
    t1, t2 = _textures()
    shift = FX * tx / Z_TOP

    def sample(tex):
        cols = np.clip(np.arange(W) + shift + 40.0, 0, tex.shape[1] - 2)
        c0 = np.floor(cols).astype(int)
        f = cols - c0
        return tex[:, c0] * (1 - f) + tex[:, c0 + 1] * f

    return np.concatenate([sample(t1), sample(t2)],
                          axis=0)[:H].astype(np.float32)


@pytest.mark.slow
def test_planar_scene_bootstraps_via_homography():
    frames = [_render_planar(STEP * i) for i in range(N_FRAMES)]
    pipe = SfmPipeline(INTR, _cfg())
    for f in frames:
        pipe.process_frame(f)
    assert pipe.state == "tracking", [r["state"] for r in pipe.trajectory]
    gt = np.stack([[STEP * i, 0.0, 0.0] for i in range(N_FRAMES)])
    from sift_tpu.eval.ate import ate_rmse
    ate = ate_rmse(pipe.positions(), gt, align=True, with_scale=True)
    assert ate < 0.08, ate


@pytest.mark.slow
def test_stereo_from_pixels_metric(frames):
    """Rectified stereo path: the right frame is the same scene rendered
    from x + baseline; per-keypoint stereo depths give metric scale through
    the RGB-D machinery (rigid-aligned ATE)."""
    # Disparity must dominate keypoint localization noise: with fx=200 and
    # planes at 6/12 m, baseline 0.8 m gives 13-27 px disparity (KITTI-like
    # ratios); tiny baselines make depth noise-dominated.
    baseline = 0.8
    pipe = SfmPipeline(INTR, _cfg(), stereo_baseline=baseline)
    for i in range(N_FRAMES):
        pipe.process_frame(frames[i], right=_render(STEP * i + baseline))
    assert pipe.state == "tracking"
    gt = np.stack([[STEP * i, 0.0, 0.0] for i in range(N_FRAMES)])
    ate = ate_rmse(pipe.positions(), gt, align=True, with_scale=False)
    assert ate < 0.03, ate


@pytest.mark.slow
def test_rgbd_from_pixels_metric(frames):
    depth = _depth_map()
    pipe = SfmPipeline(INTR, _cfg())
    for f in frames:
        pipe.process_frame(f, depth=depth)
    assert pipe.state == "tracking"
    gt = np.stack([[STEP * i, 0.0, 0.0] for i in range(N_FRAMES)])
    est = pipe.positions()
    # Depth fixes the scale: rigid alignment, metric tolerance.
    ate = ate_rmse(est, gt, align=True, with_scale=False)
    assert ate < 0.03, ate

@pytest.mark.slow
def test_async_deferred_ba_keeps_accuracy(frames):
    """ba_async=True defers window-BA application to the next promotion /
    finalize; with the reduced tracking budget the trajectory must stay
    within the same ATE bound as the synchronous path."""
    cfg = _cfg().replace(ba_async=True, ba_tracking_iterations=6,
                         ba_tracking_cg=15)
    pipe = SfmPipeline(INTR, cfg)
    for f in frames:
        pipe.process_frame(f)
    pipe.finalize()
    assert pipe.state == "tracking"
    assert not pipe._pending_ba
    gt = np.stack([[STEP * i, 0.0, 0.0] for i in range(N_FRAMES)])
    ate = ate_rmse(pipe.positions(), gt, align=True, with_scale=True)
    assert ate < 0.05, ate


@pytest.mark.slow
def test_chunked_tracking_matches_per_frame_ate():
    """Device-resident chunked tracking (one fused dispatch per extraction
    batch, keyframe promotion riding the same packed buffer) must hold the
    same ATE bound as the per-frame path — and must actually take the
    fused path (with 8 frames bootstrap eats the first chunk and the test
    would pass without ever exercising it, so this one runs 20)."""
    n = 20
    seq = [_render(STEP * i) for i in range(n)]
    cfg = _cfg().replace(chunked_tracking=True, ba_async=True)
    pipe = SfmPipeline(INTR, cfg)
    pipe.process_sequence(seq, batch=4)
    assert pipe.state == "tracking"
    assert pipe.chunk_stats["chunks"] >= 2, pipe.chunk_stats
    assert pipe.chunk_stats["fused_promotions"] >= 1, pipe.chunk_stats
    tracked = [r["tracked"] for r in pipe.trajectory]
    assert np.mean(tracked) > 0.7, tracked
    gt = np.stack([[STEP * i, 0.0, 0.0] for i in range(n)])
    ate = ate_rmse(pipe.positions(), gt, align=True, with_scale=True)
    assert ate < 0.05, ate


@pytest.mark.slow
def test_multi_promotion_chunk_matches_per_frame_ate():
    """Chunks larger than 8 frames fuse up to B//8 promotions into the
    single chunk dispatch, the second one guided-matched ON DEVICE against
    the first promoted frame (its landmark table is reconstructed from the
    first payload). The trajectory must hold the per-frame ATE bound, and
    at least one chunk must actually promote twice."""
    n = 40
    seq = [_render(STEP * i) for i in range(n)]
    cfg = _cfg().replace(chunked_tracking=True, ba_async=True,
                         kf_max_interval=6)
    pipe = SfmPipeline(INTR, cfg)
    pipe.process_sequence(seq, batch=16)
    assert pipe.state == "tracking"
    st = pipe.chunk_stats
    assert st["chunks"] >= 2, st
    # More fused promotions than chunks == some chunk promoted twice.
    assert st["fused_promotions"] > st["chunks"], st
    tracked = [r["tracked"] for r in pipe.trajectory]
    assert np.mean(tracked) > 0.7, tracked
    gt = np.stack([[STEP * i, 0.0, 0.0] for i in range(n)])
    ate = ate_rmse(pipe.positions(), gt, align=True, with_scale=True)
    assert ate < 0.05, ate


@pytest.mark.slow
def test_relocalization_from_pixels():
    """Blackout frames (constant gray -> zero SIFT keypoints) kill
    tracking; the pipeline must relocalize from REAL pixels against the
    keyframe history (vote-ranked global descriptor index) and track the
    revisited region. The synthetic-frontend variant lives in
    test_sfm_pipeline.py; this proves the whole chain from images."""
    n_out = 12
    revisit = list(range(5, 11))
    seq = ([_render(STEP * i) for i in range(n_out)]
           + [np.full((H, W), 120.0, np.float32)] * 4
           + [_render(STEP * i) for i in revisit])
    pipe = SfmPipeline(INTR, _cfg())
    results = [pipe.process_frame(f) for f in seq]

    black = range(n_out, n_out + 4)
    assert not any(results[i]["tracked"] for i in black)
    post = [r["tracked"] for r in results[n_out + 4:]]
    assert np.mean(post) > 0.6, post

    # Tracked frames (incl. the revisit) must sit on the ground truth.
    gt = np.array([[STEP * i, 0.0, 0.0] for i in range(n_out)]
                  + [[np.nan] * 3] * 4
                  + [[STEP * i, 0.0, 0.0] for i in revisit])
    mask = np.array([r["tracked"] for r in results])
    est = pipe.positions()
    ate = ate_rmse(est[mask], gt[mask], align=True, with_scale=True)
    assert ate < 0.06, ate


@pytest.mark.slow
def test_loop_closure_from_pixels():
    """Out-and-back from pixels with loop closure enabled: place
    recognition and the closure machinery run on real descriptors,
    tracking never drops, and the return leg lands back on the outbound
    trajectory (the covisibility gate may rightly suppress explicit loop
    edges when tracking alone keeps the map consistent)."""
    n_out = 12
    txs = ([STEP * i for i in range(n_out)]
           + [STEP * (n_out - 2 - i) for i in range(n_out - 1)])
    seq = [_render(t) for t in txs]
    cfg = _cfg().replace(enable_loop_closure=True, loop_min_inliers=25,
                         loop_max_rmse=2.0)
    pipe = SfmPipeline(INTR, cfg)
    for f in seq:
        pipe.process_frame(f)
    assert pipe.state == "tracking"
    tracked = [r["tracked"] for r in pipe.trajectory]
    assert np.mean(tracked) > 0.8, tracked
    gt = np.stack([[t, 0.0, 0.0] for t in txs])
    ate = ate_rmse(pipe.positions(), gt, align=True, with_scale=True)
    assert ate < 0.06, ate


@pytest.mark.slow
def test_extract_ahead_identical_trajectory():
    """extract_ahead dispatches chunk N+1's extraction before chunk N's
    blocking read — pure reordering of independent dispatches, so the
    trajectory must be bit-identical to the non-pipelined chunked path."""
    n = 20
    seq = [_render(STEP * i) for i in range(n)]
    poses = []
    for ahead in (False, True):
        cfg = _cfg().replace(chunked_tracking=True, ba_async=True,
                             extract_ahead=ahead)
        pipe = SfmPipeline(INTR, cfg)
        pipe.process_sequence(seq, batch=4)
        assert pipe.chunk_stats["chunks"] >= 2, pipe.chunk_stats
        poses.append(pipe.positions())
    np.testing.assert_array_equal(poses[0], poses[1])


@pytest.mark.slow
def test_stereo_batched_sequence_matches_per_frame(frames):
    """process_sequence(rights=...) batches both extractions and the
    per-keypoint stereo depth (one dispatch + one read per chunk); the
    trajectory must be identical to the per-frame stereo path."""
    baseline = 0.8
    rights = [_render(STEP * i + baseline) for i in range(N_FRAMES)]

    pipe_a = SfmPipeline(INTR, _cfg(), stereo_baseline=baseline)
    for i in range(N_FRAMES):
        pipe_a.process_frame(frames[i], right=rights[i])
    pipe_a.finalize()

    pipe_b = SfmPipeline(INTR, _cfg(), stereo_baseline=baseline)
    pipe_b.process_sequence(list(frames), rights=rights, batch=4)

    assert pipe_b.state == "tracking"
    # Same logic, same PRNG stream; the residual is vmapped-vs-single
    # XLA numerics (the batched extractor/stereo programs fuse reductions
    # differently), so the bound is sub-millimeter, not bitwise.
    np.testing.assert_allclose(pipe_a.positions(), pipe_b.positions(),
                               rtol=0, atol=1e-3)
    gt = np.stack([[STEP * i, 0.0, 0.0] for i in range(N_FRAMES)])
    ate = ate_rmse(pipe_b.positions(), gt, align=True, with_scale=False)
    assert ate < 0.03, ate


@pytest.mark.slow
def test_mesh_sharded_extraction_identical_trajectory(frames):
    """SfmPipeline(mesh=...): chunk extraction data-parallel across an
    8-virtual-device mesh; same ATE bound as the single-device run.
    (Raw positions can differ: sharded extraction has ~1e-5 float noise,
    which can shift WHICH frame passes the bootstrap gate and therefore
    the monocular gauge — the same caveat as
    test_process_sequence_matches_per_frame.)"""
    from sift_tpu.config import MeshConfig
    from sift_tpu.dist.mesh import make_mesh

    seq = list(frames)
    gt = np.stack([[STEP * i, 0.0, 0.0] for i in range(N_FRAMES)])
    for mesh in (None, make_mesh(MeshConfig(data=4, model=2))):
        cfg = _cfg().replace(chunked_tracking=True, ba_async=True)
        pipe = SfmPipeline(INTR, cfg, mesh=mesh)
        pipe.process_sequence(seq, batch=8)
        assert pipe.state == "tracking"
        ate = ate_rmse(pipe.positions(), gt, align=True, with_scale=True)
        assert ate < 0.05, (mesh, ate)


def test_capture_hook_stashes_steady_state_dispatches():
    """`pipe._capture = {}` must stash the (jit_fn, args) of the fused
    chunk tracker and the window BA after a chunked run — the device-floor
    benchmark (benchmarks/slam_bench.py::bench_device_floor) re-times
    exactly these; a silently missing stash would skip the floor metric."""
    n = 20
    seq = [_render(STEP * i) for i in range(n)]
    cfg = _cfg().replace(chunked_tracking=True, ba_async=True)
    pipe = SfmPipeline(INTR, cfg)
    pipe._capture = {}
    pipe.process_sequence(seq, batch=4)
    assert "chunk" in pipe._capture, list(pipe._capture)
    assert "ba" in pipe._capture, list(pipe._capture)
    fn, args = pipe._capture["chunk"]
    res = fn(*args)                      # replayable at the real shapes
    assert np.all(np.isfinite(np.asarray(res[0])[:: max(1, len(res[0]) // 7)][:4]))
    fn_ba, ba_args = pipe._capture["ba"]
    packed = np.asarray(fn_ba(*ba_args))       # packed result buffer
    assert np.isfinite(float(packed.reshape(-1)[-2]))  # rmse slot
