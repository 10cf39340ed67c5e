"""End-to-end incremental SfM on a synthetic world with an injected frontend.

A camera translates through a 3D landmark field; each frame's "detected
keypoints" are the true projections (plus noise) with descriptors that are
fixed random codes per landmark (plus noise) — so matching, RANSAC
bootstrap, triangulation, tracking, and window BA are all exercised end to
end with ground truth available for ATE assertions (SURVEY.md §4 E2E tier,
minus the pixel-rendering step that real sequences provide).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sift_tpu.config import PipelineConfig, SiftConfig, MatchConfig, RansacConfig, BAConfig
from sift_tpu.slam.pipeline import SfmPipeline
from sift_tpu.types import Keypoints
from sift_tpu.eval.ate import ate_rmse
from sift_tpu.geometry import lie


W, H = 640, 480
INTR = (500.0, 500.0, 320.0, 240.0)
KP_CAP = 256


class SyntheticWorld:
    """Landmark cloud + camera trajectory + per-landmark descriptor codes."""

    def __init__(self, seed=0, n_landmarks=600, n_frames=40,
                 pixel_noise=0.3, desc_noise=0.05):
        rng = np.random.default_rng(seed)
        self.rng = rng
        self.X = np.stack([
            rng.uniform(-8, 8, n_landmarks),
            rng.uniform(-5, 5, n_landmarks),
            rng.uniform(8, 20, n_landmarks),
        ], -1)
        d = rng.standard_normal((n_landmarks, 128)).astype(np.float32)
        self.codes = d / np.linalg.norm(d, axis=-1, keepdims=True)
        self.pixel_noise = pixel_noise
        self.desc_noise = desc_noise
        # Smooth forward+sideways trajectory with slight yaw.
        self.poses = []
        for i in range(n_frames):
            t = np.array([0.12 * i, 0.02 * np.sin(0.3 * i), 0.05 * i])
            yaw = 0.004 * i
            xi = np.array([0.0, yaw, 0.0, *t], np.float32)
            # convert (w, t) intent: translation must go through V(w); build
            # pose from (R, t) directly instead.
            R, _ = lie.se3_exp(jnp.asarray(np.array([0.0, yaw, 0.0, 0, 0, 0],
                                                    np.float32)))
            self.poses.append(np.asarray(
                lie.se3_log(R, jnp.asarray(t, jnp.float32))))
        self.positions = np.stack([t for t in
                                   [np.array([0.12 * i, 0.02 * np.sin(0.3 * i),
                                              0.05 * i]) for i in range(n_frames)]])

    def frame_keypoints(self, i) -> Keypoints:
        """Project landmarks into frame i (cached: noise drawn once)."""
        if not hasattr(self, "_cache"):
            self._cache = {}
        if i in self._cache:
            return self._cache[i]
        kp = self._frame_keypoints_uncached(i)
        self._cache[i] = kp
        return kp

    def _frame_keypoints_uncached(self, i) -> Keypoints:
        fx, fy, cx, cy = INTR
        R, t = lie.se3_exp(jnp.asarray(self.poses[i]))
        R, t = np.asarray(R), np.asarray(t)
        Xc = (self.X - t) @ R           # R^T (X - t)
        z = Xc[:, 2]
        u = fx * Xc[:, 0] / z + cx
        v = fy * Xc[:, 1] / z + cy
        vis = (z > 0.5) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        idx = np.nonzero(vis)[0]
        # Persistent per-landmark saliency: consecutive frames detect (mostly)
        # the same subset under the cap, like a real detector would.
        if not hasattr(self, "saliency"):
            self.saliency = np.random.default_rng(99).uniform(
                size=self.X.shape[0])
        idx = idx[np.argsort(-self.saliency[idx])][:KP_CAP]
        n = idx.shape[0]

        u_n = u[idx] + self.rng.normal(0, self.pixel_noise, n)
        v_n = v[idx] + self.rng.normal(0, self.pixel_noise, n)
        desc = self.codes[idx] + self.desc_noise * \
            self.rng.standard_normal((n, 128)).astype(np.float32)

        pad = KP_CAP - n
        zf = np.zeros(pad, np.float32)
        kp = Keypoints(
            x=jnp.asarray(np.concatenate([u_n.astype(np.float32), zf])),
            y=jnp.asarray(np.concatenate([v_n.astype(np.float32), zf])),
            octave=jnp.zeros(KP_CAP, jnp.int32),
            level=jnp.zeros(KP_CAP, jnp.int32),
            scale=jnp.ones(KP_CAP, jnp.float32),
            score=jnp.ones(KP_CAP, jnp.float32),
            orientation=jnp.zeros(KP_CAP, jnp.float32),
            valid=jnp.asarray(np.concatenate([np.ones(n, bool),
                                              np.zeros(pad, bool)])),
            desc=jnp.asarray(np.concatenate(
                [desc, np.zeros((pad, 128), np.float32)])),
        )
        return kp


@pytest.fixture(scope="module")
def world():
    return SyntheticWorld()


def _pipeline(world):
    cfg = PipelineConfig(
        sift=SiftConfig(mode="lowe", max_keypoints=KP_CAP),
        match=MatchConfig(ratio=0.85, max_matches=KP_CAP),
        ransac=RansacConfig(num_hypotheses=256, inlier_threshold=2.0,
                            min_inliers=15),
        ba=BAConfig(max_iterations=8, cg_iterations=30),
        window_size=6, ba_max_landmarks=1024, ba_max_observations=4096,
        min_bootstrap_parallax=6.0, kf_min_tracked=80, kf_max_interval=6,
        min_triangulation_angle_deg=0.25,
    )
    frames = {i: world.frame_keypoints(i) for i in range(len(world.poses))}
    return SfmPipeline(INTR, cfg, frontend=lambda g: frames[int(g[0, 0])])


def test_incremental_sfm_tracks_trajectory(world):
    pipe = _pipeline(world)
    n_frames = len(world.poses)
    for i in range(n_frames):
        marker = np.full((2, 2), i, np.float32)   # frame index smuggled in
        pipe.process_frame(marker)

    # Pipeline bootstrapped and tracked to the end.
    assert pipe.state == "tracking"
    tracked = [r["tracked"] for r in pipe.trajectory]
    assert np.mean(tracked[2:]) > 0.95
    assert len(pipe.keyframes) >= 4
    assert pipe.landmarks.shape[0] > 100

    # Monocular ATE after similarity alignment (scale is a free gauge).
    est = pipe.positions()
    gt = world.positions
    ate = ate_rmse(est, gt, align=True, with_scale=True)
    # Trajectory spans ~5 m; sub-2% ATE.
    assert ate < 0.1, ate


def test_rgbd_pipeline_metric_scale(world):
    """RGB-D mode: depth resolves scale, so the ATE holds under *rigid*
    (scale-free similarity not needed) alignment."""
    cfg = PipelineConfig(
        sift=SiftConfig(mode="lowe", max_keypoints=KP_CAP),
        match=MatchConfig(ratio=0.85, max_matches=KP_CAP),
        ransac=RansacConfig(num_hypotheses=256, inlier_threshold=2.0,
                            min_inliers=15),
        ba=BAConfig(max_iterations=8, cg_iterations=30),
        window_size=6, ba_max_landmarks=1024, ba_max_observations=4096,
        kf_min_tracked=80, kf_max_interval=6,
        min_triangulation_angle_deg=0.25,
    )
    frames = {i: world.frame_keypoints(i) for i in range(len(world.poses))}
    pipe = SfmPipeline(INTR, cfg, frontend=lambda g: frames[int(g[0, 0])])

    fx, fy, cx, cy = INTR
    n_frames = len(world.poses)
    for i in range(n_frames):
        # Synthetic dense depth: project the landmark cloud's median depth
        # is not enough — render a depth map by splatting keypoint depths.
        kp = frames[i]
        valid = np.asarray(kp.valid)
        u = np.asarray(kp.x)[valid].astype(int)
        v = np.asarray(kp.y)[valid].astype(int)
        # recover true depths for this frame's keypoints
        R, t = lie.se3_exp(jnp.asarray(world.poses[i]))
        R, t = np.asarray(R), np.asarray(t)
        depth = np.zeros((H, W), np.float32)
        # nearest-landmark depth at each keypoint pixel (exact by construction)
        Xc = (world.X - t) @ R
        uu = fx * Xc[:, 0] / Xc[:, 2] + cx
        vv = fy * Xc[:, 1] / Xc[:, 2] + cy
        ok = (Xc[:, 2] > 0.5) & (uu >= 1) & (uu < W - 1) & (vv >= 1) & (vv < H - 1)
        # splat a 3x3 patch so noisy keypoint pixels still read valid depth
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                depth[vv[ok].astype(int) + dy,
                      uu[ok].astype(int) + dx] = Xc[ok, 2]
        pipe.process_frame(np.full((2, 2), i, np.float32), depth=depth)

    assert pipe.state == "tracking"
    est = pipe.positions()
    gt = world.positions
    ate = ate_rmse(est, gt, align=True, with_scale=False)   # rigid!
    assert ate < 0.1, ate


class LoopWorld(SyntheticWorld):
    """Long out-and-back corridor: landmarks spread along the travel
    direction so early and late keyframes see DISJOINT subsets — the
    covisibility gate keeps closures suppressed until the camera actually
    returns to the start."""

    def __init__(self, seed=7, n_half=20, step=0.55):
        rng = np.random.default_rng(seed)
        self.rng = rng
        n_landmarks = 1200
        travel = step * n_half
        self.X = np.stack([
            rng.uniform(-5, 5 + travel, n_landmarks),
            rng.uniform(-5, 5, n_landmarks),
            rng.uniform(8, 16, n_landmarks),
        ], -1)
        d = rng.standard_normal((n_landmarks, 128)).astype(np.float32)
        self.codes = d / np.linalg.norm(d, axis=-1, keepdims=True)
        self.pixel_noise = 0.3
        self.desc_noise = 0.05

        fwd = [np.array([step * i, 0.02 * np.sin(0.3 * i), 0.0])
               for i in range(n_half)]
        path = fwd + fwd[::-1]
        self.poses = []
        for t in path:
            self.poses.append(np.asarray(lie.se3_log(
                jnp.eye(3), jnp.asarray(t.astype(np.float32)))))
        self.positions = np.stack(path)


def _loop_cfg():
    return PipelineConfig(
        sift=SiftConfig(mode="lowe", max_keypoints=KP_CAP),
        match=MatchConfig(ratio=0.85, max_matches=KP_CAP),
        ransac=RansacConfig(num_hypotheses=256, inlier_threshold=2.0,
                            min_inliers=15),
        ba=BAConfig(max_iterations=8, cg_iterations=30),
        window_size=4, ba_max_landmarks=2048, ba_max_observations=8192,
        min_bootstrap_parallax=6.0, kf_min_tracked=80, kf_max_interval=4,
        min_triangulation_angle_deg=0.5,
        enable_loop_closure=True, loop_min_inliers=40,
        max_pose_graph_nodes=64, max_pose_graph_edges=256,
    )


def test_out_and_back_stays_consistent():
    """Corridor out-and-back: with persistent landmark associations the map
    itself keeps the loop closed (the covisibility gate correctly suppresses
    redundant pose-graph churn), and the trajectory returns to the start
    with tiny ATE and no tracking loss."""
    world = LoopWorld()
    frames = {i: world.frame_keypoints(i) for i in range(len(world.poses))}
    pipe = SfmPipeline(INTR, _loop_cfg(),
                       frontend=lambda g: frames[int(g[0, 0])])
    lost = 0
    for i in range(len(world.poses)):
        r = pipe.process_frame(np.full((2, 2), i, np.float32))
        lost += 0 if r["tracked"] else 1
    assert pipe.state == "tracking"
    assert lost == 0
    ate = ate_rmse(pipe.positions(), world.positions, align=True,
                   with_scale=True)
    assert ate < 0.05, ate


def test_loop_probe_accepts_revisit(world):
    """The fused loop-closure probe (every candidate matched + localized in
    ONE dispatch, decoded best-candidate-first) must accept a genuine
    revisit: a keyframe that sees keyframe 0's features but shares none of
    its landmark ids (so the covisibility gate passes) re-localizes against
    the old map, adds a loop edge, and fuses the old landmarks."""
    from sift_tpu.slam.pipeline import Keyframe

    frames = {i: world.frame_keypoints(i) for i in range(len(world.poses))}
    pipe = SfmPipeline(INTR, _loop_cfg(),
                       frontend=lambda g: frames[int(g[0, 0])])
    for i in range(24):
        pipe.process_frame(np.full((2, 2), i, np.float32))
    assert len(pipe.keyframes) >= pipe.cfg.window_size + 2

    # Synthetic revisit: keyframe 0's keypoints with fresh (unassociated)
    # landmark slots. No shared ids -> the gate cannot suppress it; the
    # probe's 2D-3D matches come entirely from keyframe 0's map points.
    kf0 = pipe.keyframes[0]
    revisit = Keyframe(pipe._frame_idx + 1, kf0.pose.copy(), kf0.kp)
    pipe.keyframes.append(revisit)
    new_idx = len(pipe.keyframes) - 1
    before = pipe.num_loop_closures
    pipe._try_loop_closure(new_idx)

    assert pipe.num_loop_closures == before + 1
    edge = pipe.pose_edges[-1]
    assert edge["kind"] == "loop" and edge["j"] == new_idx
    # Fusion adopted old map points for the accepted inliers.
    assert (revisit.kp_lm >= 0).sum() >= pipe.cfg.loop_min_inliers


def test_pose_graph_correction_reanchors_map():
    """Drive the PGO machinery directly: inject rigid drift into the later
    keyframes (poses + their landmarks), add a ground-truth loop edge, and
    check the optimizer pulls the trajectory back and re-anchors landmarks
    consistently (keyframe self-reprojection stays tight)."""
    world = SyntheticWorld()
    frames = {i: world.frame_keypoints(i) for i in range(len(world.poses))}
    pipe = SfmPipeline(INTR, _loop_cfg(),
                       frontend=lambda g: frames[int(g[0, 0])])
    for i in range(16):
        pipe.process_frame(np.full((2, 2), i, np.float32))
    n = len(pipe.keyframes)
    assert n >= 4

    true_last = pipe.keyframes[-1].pose.copy()

    # Rigid drift on keyframes >= 2 and the landmarks they created.
    drift = np.array([0.0, 0.03, 0.0, 0.4, -0.2, 0.1], np.float32)
    Rd, td = lie.se3_exp(jnp.asarray(drift))
    Rd, td = np.asarray(Rd), np.asarray(td)
    for k in range(2, n):
        R, t = lie.se3_exp(jnp.asarray(pipe.keyframes[k].pose))
        Rn = Rd @ np.asarray(R)
        tn = Rd @ np.asarray(t) + td
        pipe.keyframes[k].pose = np.asarray(
            lie.se3_log(jnp.asarray(Rn), jnp.asarray(tn)))
    mask = pipe.lm_ref_kf >= 2
    pipe.landmarks[mask] = pipe.landmarks[mask] @ Rd.T + td

    # Loop edge carrying the true relative pose kf0 -> last kf.
    pipe.pose_edges.append(dict(
        i=0, j=n - 1, kind="loop",
        z=pipe._rel_pose(pipe.keyframes[0].pose, true_last),
        w=100.0))
    pipe._run_pose_graph()

    # Last keyframe pulled back toward its true pose.
    _, t_fixed = lie.se3_exp(jnp.asarray(pipe.keyframes[-1].pose))
    _, t_true = lie.se3_exp(jnp.asarray(true_last))
    assert np.linalg.norm(np.asarray(t_fixed) - np.asarray(t_true)) < 0.15

    # Landmarks moved with their keyframes: self-reprojection stays tight.
    fx, fy, cx, cy = INTR
    kf = pipe.keyframes[-1]
    slots = np.nonzero(kf.kp_lm >= 0)[0]
    lms = pipe.landmarks[kf.kp_lm[slots]]
    R, t = lie.se3_exp(jnp.asarray(kf.pose))
    Xc = (lms - np.asarray(t)) @ np.asarray(R)
    pred = np.stack([fx * Xc[:, 0] / Xc[:, 2] + cx,
                     fy * Xc[:, 1] / Xc[:, 2] + cy], -1)
    uv = np.stack([kf.kp["u"][slots], kf.kp["v"][slots]], -1)
    err = np.linalg.norm(pred - uv, axis=-1)
    assert np.median(err[np.isfinite(err)]) < 2.0


def test_relocalization_after_blackout(world):
    """Blank frames (occlusion/motion-blur analog) kill tracking; the
    pipeline must re-fix against the keyframe history and keep a sane
    trajectory afterward."""
    from sift_tpu.types import Keypoints
    from sift_tpu.slam.pipeline import SfmPipeline

    cfg = _loop_cfg().replace(enable_loop_closure=False)
    n_frames = len(world.poses)
    blank = Keypoints(
        x=jnp.zeros(KP_CAP), y=jnp.zeros(KP_CAP),
        octave=jnp.zeros(KP_CAP, jnp.int32),
        level=jnp.zeros(KP_CAP, jnp.int32),
        scale=jnp.ones(KP_CAP), score=jnp.zeros(KP_CAP),
        orientation=jnp.zeros(KP_CAP),
        valid=jnp.zeros(KP_CAP, bool),
        desc=jnp.zeros((KP_CAP, 128)),
    )
    blackout = set(range(14, 18))
    frames = {i: (blank if i in blackout else world.frame_keypoints(i))
              for i in range(n_frames)}
    pipe = SfmPipeline(INTR, cfg, frontend=lambda g: frames[int(g[0, 0])])
    results = [pipe.process_frame(np.full((2, 2), i, np.float32))
               for i in range(n_frames)]

    # Lost during the blackout...
    assert not any(r["tracked"] for i, r in enumerate(results)
                   if i in blackout)
    # ...but recovered within the reloc budget afterwards.
    post = [r["tracked"] for i, r in enumerate(results) if i >= 21]
    assert np.mean(post) > 0.9, post
    # Post-recovery trajectory is consistent with ground truth.
    est = pipe.positions()[21:]
    gt = world.positions[21:]
    assert ate_rmse(est, gt, align=True, with_scale=True) < 0.1


def test_pipeline_deterministic(world):
    traj = []
    for _ in range(2):
        pipe = _pipeline(world)
        for i in range(12):
            pipe.process_frame(np.full((2, 2), i, np.float32))
        traj.append(pipe.positions())
    np.testing.assert_allclose(traj[0], traj[1], atol=1e-6)


def test_sim3_pose_graph_corrects_scale_drift():
    """Inject SIMILARITY drift (scale 1.25 + rigid offset) into the later
    keyframes and their landmarks — the monocular failure mode. With
    pose_graph_sim3=True and a loop edge carrying the relative scale, the
    optimizer must restore both position and SCALE (inter-landmark
    distances), which the SE(3) graph structurally cannot."""
    from sift_tpu.geometry import sim3 as sim3m

    world = SyntheticWorld()
    frames = {i: world.frame_keypoints(i) for i in range(len(world.poses))}
    cfg = _loop_cfg().replace(pose_graph_sim3=True)
    pipe = SfmPipeline(INTR, cfg,
                       frontend=lambda g: frames[int(g[0, 0])])
    for i in range(16):
        pipe.process_frame(np.full((2, 2), i, np.float32))
    n = len(pipe.keyframes)
    assert n >= 4

    true_last = pipe.keyframes[-1].pose.copy()
    mask = pipe.lm_ref_kf >= 2
    d_true = np.linalg.norm(
        pipe.landmarks[mask][:40, None] - pipe.landmarks[mask][None, :40],
        axis=-1)

    # Similarity drift on keyframes >= 2: scale s about the origin plus a
    # rigid offset, applied consistently to poses and their landmarks.
    s_d = 1.25
    drift = np.array([0.0, 0.02, 0.0, 0.3, -0.1, 0.05], np.float32)
    Rd, td = lie.se3_exp(jnp.asarray(drift))
    Rd, td = np.asarray(Rd), np.asarray(td)
    for k in range(2, n):
        R, t = lie.se3_exp(jnp.asarray(pipe.keyframes[k].pose))
        Rn = Rd @ np.asarray(R)
        tn = s_d * (Rd @ np.asarray(t)) + td
        pipe.keyframes[k].pose = np.asarray(
            lie.se3_log(jnp.asarray(Rn), jnp.asarray(tn)))
    pipe.landmarks[mask] = s_d * (pipe.landmarks[mask] @ Rd.T) + td

    # Loop edge: true relative pose kf0 -> last kf, with the relative
    # scale the closure's Umeyama would report: the local map is inflated
    # by s_d, so Umeyama(local -> old) gives s_u = 1/s_d and the edge
    # carries sigma_z = log(s_u) = -log(s_d).
    pipe.pose_edges.append(dict(
        i=0, j=n - 1, kind="loop",
        z=pipe._rel_pose(pipe.keyframes[0].pose, true_last),
        w=100.0, sigma=float(-np.log(s_d))))
    pipe._run_pose_graph()

    # Position of the last keyframe restored.
    _, t_fixed = lie.se3_exp(jnp.asarray(pipe.keyframes[-1].pose))
    _, t_true = lie.se3_exp(jnp.asarray(true_last))
    assert np.linalg.norm(np.asarray(t_fixed) - np.asarray(t_true)) < 0.2

    # SCALE restored: inter-landmark distances back to pre-drift values.
    d_after = np.linalg.norm(
        pipe.landmarks[mask][:40, None] - pipe.landmarks[mask][None, :40],
        axis=-1)
    ratio = d_after[d_true > 1.0] / d_true[d_true > 1.0]
    assert abs(np.median(ratio) - 1.0) < 0.08, np.median(ratio)


def test_auto_compaction_is_result_neutral(world):
    """compact_interval_kf relabels landmark ids mid-run (monotonic remap,
    orphans dropped); the trajectory must be identical to the uncompacted
    run and the map must not be smaller than the referenced set."""
    n_frames = len(world.poses)

    def run(interval):
        pipe = _pipeline(world)
        if interval:
            pipe.cfg = pipe.cfg.replace(compact_interval_kf=interval)
        for i in range(n_frames):
            pipe.process_frame(np.full((2, 2), i, np.float32))
        return pipe

    a = run(0)
    b = run(2)
    np.testing.assert_array_equal(a.positions(), b.positions())
    assert b.landmarks.shape[0] <= a.landmarks.shape[0]
    # Ids stay dense and in range after the remaps.
    for kf in b.keyframes:
        assert kf.kp_lm.max() < b.landmarks.shape[0]
    # Final explicit compaction leaves zero orphans.
    b.compact_landmarks()
    refs = np.zeros(b.landmarks.shape[0], np.int64)
    for kf in b.keyframes:
        np.add.at(refs, kf.kp_lm[kf.kp_lm >= 0], 1)
    assert (refs > 0).all()


def test_keyframe_culling_keeps_tracking(world):
    """cull_keyframes removes redundant mid-trajectory keyframes; the map
    stays consistent (dense ids, valid edges, re-anchored landmarks) and
    the pipeline keeps tracking accurately afterwards."""
    n_frames = len(world.poses)
    half = 3 * n_frames // 4
    # Dense keyframing + a short window so several keyframes sit outside
    # the protected tail (the default policy keeps maps this small all
    # inside one window, where culling correctly refuses to act).
    cfg = PipelineConfig(
        sift=SiftConfig(mode="lowe", max_keypoints=KP_CAP),
        match=MatchConfig(ratio=0.85, max_matches=KP_CAP),
        ransac=RansacConfig(num_hypotheses=256, inlier_threshold=2.0,
                            min_inliers=15),
        ba=BAConfig(max_iterations=8, cg_iterations=30),
        window_size=4, ba_max_landmarks=1024, ba_max_observations=4096,
        min_bootstrap_parallax=6.0, kf_min_tracked=120, kf_max_interval=2,
        min_triangulation_angle_deg=0.25,
    )
    frames = {i: world.frame_keypoints(i) for i in range(n_frames)}
    pipe = SfmPipeline(INTR, cfg, frontend=lambda g: frames[int(g[0, 0])])
    for i in range(half):
        pipe.process_frame(np.full((2, 2), i, np.float32))
    n_before = len(pipe.keyframes)
    assert n_before >= 8

    stats = pipe.cull_keyframes(redundancy=0.5, min_other_refs=2)
    assert stats["culled"] >= 1, stats
    assert len(pipe.keyframes) == stats["kept"]
    # Invariants: anchors and edges live in the new index space; the
    # odometry chain is consecutive over survivors.
    assert pipe.lm_ref_kf.max() < len(pipe.keyframes)
    odo = [(e["i"], e["j"]) for e in pipe.pose_edges
           if e["kind"] == "odom"]
    assert odo == [(k, k + 1) for k in range(len(pipe.keyframes) - 1)]
    for e in pipe.pose_edges:
        assert 0 <= e["i"] < len(pipe.keyframes)
        assert 0 <= e["j"] < len(pipe.keyframes)

    for i in range(half, n_frames):
        pipe.process_frame(np.full((2, 2), i, np.float32))
    tracked = [r["tracked"] for r in pipe.trajectory[half:]]
    assert np.mean(tracked) > 0.8, tracked
    ate = ate_rmse(pipe.positions(), world.positions, align=True,
                   with_scale=True)
    assert ate < 0.08, ate


@pytest.mark.parametrize("use_mesh", [False, True])
def test_global_ba_refines_whole_map(world, use_mesh):
    """run_global_ba optimizes every keyframe + landmark (optionally
    mesh-sharded); the trajectory ATE must not get worse and the solve
    must actually cover the whole map."""
    pipe = _pipeline(world)
    n_frames = len(world.poses)
    for i in range(n_frames):
        pipe.process_frame(np.full((2, 2), i, np.float32))
    gt = world.positions
    kf_frames = [kf.frame_idx for kf in pipe.keyframes]
    kf_gt = gt[kf_frames]

    def kf_ate(p):
        pos = np.stack([np.asarray(
            __import__("sift_tpu.geometry.lie_np",
                       fromlist=["se3_exp"]).se3_exp(kf.pose)[1])
            for kf in p.keyframes])
        return ate_rmse(pos, kf_gt, align=True, with_scale=True)

    before = kf_ate(pipe)
    mesh = None
    if use_mesh:
        from sift_tpu.config import MeshConfig
        from sift_tpu.dist.mesh import make_mesh
        mesh = make_mesh(MeshConfig(data=4, model=2))
    stats = pipe.run_global_ba(mesh=mesh)
    after = kf_ate(pipe)

    assert stats["n_cams"] == len(pipe.keyframes)
    assert stats["n_obs"] > 100 and stats["n_lms"] > 100
    assert np.isfinite(stats["rmse"]) and stats["rmse"] < 2.0
    assert np.isfinite(pipe.landmarks).all()
    assert after <= before * 1.05 + 1e-4, (before, after)
