"""Configuration dataclasses (static hyperparameters, hashable for jit).

The reference's CLI flags and defaults (``/root/reference/main.cpp:30-41``:
sigma=1.6, k=sqrt(2), octaves=4, dogsPerEpoch=3, subpixel=0) are preserved in
``SiftConfig`` so the parity path reproduces its configuration space; the
remaining configs cover the subsystems the reference does not have.

All configs are frozen dataclasses: they are *static* arguments to jitted
functions (shapes and loop bounds derive from them), never traced values.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    """SIFT frontend configuration.

    Field names mirror the reference CLI (``main.cpp:30-41``) where a
    counterpart exists.
    """

    sigma: float = 1.6            # base blur (ref --sigma)
    k: float = math.sqrt(2.0)     # scale step (ref --k)
    octaves: int = 4              # number of octaves (ref --octaves)
    dogs_per_epoch: int = 3       # DoGs per octave (ref --dogsPerEpoch)
    subpixel: bool = False        # 2x upsample input first (ref --subpixel)

    # Mode: "lowe" = correct Lowe-2004 pipeline; "parity" = replicate the
    # reference's behaviour including quirks (SURVEY.md §2 is the spec).
    mode: str = "lowe"

    # Static-shape budget: max keypoints retained per octave after extrema
    # detection, and max total keypoints after orientation assignment
    # (orientation peaks can spawn duplicates). Downstream buffers are sized
    # by these; excess detections are dropped lowest-score-first.
    # Octave o's cap decays as base >> o (octave o has 4^-o the pixels), with
    # a floor of 64 — this halves the per-keypoint stage cost vs a flat cap.
    max_keypoints_per_octave: int = 512
    max_keypoints: int = 1024

    def octave_cap(self, octave: int) -> int:
        return max(self.max_keypoints_per_octave >> octave, 64)

    # Lowe-mode thresholds (the parity thresholds are hard-coded quirk values
    # in frontend/parity.py: 127.5 offset bound, 7.65 contrast, r=10 edge).
    contrast_threshold: float = 0.03   # on [0,1]-normalized DoG values
    edge_r: float = 10.0
    ori_peak_rel: float = 0.8
    descriptor_max_component: float = 0.2
    # RootSIFT (lowe mode only): L1-normalize + sqrt instead of the final
    # L2 renormalization — L2 on the result equals the Hellinger kernel.
    rootsift: bool = False

    # Image value range. The reference operates on [0,255] grayscale floats
    # (vigra::importImage, main.cpp:52-54); parity mode requires this.
    image_max: float = 255.0

    # Pallas TPU kernels for the hot stages (kernels/pallas/): "auto" uses
    # them on TPU backends and the XLA formulation elsewhere; "on"/"off"
    # force the choice ("on" off-TPU runs the slow Pallas interpreter —
    # test-only).
    pallas: str = "auto"
    # Gradient-map precision for the per-keypoint window FETCH (the stage
    # measured at 62% of HBM peak, r5 roofline): "bfloat16" halves its
    # bytes. Only the fetch is low-precision — orientation/descriptor
    # math converts back to f32 — and the quality impact is measured nil
    # (tools/diag_bf16_windows.py on CPU: 0 keypoint flips, e2e ATE
    # identical; on-v5e compiled kernel: 0/8192 valid flips, x/y/scale
    # bit-identical, desc delta 2.7e-5 mean). Measured on v5e: full
    # extract 32.4 -> 28.3 ms (-13%). Set "float32" to restore exact
    # f32 window bytes (parity mode never uses this path).
    window_dtype: str = "bfloat16"
    # Candidate selection in the extrema stage (lowe only): "approx" uses
    # lax.approx_max_k (TPU-optimized partial sort, recall ~0.99 —
    # marginal tail candidates may differ; parity mode always exact).
    # Default exact: the v5e A/B (benchmarks/extrema_bisect.py) measured
    # only ~0.6 ms back on a ~33 ms program for a 1% candidate-recall
    # cost — not worth the determinism risk as a default.
    extrema_topk: str = "exact"

    def __post_init__(self):
        assert self.octaves > 0, "octaves must be positive (ref sift.cpp:382)"
        assert self.dogs_per_epoch >= 3, "dogsPerEpoch >= 3 (ref sift.cpp:383)"
        assert self.mode in ("lowe", "parity")
        assert self.pallas in ("auto", "on", "off")
        assert self.window_dtype in ("float32", "bfloat16")
        assert self.extrema_topk in ("exact", "approx")

    @property
    def gaussians_per_octave(self) -> int:
        return self.dogs_per_epoch + 1

    def replace(self, **kw) -> "SiftConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """Brute-force descriptor matching (MXU tiled distance + ratio test)."""

    ratio: float = 0.8            # Lowe ratio test threshold
    mutual: bool = True           # require mutual nearest neighbours
    max_matches: int = 1024       # static output size (masked)
    metric: str = "l2"            # "l2" | "dot" | "l2q8" (int8 MXU path)
    # Top-2 backend: "auto" picks the streaming Pallas kernel on TPU for
    # large sets (the (Na, Nb) score matrix never touches HBM —
    # kernels/pallas/match.py); "xla" / "pallas" force a side.
    impl: str = "auto"

    def replace(self, **kw) -> "MatchConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class AnnConfig:
    """IVF-Flat approximate matching (matching/ann.py).

    The brute-force MXU matcher subsumes an index up to ~10^7 database
    descriptors (matching/global_index.py); these defaults target the
    regime past that. Recall is controlled by `nprobe` (== `n_clusters`
    degenerates to exact). `bucket_capacity` must hold the largest
    cluster: size it ~4x the mean occupancy N/n_clusters and check
    `IvfIndex.n_overflow` == 0.
    """

    n_clusters: int = 256
    nprobe: int = 8
    bucket_capacity: int = 512
    kmeans_iters: int = 10
    query_tile: int = 256         # search working set = tile x cap x D

    def replace(self, **kw) -> "AnnConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Batched-hypothesis RANSAC (no data-dependent loop: fixed batch+argmax)."""

    num_hypotheses: int = 512
    inlier_threshold: float = 2.0   # pixels (model-dependent interpretation)
    min_inliers: int = 15
    refit: bool = True              # weighted least-squares refit on inliers
    essential_solver: str = "5pt"   # "5pt" minimal | "8pt" linear

    def replace(self, **kw) -> "RansacConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """Schur-complement bundle adjustment."""

    max_iterations: int = 20
    cg_iterations: int = 50
    cg_tol: float = 1e-6
    damping_init: float = 1e-3
    damping_min: float = 1e-9
    damping_max: float = 1e6
    huber_delta: float = 3.0        # pixels; robust loss scale
    loss: str = "huber"             # "huber" | "cauchy" | "none"
    # Graduated robust loss: effective delta = max(huber_delta,
    # robust_anneal * median_residual). Prevents the measured IRLS
    # divergence on badly-initialized map-scale problems (the
    # everything-is-an-outlier regime); problems whose inliers fit
    # (median < delta/robust_anneal) see plain huber_delta, so
    # true-outlier rejection is unchanged. 0 disables.
    robust_anneal: float = 3.0
    jacobi_precond: bool = True
    # Reduced-camera-system solver: "pcg" (matrix-free, scales to many
    # cameras), "dense" (one-shot Cholesky of the 6Cx6C Schur complement —
    # the latency-optimal choice for window-sized C), or "auto" (dense
    # when C <= 16).
    solver: str = "auto"

    def replace(self, **kw) -> "BAConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for distributed operation.

    axes: (data, model). `data` shards independent work items (images,
    observations, pose-graph edges); `model` shards within-problem state
    (landmark blocks, reduced camera system columns).
    """

    data: int = 1
    model: int = 1
    axis_names: Tuple[str, str] = ("data", "model")

    @property
    def num_devices(self) -> int:
        return self.data * self.model

    def replace(self, **kw) -> "MeshConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level SLAM/SfM pipeline configuration."""

    sift: SiftConfig = SiftConfig()
    match: MatchConfig = MatchConfig()
    ransac: RansacConfig = RansacConfig()
    ba: BAConfig = BAConfig()

    window_size: int = 8            # sliding BA window (keyframes)
    keyframe_min_inliers: int = 30

    # Window-BA static capacities (compiled once; window obs/landmarks are
    # padded up to these).
    ba_max_landmarks: int = 2048
    ba_max_observations: int = 8192

    # Tracking-time window BA budget. Promotions during tracking warm-start
    # from the previous window's solution, so a few LM iterations suffice;
    # the full cfg.ba budget still runs at bootstrap (cold start). Set to 0
    # to use the full budget everywhere.
    ba_tracking_iterations: int = 8
    ba_tracking_cg: int = 20

    # Per-frame tracking localization budget (pose_ransac_refine in the
    # chunk scan / per-frame tracking step): hypothesis count and GN
    # iterations per fit. Tracking starts from a constant-velocity
    # prediction refined over guided matches, so this is a refinement
    # robustness knob, not a cold-start search; the keyframe-promotion
    # and relocalization paths keep the solver's full default budget.
    # Default (8, 8). A (4, 4) budget measured equal SHORT-horizon e2e
    # quality (two-plane chunked ATE 0.0404 vs 0.0424) and -26% chunk-
    # tracker device time, but on the 220-frame long-loop benchmark it
    # balloons drift (sim3 ATE 0.173 -> 0.91 m; the degraded odometry
    # then feeds the pose graph bad loop geometry and global BA
    # diverges). Long-trajectory accuracy sets the default; tune down
    # only for workloads with dense loop closure or external pose
    # correction.
    tracking_ransac_hypotheses: int = 8
    tracking_gn_iters: int = 8

    # Deferred (asynchronous) window BA: dispatch the BA program but don't
    # block on its results; they are applied before the state is next
    # needed (next promotion / pose-graph run / finalize()). Hides the BA
    # latency behind subsequent frames' tracking — the standard
    # local-mapping-thread design, expressed as JAX async dispatch.
    ba_async: bool = False

    # Device-resident chunked tracking (process_sequence only): track a
    # whole extraction batch in ONE lax.scan dispatch — constant-velocity
    # prediction, guided local-map association, and robust pose GN all on
    # device — and read ONE packed (B, 8) buffer per chunk. Promotion
    # decisions are made after the chunk (at most one promotion, at the
    # last qualifying frame); a lost frame falls the chunk back to the
    # per-frame path. Amortizes the host-device round trip over B frames;
    # essential on tunneled backends (~30 ms/read), still a win on local
    # hosts.
    chunked_tracking: bool = False

    # Dispatch the NEXT chunk's extraction before the current chunk's
    # blocking result read (process_sequence): extraction has no data
    # dependency on tracking, so the device fills the read's RTT with
    # useful work. Default on since the measured A/B (50.2 -> 61.2 kf/s
    # on the tunneled v5e; the suspected enqueue-over-read runtime issue
    # did not reproduce). Harmless when chunked_tracking is off.
    extract_ahead: bool = True

    # Defer a chunk promotion's window-BA kickoff until after the NEXT
    # chunk's track + extract dispatches (chunked_tracking only).
    # Measured NEGATIVE on the tunneled v5e: 50.5 vs 67.2 kf/s median,
    # interleaved A/B (benchmarks/slam_ab.py, r3) — the eager kickoff
    # right after the chunk read lands the solve inside the host's
    # bookkeeping+RTT window, while the deferred one delays the next
    # chunk's result instead. Kept as a knob for non-tunneled backends.
    ba_defer_kickoff: bool = False

    # Bootstrap / keyframe policy.
    min_bootstrap_matches: int = 40
    min_bootstrap_parallax: float = 8.0   # px, median flow before two-view init
    # Independent H-vs-E RANSAC attempts per bootstrap try, selected by
    # triangulation health (n_good) — consensus across keys removes the
    # single-draw knife edge on plane-dominant scenes (r5; measured in
    # tools/diag_knife_edge.py).
    boot_attempts: int = 4
    # A homography-selected bootstrap must see this multiple of the
    # parallax gate before being trusted: near the gate H ~ I and its
    # Faugeras decomposition is pure noise (low parallax cannot
    # invalidate any motion model, so health checks pass regardless).
    # Deferred frames are pose-backfilled when the bootstrap lands.
    h_parallax_factor: float = 2.0
    kf_min_tracked: int = 60              # new keyframe when tracked lms drop below
    kf_max_interval: int = 10             # ... or this many frames elapsed
    min_triangulation_angle_deg: float = 0.5
    max_reproj_error_px: float = 3.0

    # RGB-D: accepted depth range in meters (sensor-dependent; TUM Kinect
    # is reliable to ~5-8 m, synthetic scenes can be deeper).
    depth_min: float = 0.1
    depth_max: float = 25.0

    # Local-map tracking: associate each frame against the deduplicated
    # union of landmarks observed by the last `window_size` keyframes
    # (capacity below, padded static) instead of only the last keyframe.
    use_local_map: bool = True
    local_map_size: int = 2048

    # Guided (projection-prior) matching during tracking: candidates must
    # fall within this pixel radius of the landmark's predicted projection
    # (0 disables; relocalization/loop probes always match unguided).
    guided_radius: float = 40.0

    # Relocalization after tracking loss.
    reloc_after_lost: int = 3         # failed frames before attempting
    reloc_candidates: int = 6         # keyframes probed per attempt

    # Global descriptor index (matching/global_index.py): MXU brute-force
    # place recognition ranks loop-closure / relocalization candidate
    # keyframes by descriptor votes instead of blind uniform probing.
    use_global_index: bool = True
    global_index_sim: float = 0.85    # cosine vote threshold

    # Loop closure / pose-graph SLAM.
    enable_loop_closure: bool = False
    # Optimize the pose graph over Sim(3) instead of SE(3): monocular
    # odometry accumulates SCALE drift, and an SE(3) graph has no variable
    # to absorb it — the loop edge's relative scale (Umeyama on duplicate-
    # landmark pairs) propagates through 7-dof nodes and landmarks are
    # re-anchored with their creating keyframe's similarity correction
    # (Strasdat RSS 2010). Metric pipelines (RGB-D/stereo) keep SE(3).
    pose_graph_sim3: bool = False
    loop_candidates: int = 4          # old keyframes probed per promotion
    loop_min_inliers: int = 40        # 2D-3D inliers to accept a closure
    loop_max_rmse: float = 1.0        # px; genuine revisits re-localize tightly
    loop_weight: float = 10.0         # edge information vs odometry's 1.0
    max_pose_graph_nodes: int = 256   # static PGO capacity (pad + mask)
    max_pose_graph_edges: int = 1024

    # Map maintenance: every N keyframe promotions, drop unreferenced
    # landmark rows (loop-closure fusion orphans) and compact the id
    # space (SfmPipeline.compact_landmarks). 0 = manual only.
    compact_interval_kf: int = 0
    # Capacity audit: read extraction n_dropped per chunk into
    # chunk_stats["extract_dropped"]. One extra device->host read per
    # chunk (~30 ms on tunneled backends) — benches/tests only.
    track_saturation: bool = False

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)
