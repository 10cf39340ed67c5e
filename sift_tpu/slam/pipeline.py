"""Incremental monocular SfM pipeline (BASELINE.json configs #3/#4).

Architecture: *host orchestrates, device computes*. Every numeric stage is a
jit-compiled fixed-shape program — extraction, matching, RANSAC two-view
bootstrap, pose-only tracking, triangulation, sliding-window Schur BA — and
the host layer does only bookkeeping (keyframe policy, landmark ids,
observation lists) in numpy. Dynamic sizes exist *between* stages, never
inside one: each stage's inputs are padded to static capacities from
`PipelineConfig`, so every stage compiles exactly once per config.

Pipeline states:
  bootstrap — accumulate frames against the first keyframe until parallax
              and match count allow a two-view initialization (essential
              RANSAC -> cheirality -> GN polish -> DLT triangulation; map
              scale gauge: |t| = 1).
  tracking  — per frame: match to the reference keyframe, localize with
              robust pose-only GN on 2D-3D correspondences; on keyframe
              promotion: add observations, triangulate new landmarks, run
              sliding-window BA with the two oldest window cameras fixed.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sift_tpu.config import PipelineConfig
from sift_tpu.types import Keypoints, Matches
from sift_tpu.frontend.sift import extract
from sift_tpu.frontend.sift import extract_batch as extract_batch_fe
from sift_tpu.matching.matcher import match_descriptors
from sift_tpu.geometry import lie, lie_np
from sift_tpu.geometry.epipolar import estimate_relative_pose
from sift_tpu.geometry.triangulation import triangulate_dlt
from sift_tpu.ba.pose_only import pose_ransac_refine
from sift_tpu.ba.solver import run_ba
from sift_tpu.utils.metrics import MetricsLogger


def _np_kp(kp: Keypoints, subpixel: bool = False) -> Dict[str, np.ndarray]:
    """Host keypoint dict with (u, v) in *original-image* pixels.

    `subpixel` must match the extractor's `SiftConfig.subpixel`: with the 2x
    pre-upsample on, level coords are in doubled-image pixels and the image
    mapping divides by 2 (reference rule, main.cpp:62-63) — dropping the
    divisor would feed localization/triangulation coordinates at 2x the
    intrinsics' scale.

    Transfer discipline (the host loop is transfer-bound on tunneled
    backends): the small metadata fields come down PACKED in ONE buffer
    (one read, not four); the 512 KB descriptor buffer STAYS ON DEVICE —
    every consumer of `d["desc"]` is itself a device computation
    (matching), and the few host-side consumers (save_map) convert
    explicitly.
    """
    packed = np.asarray(_pack_kp_meta(kp))
    x, y = packed[0], packed[1]
    octave = packed[2].astype(np.int32)
    valid = packed[3] > 0.5
    d = dict(x=x, y=y, valid=valid, octave=octave, desc=kp.desc)
    factor = np.exp2(octave.astype(np.float64))
    if subpixel:
        factor = factor / 2.0
    d["u"] = d["x"] * factor
    d["v"] = d["y"] * factor
    return d


# Host-side 6-dof pose arithmetic uses the numpy lie mirrors: a jitted call
# for a single (6,) op costs a full device dispatch (~26 ms RTT on a
# tunneled backend) for nanoseconds of math. lie_np is equivalence-tested
# against the JAX ops (tests/unit/test_lie.py::TestNumpyMirror).
def _se3_exp_np(xi):
    return lie_np.se3_exp(np.asarray(xi, np.float32))


def _se3_log_np(R, t):
    return lie_np.se3_log(np.asarray(R, np.float32),
                          np.asarray(t, np.float32))


@jax.jit
def _pgo_jit(graph):
    from sift_tpu.slam.pose_graph import optimize_pose_graph
    return optimize_pose_graph(graph, iterations=15)


@jax.jit
def _pgo_sim3_jit(graph):
    from sift_tpu.slam.pose_graph import optimize_pose_graph_sim3
    return optimize_pose_graph_sim3(graph, iterations=15)


# Host-side Sim(3) bookkeeping runs as TWO jitted dispatches, not eager
# ops: on tunneled backends every eager jnp op is a remote round trip —
# the eager edge-conversion + delta chain cost ~56 s PER pose-graph run
# in the r3 long-loop bench (vs 0.1 s for the solve itself).
@jax.jit
def _stack_jit(*xs):
    """Stack device arrays in ONE jitted dispatch (an eager jnp.stack is
    a remote round trip per call on tunneled backends)."""
    return jnp.stack(xs)


@jax.jit
def _sim3_edges_jit(ez6, sig):
    from sift_tpu.geometry import sim3 as sim3m
    Rz, tz = lie.se3_exp(ez6)
    return sim3m.sim3_log(jnp.exp(sig), Rz, tz)


@jax.jit
def _sim3_deltas_jit(out7, old6):
    """(N, 7) optimized Sim(3) logs + (N, 6) old SE(3) logs -> one packed
    (N, 25) buffer [sd | Rd 9 | td 3 | R_new 9 | t_new 3] per node."""
    from sift_tpu.geometry import sim3 as sim3m
    s_new, R_new, t_new = sim3m.sim3_exp(out7)
    old7 = jnp.concatenate([old6, jnp.zeros_like(old6[:, :1])], -1)
    s_old, R_old, t_old = sim3m.sim3_exp(old7)
    sd, Rd, td = sim3m.sim3_compose(
        s_new, R_new, t_new, *sim3m.sim3_inverse(s_old, R_old, t_old))
    return jnp.concatenate(
        [sd[:, None], Rd.reshape(-1, 9), td,
         R_new.reshape(-1, 9), t_new], -1)


# Module-level so repeated run_global_ba calls reuse jax's compilation
# cache (a per-call jax.jit wrapper would re-trace every invocation).
_global_ba_jit = jax.jit(run_ba, static_argnums=(7,))


@jax.jit
def _pack_kp_meta(kp: Keypoints) -> jnp.ndarray:
    """(4, N) f32: x, y, octave, valid — one host read instead of four."""
    return jnp.stack([kp.x, kp.y, kp.octave.astype(jnp.float32),
                      kp.valid.astype(jnp.float32)])


class Keyframe:
    def __init__(self, frame_idx: int, pose: np.ndarray,
                 kp: Dict[str, np.ndarray]):
        self.frame_idx = frame_idx
        self.pose = pose.astype(np.float32)       # (6,) world-from-camera
        self.kp = kp                              # host keypoint arrays
        n = kp["x"].shape[0]
        self.kp_lm = np.full((n,), -1, np.int64)  # keypoint slot -> landmark


class SfmPipeline:
    """Incremental monocular SfM. Feed frames with `process_frame(gray)`."""

    def __init__(self, intrinsics, cfg: Optional[PipelineConfig] = None,
                 seed: int = 0, logger: Optional[MetricsLogger] = None,
                 frontend=None, stereo_baseline: Optional[float] = None,
                 mesh=None):
        """`frontend`: optional callable gray -> Keypoints replacing the SIFT
        extractor (tests inject synthetic keypoints; a learned frontend could
        drop in the same way). `stereo_baseline`: meters, enables the
        rectified-stereo depth path (`process_frame(..., right=...)`).
        `mesh`: optional `jax.sharding.Mesh` — `process_sequence` chunk
        extraction (the FLOPs-dominant stage) runs data-parallel across it
        (`dist/frontend_dist.py`); the chunk `batch` must divide the device
        count. Tracking/BA dispatches consume the sharded keypoint buffers
        directly (XLA inserts the reshards)."""
        self.cfg = cfg or PipelineConfig()
        self.K = np.asarray(intrinsics, np.float32)    # fx, fy, cx, cy
        self.logger = logger
        self.frontend = frontend
        self.stereo_baseline = stereo_baseline
        self.mesh = mesh
        self._key = jax.random.PRNGKey(seed)

        self.keyframes: List[Keyframe] = []
        self.landmarks = np.zeros((0, 3), np.float32)
        self.lm_ref_kf = np.zeros((0,), np.int64)   # creating keyframe index
        self.trajectory: List[Dict] = []
        self.state = "bootstrap"
        self._frame_idx = -1
        self._frames_since_kf = 0
        self._frames_lost = 0

        # Pose graph: odometry edges between consecutive keyframes plus
        # loop-closure edges; optimized on every accepted closure.
        self.pose_edges: List[Dict] = []
        self.num_loop_closures = 0
        # Per-candidate loop-probe outcomes (host bookkeeping, no
        # dispatch cost): every probed candidate's gate values land here
        # so knife-edge acceptance can be diagnosed offline — which gate
        # (votes / n_has / n_inl / rmse) sits closest to its threshold.
        self.loop_probe_log: List[Dict] = []

        # Local-map cache: rebuilt only when the observation graph changes
        # (promotion / landmark fusion / load), not every tracked frame.
        self._map_version = 0
        self._local_map_cache = None

        # Global descriptor index (lazy; built at the first promotion).
        self._global_index = None

        # Chunked-tracking introspection: how many extraction chunks were
        # handled by the fused single-dispatch path and how many keyframe
        # promotions rode its packed buffer (vs the per-frame fallback).
        self.chunk_stats = {"chunks": 0, "fused_promotions": 0}

        self._build_jit_stages()

    # ------------------------------------------------------------------ jit
    def _build_jit_stages(self):
        cfg = self.cfg
        K = jnp.asarray(self.K)

        if self.frontend is not None:
            _extract = self.frontend
        else:
            @jax.jit
            def _extract(gray):
                return extract(gray.astype(jnp.float32), cfg.sift,
                               with_descriptors=True)

        @jax.jit
        def _extract_batch(imgs):
            # uint8 frames are cast on DEVICE: host->device transfer is the
            # dominant SLAM-loop cost on remote backends (measured 211-229
            # ms per 8xVGA f32 chunk over the axon tunnel vs ~38 ms for the
            # chunk's packed result read), so frames cross the link in
            # their native 1-byte dtype whenever the caller has one.
            imgs = imgs.astype(jnp.float32)
            # Batch-flattened path (frontend/sift.py): same outputs as
            # vmap(extract), measured faster at the chunk size.
            return extract_batch_fe(imgs, cfg.sift, True)

        if self.mesh is not None:
            from sift_tpu.dist.frontend_dist import extract_batch_sharded
            mesh = self.mesh
            # Multi-process meshes must replicate keypoint outputs: the
            # host tracking logic reads buffers that would otherwise span
            # non-addressable (remote-process) devices.
            repl = jax.process_count() > 1

            def _extract_batch_mesh(imgs):
                kp = extract_batch_sharded(mesh, imgs, cfg.sift,
                                           with_descriptors=True,
                                           replicate=repl)
                if repl:
                    # Re-anchor the (replicated) outputs as PROCESS-LOCAL
                    # arrays: downstream tracking dispatches then compile
                    # to local programs executed identically on every
                    # process (replicated host logic — the multi-host SLAM
                    # architecture), instead of cross-process collectives
                    # whose submission order would couple the processes.
                    kp = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)),
                                      kp)
                return kp

            self._jit_extract_batch = _extract_batch_mesh
        else:
            self._jit_extract_batch = _extract_batch

        @jax.jit
        def _match(da, va, db, vb):
            return match_descriptors(da, va, db, vb, cfg.match)

        if self.stereo_baseline is not None:
            from sift_tpu.matching.stereo import stereo_depths
            fx_s = float(self.K[0])
            bl = float(self.stereo_baseline)

            subpix = bool(self.cfg.sift.subpixel)

            @jax.jit
            def _stereo(kp_l, kp_r):
                return stereo_depths(kp_l, kp_r, fx_s, bl, subpixel=subpix)

            self._jit_stereo = _stereo

            @jax.jit
            def _stereo_batch(kp_l, kp_r):
                return jax.vmap(lambda a, b: stereo_depths(
                    a, b, fx_s, bl, subpixel=subpix))(kp_l, kp_r)

            self._jit_stereo_batch = _stereo_batch

        from sift_tpu.matching.matcher import match_descriptors_guided
        from sift_tpu.geometry.camera import project as project_cam

        @jax.jit
        def _guided_match(da, va, uv_pred, has_pred, db, vb, uv_b):
            return match_descriptors_guided(
                da, va, db, vb, uv_pred, has_pred, uv_b,
                cfg.guided_radius, cfg.match)

        @jax.jit
        def _project(pose, lms):
            uv, z = project_cam(pose, K, lms)
            return uv, z

        uv_div = 2.0 if cfg.sift.subpixel else 1.0

        @jax.jit
        def _track_local(key, init_pose, desc_ref, valid_ref, lms_ref, kp):
            """Fused per-frame tracking: landmark projection -> guided
            matching -> robust pose refinement in ONE device dispatch.

            The per-frame loop is dispatch- and transfer-bound on remote
            backends: fusing the three stages removes two round trips, the
            frame's Keypoints pytree `kp` never leaves the device (pixel
            coordinates are derived from level coords in here), and the
            result is ONE packed (8,) buffer — pose (6), inlier count,
            rmse — so the host pays a single read per tracked frame.
            """
            uv_pred, z = project_cam(init_pose, K, lms_ref)
            has_pred = valid_ref & (z > 1e-6)
            factor = jnp.exp2(kp.octave.astype(jnp.float32)) / uv_div
            uv_b = jnp.stack([kp.x * factor, kp.y * factor], -1)
            m = match_descriptors_guided(
                desc_ref, valid_ref, kp.desc, kp.valid,
                uv_pred, has_pred, uv_b, cfg.guided_radius, cfg.match)
            # masked 2D-3D correspondences straight from the match buffer
            lms = lms_ref[m.idx_a]
            uv = uv_b[m.idx_b]
            pose, inliers, rmse = pose_ransac_refine(
                key, init_pose, K, lms, uv, m.valid,
                num_hypotheses=cfg.tracking_ransac_hypotheses,
                iters=cfg.tracking_gn_iters,
                delta=cfg.ransac.inlier_threshold)
            n_inl = jnp.sum(inliers.astype(jnp.int32)).astype(jnp.float32)
            return jnp.concatenate([pose, n_inl[None], rmse[None]])

        def _chunk_scan(key, pose0, vel0, desc_ref, valid_ref, lms_ref,
                        kp_batch):
            """Shared scan body of the chunk trackers: constant-velocity
            prediction, guided local-map association, robust pose GN per
            frame; returns a packed (B, 8) buffer [pose(6), n_inl, rmse]."""
            min_inl = cfg.keyframe_min_inliers // 2

            def step(carry, inputs):
                pose_prev, vel = carry
                kp, idx = inputs
                pred = lie.boxplus(pose_prev, vel)
                uv_pred, z = project_cam(pred, K, lms_ref)
                has_pred = valid_ref & (z > 1e-6)
                factor = jnp.exp2(kp.octave.astype(jnp.float32)) / uv_div
                uv_b = jnp.stack([kp.x * factor, kp.y * factor], -1)
                m = match_descriptors_guided(
                    desc_ref, valid_ref, kp.desc, kp.valid,
                    uv_pred, has_pred, uv_b, cfg.guided_radius, cfg.match)
                lms = lms_ref[m.idx_a]
                uv = uv_b[m.idx_b]
                k_i = jax.random.fold_in(key, idx)
                pose, inliers, rmse = pose_ransac_refine(
                    k_i, pred, K, lms, uv, m.valid,
                    num_hypotheses=cfg.tracking_ransac_hypotheses,
                    iters=cfg.tracking_gn_iters,
                    delta=cfg.ransac.inlier_threshold)
                n_inl = jnp.sum(inliers.astype(jnp.int32))
                tracked = n_inl >= min_inl
                pose_use = jnp.where(tracked, pose, pose_prev)
                # On-device velocity update: log(T_prev^-1 T_new).
                Rp, tp = lie.se3_exp(pose_prev)
                Rn, tn = lie.se3_exp(pose_use)
                Rpi, tpi = lie.se3_inverse(Rp, tp)
                Rr, tr = lie.se3_compose(Rpi, tpi, Rn, tn)
                vel_new = jnp.where(tracked, lie.se3_log(Rr, tr),
                                    jnp.zeros(6, pose0.dtype))
                packed = jnp.concatenate(
                    [pose_use, n_inl.astype(jnp.float32)[None],
                     rmse[None]])
                return (pose_use, vel_new), packed

            B = kp_batch.x.shape[0]
            carry, out = lax.scan(
                step, (pose0, vel0),
                (kp_batch, jnp.arange(B, dtype=jnp.int32)))
            return carry, out                   # ((pose, vel), (B, 8))

        def _promo_lm_table(payload, lms_kf_p, has_lm_kf_p, N):
            """Device-side replay of `_promote_keyframe`'s landmark
            bookkeeping: the promoted frame's per-keypoint landmark table
            [(N, 3) positions, (N,) has] from a `_kf_track_body` payload —
            inlier 2D-3D matches adopt the ref keyframe's landmark, good
            no-landmark triangulations spawn one (same assignment order as
            the host: 2D-3D first, then triangulated). Lets a SECOND
            in-chunk promotion guided-match against the first one without
            any host round trip."""
            Mcap = cfg.match.max_matches
            ia = payload[0:Mcap].astype(jnp.int32)
            ib = payload[Mcap:2 * Mcap].astype(jnp.int32)
            inl = payload[3 * Mcap:4 * Mcap] > 0.5
            tri = payload[4 * Mcap:8 * Mcap].reshape(Mcap, 4)
            lmof = has_lm_kf_p[ia]
            take_lm = inl & lmof
            tri_ok = tri[:, 3] > 0.5        # already masked to no-lm rows
            # Masked scatters: non-participating rows land in dump slot N.
            pos = jnp.zeros((N + 1, 3), jnp.float32)
            hasv = jnp.zeros((N + 1,), bool)
            idx_t = jnp.where(take_lm, ib, N)
            pos = pos.at[idx_t].set(lms_kf_p[ia])
            hasv = hasv.at[idx_t].set(take_lm)
            idx_r = jnp.where(tri_ok, ib, N)
            pos = pos.at[idx_r].set(tri[:, :3])
            hasv = hasv.at[idx_r].set(tri_ok)
            return pos[:N], hasv[:N]

        # Exposed for the unit test pinning the device replay against the
        # host bookkeeping rules (tests/unit/test_promo_lm_table.py).
        self._promo_lm_table_for_tests = _promo_lm_table

        @jax.jit
        def _track_chunk_promo(key, pose0, vel0, since0, nf, desc_ref,
                               valid_ref, lms_ref, kp_batch, pose_kf,
                               desc_kf, valid_kf, lms_kf, has_lm_kf, uv_kf):
            """Chunk tracking with the keyframe-promotion payload fused in.

            Replays the host promotion policy ON DEVICE (first frame b < nf
            with n_inl < kf_min_tracked or since0+b+1 >= kf_max_interval,
            provided no frame lost tracking) and, for that frame, runs the
            full guided keyframe match + localize + candidate triangulation
            (`_kf_track` body) against the last keyframe's buffers inside
            the same program. A promotion therefore costs the host ZERO
            extra dispatches or reads: everything it needs — per-frame
            poses, the promotion frame index, the match/inlier/triangulation
            payload, and the promoted frame's keypoint metadata — comes
            down in the chunk's single packed buffer, and the promoted
            frame's descriptors stay on device as an extra (unread) output.

            Chunks larger than 8 frames fuse up to B//8 promotions: each
            later promotion guided-matches against the PREVIOUS promoted
            frame, whose landmark table is reconstructed on device from the
            previous payload (`_promo_lm_table`) — so a 16-frame chunk with
            two promotions still costs ONE dispatch + ONE packed read.

            Chunks larger than 16 frames run as fused 16-frame SUB-CHUNKS
            inside the same program: each sub-chunk after the first
            re-tracks against the latest promoted frame's landmark table
            instead of the chunk-start local map. This removes the r3
            negative result for 32-frame chunks ("local map built at chunk
            start goes stale over ~70 px of flow") while keeping ONE
            dispatch + ONE packed read for the whole chunk; B <= 16
            compiles to exactly the former single-scan program.

            Returns (packed, [desc_p, valid_p] per promo slot) with packed =
            [per-frame (B, 8) | promote_at (P) | payloads (P, 8M+8) |
             metas (P, 4N)].
            """
            B = kp_batch.x.shape[0]
            N = kp_batch.x.shape[1]
            Mcap = cfg.match.max_matches
            Mloc = desc_ref.shape[0]
            f32 = jnp.float32
            min_inl = cfg.keyframe_min_inliers // 2
            # B <= 16 keeps the former single-scan program (bit-identical
            # packed output); larger chunks subdivide into 8-frame scans
            # so the tracking reference refreshes at every promotion
            # opportunity — 16-frame refresh was measured too coarse (a
            # promoted-frame table is narrower than the curated local
            # map, so it goes stale faster).
            subs = ([8] * (B // 8)
                    if B % 8 == 0 and B > 16 else [B])

            pose_c, vel_c = pose0, vel0
            since_last = since0                 # at the last frame seen
            all_tracked = jnp.bool_(True)       # cumulative over sub-chunks
            any_promo = jnp.bool_(False)        # any promo so far in chunk
            # Previous-promo reference buffers (start: the last keyframe).
            # Updated by where-SELECT per slot, never plain assignment, so
            # it always holds the latest VALID promoted frame (or the last
            # keyframe) even when a slot does not fire.
            ref = dict(pose=pose_kf, desc=desc_kf, valid=valid_kf,
                       lms=lms_kf, has=has_lm_kf, uv=uv_kf)
            outs, promote_ats, payloads, metas, desc_out = \
                [], [], [], [], []
            slot = 0
            si = 0
            for s, SUB in enumerate(subs):
                if s == 0:
                    tr = (desc_ref, valid_ref, lms_ref)
                    key_s = key
                else:
                    # Mid-chunk tracking-reference refresh: pad the
                    # latest promoted frame's landmark table to the
                    # local-map capacity and select it over the (now
                    # stale) chunk-start local map if any promo fired.
                    pd = max(Mloc - N, 0)
                    tdesc = jnp.concatenate(
                        [ref["desc"],
                         jnp.zeros((pd,) + ref["desc"].shape[1:],
                                   ref["desc"].dtype)])[:Mloc]
                    tval = jnp.concatenate(
                        [ref["valid"] & ref["has"],
                         jnp.zeros((pd,), bool)])[:Mloc]
                    tlms = jnp.concatenate(
                        [ref["lms"], jnp.zeros((pd, 3), f32)])[:Mloc]
                    tr = (jnp.where(any_promo, tdesc, desc_ref),
                          jnp.where(any_promo, tval, valid_ref),
                          jnp.where(any_promo, tlms, lms_ref))
                    key_s = jax.random.fold_in(key, 0xC40 + s)
                kp_sub = jax.tree.map(lambda a: a[si:si + SUB], kp_batch)
                (pose_c, vel_c), out_s = _chunk_scan(
                    key_s, pose_c, vel_c, tr[0], tr[1], tr[2], kp_sub)
                outs.append(out_s)
                n_inl = out_s[:, 6].astype(jnp.int32)
                iota = jnp.arange(SUB, dtype=jnp.int32)
                real = (si + iota) < nf
                all_tracked = all_tracked & jnp.all(
                    jnp.logical_not(real) | (n_inl >= min_inl))
                low = n_inl < cfg.kf_min_tracked
                since = since_last + 1 + iota
                gate = jnp.ones((SUB,), bool)
                prev_any = all_tracked
                for pi in range(max(1, SUB // 8)):
                    qualify = real & gate & (
                        low | (since >= cfg.kf_max_interval))
                    any_q = prev_any & jnp.any(qualify)
                    pa = jnp.argmax(qualify)
                    promote_ats.append(
                        jnp.where(any_q, si + pa, -1).astype(f32))

                    kp_p = jax.tree.map(
                        lambda a: lax.dynamic_index_in_dim(
                            a, pa, 0, keepdims=False),
                        kp_sub)
                    meta = jnp.stack([kp_p.x, kp_p.y,
                                      kp_p.octave.astype(f32),
                                      kp_p.valid.astype(f32)])
                    factor = jnp.exp2(kp_p.octave.astype(f32)) / uv_div
                    uv_b = jnp.stack([kp_p.x * factor,
                                      kp_p.y * factor], -1)
                    pose_seed = out_s[pa, :6]
                    r = ref

                    def do_promo(_):
                        return _kf_track_body(
                            True, jax.random.fold_in(key, 0x5EED + slot),
                            pose_seed, r["pose"], r["desc"], r["valid"],
                            r["lms"], r["has"], r["uv"],
                            kp_p.desc, kp_p.valid, uv_b)

                    def no_promo(_):
                        return jnp.zeros((8 * Mcap + 8,), f32)

                    payload = lax.cond(any_q, do_promo, no_promo, None)
                    payloads.append(payload)
                    metas.append(meta.reshape(-1))
                    desc_out.extend([kp_p.desc, kp_p.valid])
                    slot += 1

                    # Next promo / next sub-chunk tracks relative to the
                    # latest promoted frame (select keeps `ref` valid when
                    # this slot did not fire).
                    lms_p, has_p = _promo_lm_table(payload, r["lms"],
                                                   r["has"], N)
                    new_ref = dict(pose=payload[8 * Mcap:8 * Mcap + 6],
                                   desc=kp_p.desc, valid=kp_p.valid,
                                   lms=lms_p, has=has_p, uv=uv_b)
                    ref = jax.tree.map(
                        lambda nw, od: jnp.where(any_q, nw, od),
                        new_ref, ref)
                    since = jnp.where(any_q, iota - pa, since)
                    gate = iota > pa
                    prev_any = any_q
                    any_promo = any_promo | any_q
                since_last = since[SUB - 1]
                si += SUB

            out = jnp.concatenate(outs, axis=0) if len(outs) > 1 \
                else outs[0]
            packed = jnp.concatenate(
                [out.reshape(-1)] + [a[None] for a in promote_ats]
                + payloads + metas)
            return (packed,) + tuple(desc_out)

        def _tri_pair(pose_a, pose_b, pa, pb):
            """(M,) pixel pairs -> (M, 4) [X | good] (shared by the
            standalone _triangulate and the fused promotion dispatch)."""
            na = jnp.stack([(pa[:, 0] - cx) / fx, (pa[:, 1] - cy) / fy], -1)
            nb = jnp.stack([(pb[:, 0] - cx) / fx, (pb[:, 1] - cy) / fy], -1)

            def P_of(pose):
                R, t = lie.se3_exp(pose)
                Rt, tt = lie.se3_inverse(R, t)
                return jnp.concatenate([Rt, tt[:, None]], 1)

            Pa, Pb = P_of(pose_a), P_of(pose_b)
            X = triangulate_dlt(Pa, Pb, na, nb)
            za = (X @ Pa[:, :3].T + Pa[:, 3])[:, 2]
            zb = (X @ Pb[:, :3].T + Pb[:, 3])[:, 2]
            xa = X @ Pa[:, :3].T + Pa[:, 3]
            ra = xa[:, :2] / jnp.maximum(za[:, None], 1e-6) - na
            err_px = jnp.linalg.norm(ra, axis=-1) * focal
            _, ta = lie.se3_exp(pose_a)
            _, tb = lie.se3_exp(pose_b)
            da = X - ta
            db = X - tb
            cosang = jnp.sum(da * db, -1) / jnp.maximum(
                jnp.linalg.norm(da, axis=-1) * jnp.linalg.norm(db, axis=-1),
                1e-9)
            ang_ok = cosang < np.cos(
                np.radians(cfg.min_triangulation_angle_deg))
            good = (za > 1e-3) & (zb > 1e-3) & ang_ok & \
                (err_px < cfg.max_reproj_error_px)
            return jnp.concatenate(
                [X, good.astype(jnp.float32)[:, None]], -1)

        def _kf_track_body(guided, key, init_pose, pose_ref, desc_a,
                           valid_a, lms_a, has_lm_a, uv_a, desc_b, valid_b,
                           uv_b):
            """Fused keyframe match + localize + candidate triangulation
            (promotions, reloc probes; also inlined into the fused chunk
            dispatch): one packed buffer — [idx_a(M), idx_b(M),
            match_valid(M), inliers(M), X|good (4M, triangulated from
            pose_ref and the ACCEPTED pose for match rows without
            landmarks), pose(6), n_inl, rmse]."""
            uv_pred, z = project_cam(init_pose, K, lms_a)
            has_pred = valid_a & has_lm_a & (z > 1e-6)
            if guided:
                m = match_descriptors_guided(
                    desc_a, valid_a, desc_b, valid_b, uv_pred, has_pred,
                    uv_b, cfg.guided_radius, cfg.match)
            else:
                m = match_descriptors(desc_a, valid_a, desc_b, valid_b,
                                      cfg.match)
            pv = m.valid & has_lm_a[m.idx_a]
            lms = lms_a[m.idx_a]
            uv = uv_b[m.idx_b]
            pose, inliers, rmse = pose_ransac_refine(
                key, init_pose, K, lms, uv, pv,
                delta=cfg.ransac.inlier_threshold)
            # New-landmark candidates: 2D-2D matches without landmarks,
            # triangulated against the accepted pose in the same
            # program (saves a dispatch + a read per promotion).
            tri = _tri_pair(pose_ref, pose, uv_a[m.idx_a], uv)
            no_lm = m.valid & jnp.logical_not(has_lm_a[m.idx_a])
            tri = tri.at[:, 3].set(
                tri[:, 3] * no_lm.astype(jnp.float32))
            f32 = jnp.float32
            return jnp.concatenate([
                m.idx_a.astype(f32), m.idx_b.astype(f32),
                m.valid.astype(f32), inliers.astype(f32),
                tri.reshape(-1), pose,
                jnp.sum(inliers.astype(jnp.int32)).astype(f32)[None],
                rmse[None]])

        def _make_kf_track(guided: bool):
            @jax.jit
            def _kf_track(key, init_pose, pose_ref, desc_a, valid_a, lms_a,
                          has_lm_a, uv_a, desc_b, valid_b, uv_b):
                return _kf_track_body(guided, key, init_pose, pose_ref,
                                      desc_a, valid_a, lms_a, has_lm_a,
                                      uv_a, desc_b, valid_b, uv_b)
            return _kf_track

        self._jit_guided_match = _guided_match
        self._jit_project = _project
        self._jit_track_local = _track_local
        self._jit_track_chunk_promo = _track_chunk_promo
        self._jit_kf_track = {True: _make_kf_track(True),
                              False: _make_kf_track(False)}

        @jax.jit
        def _reloc_probe(key, desc_bank, desc_q, packed):
            """All relocalization candidates probed in ONE dispatch
            (`_kf_track_body` unguided, vmapped over the candidate bank).

            A lost frame used to pay one fused dispatch + ~8 uploads + one
            packed read PER candidate, sequentially — the worst case
            (nothing matches, which is exactly what a blackout looks like)
            paid all `reloc_candidates` of them every frame. The batched
            probe pays 2 uploads + 1 read regardless.

            `packed` (host f32, one upload): [valid_bank K*N | lms_bank
            K*N*3 | has_bank K*N | uv_bank K*2N | poses K*6 | valid_q N |
            uv_q 2N]. Returns (K, 8*Mcap + 8) `_kf_track_body` payloads;
            padded candidate slots repeat candidate 0 and are never
            decoded host-side.
            """
            Kc, N = desc_bank.shape[0], desc_bank.shape[1]
            off = 0
            valid_bank = packed[off:off + Kc * N].reshape(Kc, N) > 0.5
            off += Kc * N
            lms_bank = packed[off:off + Kc * N * 3].reshape(Kc, N, 3)
            off += Kc * N * 3
            has_bank = packed[off:off + Kc * N].reshape(Kc, N) > 0.5
            off += Kc * N
            uv_bank = packed[off:off + Kc * 2 * N].reshape(Kc, N, 2)
            off += Kc * 2 * N
            poses = packed[off:off + Kc * 6].reshape(Kc, 6)
            off += Kc * 6
            valid_q = packed[off:off + N] > 0.5
            off += N
            uv_q = packed[off:off + 2 * N].reshape(N, 2)
            keys = jax.random.split(key, Kc)

            def one(k_key, pose_k, desc_k, valid_k, lms_k, has_k, uv_k):
                return _kf_track_body(False, k_key, pose_k, pose_k,
                                      desc_k, valid_k, lms_k, has_k, uv_k,
                                      desc_q, valid_q, uv_q)

            return jax.vmap(one)(keys, poses, desc_bank, valid_bank,
                                 lms_bank, has_bank, uv_bank)

        self._jit_reloc_probe = _reloc_probe

        fx, fy, cx, cy = self.K
        focal = float((fx + fy) * 0.5)

        @jax.jit
        def _bootstrap(key, pa, pb, valid):
            """Two-view initialization with H-vs-E model selection
            (ORB-SLAM-style): planar/low-parallax scenes make the essential
            matrix degenerate, so both models are fitted and the one with
            clearly dominant support wins. Branch-free: both paths compute,
            `jnp.where` selects.

            Knife-edge hardening (r5): a SINGLE RANSAC draw on
            near-degenerate (plane-dominant) data can land in a wrong-basin
            essential whose mirror map fails the downstream
            triangulation-health gate — and ~1e-3 keypoint/descriptor
            perturbations flipped which basin won (measured:
            tools/diag_knife_edge.py, the r4 "loop-closure" e2e flip was
            actually THIS gate at bootstrap frame 2). The fix is consensus
            across `boot_attempts` independent keys with selection by
            n_good — the health metric the acceptance gate itself uses —
            rather than by raw epipolar inlier count. One dispatch, vmapped
            attempts; bootstrap runs a handful of times per sequence, so
            the extra compute is noise."""
            from sift_tpu.geometry.homography import (
                ransac_homography, decompose_homography)

            na = jnp.stack([(pa[:, 0] - cx) / fx, (pa[:, 1] - cy) / fy], -1)
            nb = jnp.stack([(pb[:, 0] - cx) / fx, (pb[:, 1] - cy) / fy], -1)

            def recon(R, t, inliers):
                """Triangulate and health-check one candidate motion."""
                P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
                P2 = jnp.concatenate([R, t[:, None]], 1)
                X = triangulate_dlt(P1, P2, na, nb)   # world = camera A
                za = X[:, 2]
                zb = (X @ R.T + t)[:, 2]
                good = inliers & (za > 1e-3) & (zb > 1e-3)
                # Reprojection sanity in pixels (view A).
                ra = (X[:, :2] / jnp.maximum(za[:, None], 1e-6) - na)
                err_px = jnp.linalg.norm(ra, axis=-1) * focal
                good &= err_px < cfg.max_reproj_error_px
                return X, good

            def attempt(k):
                ke, kh = jax.random.split(k)
                Re, te, est_e = estimate_relative_pose(
                    ke, na, nb, valid, cfg.ransac, focal=focal)
                cfg_h = cfg.ransac.replace(
                    inlier_threshold=cfg.ransac.inlier_threshold / focal)
                est_h = ransac_homography(kh, na, nb, valid, cfg_h)
                Rh, th, _, _ = decompose_homography(
                    est_h.model, na, nb, est_h.inliers.astype(jnp.float32))

                # Model selection by TRIANGULATION HEALTH, not raw epipolar
                # support (r5 knife-edge fix, tools/diag_bootstrap.py): at
                # ~2 px parallax the epipolar residual accepts nearly every
                # match for a garbage essential (measured: E "won" 30 vs 26
                # inliers while triangulating 0 healthy points in 4/4 key
                # draws; H triangulated 26-27 in every draw). Health is the
                # criterion the acceptance gate downstream applies — select
                # by it, with a mild E preference since H can only explain
                # one plane of a general scene.
                Xe, good_e = recon(Re, te, est_e.inliers)
                Xh, good_h = recon(Rh, th, est_h.inliers)
                ng_e = jnp.sum(good_e & est_e.success)
                ng_h = jnp.sum(good_h & est_h.success)
                use_h = ng_h.astype(jnp.float32) > \
                    1.1 * ng_e.astype(jnp.float32)

                R = jnp.where(use_h, Rh, Re)
                t = jnp.where(use_h, th, te)
                X = jnp.where(use_h, Xh, Xe)
                good = jnp.where(use_h, good_h, good_e)
                n_inl = jnp.where(use_h, est_h.num_inliers,
                                  est_e.num_inliers)
                success = jnp.where(use_h, est_h.success, est_e.success)
                return R, t, X, good, n_inl, success, use_h

            keys = jax.random.split(key, cfg.boot_attempts)
            outs = jax.vmap(attempt)(keys)
            score = jnp.where(outs[5], outs[3].sum(axis=-1), -1)
            best = jnp.argmax(score)
            return jax.tree.map(lambda a: a[best], outs)

        @jax.jit
        def _localize(key, pose_init, lms, uv, valid):
            return pose_ransac_refine(key, pose_init, K, lms, uv, valid,
                                      delta=cfg.ransac.inlier_threshold)

        @jax.jit
        def _loop_probe(key, new_pose, desc_bank, desc_q, packed, lm_table):
            """All loop-closure candidates probed in ONE dispatch.

            Sequential probing paid ~2 dispatches + several reads/uploads
            *per candidate* (match pytree read, localize upload+read) — on
            remote backends that is hundreds of ms of pure RTT per
            promotion; the fused probe pays 2 uploads + 1 packed read
            regardless of the candidate count.

            `packed` (host f32, one upload): [kp_lm_bank K*N | valid_bank
            K*N | uv_q 2N | valid_q N | cand_ok K]. Landmark/keypoint ids
            travel as f32 (exact below 2^24 — far above the id ranges
            here). `lm_table` (Lpad, 3) is the landmark table padded to a
            coarse multiple so a growing map hits a handful of compiled
            shapes. Returns (K, 9 + 3*Mcap): [pose 6 | n_has | n_inl |
            rmse | idx_b | lm_of | inlier] per candidate.
            """
            Kc, N = desc_bank.shape[0], desc_bank.shape[1]
            off = 0
            kp_lm = packed[off:off + Kc * N].reshape(
                Kc, N).astype(jnp.int32)
            off += Kc * N
            valid_bank = packed[off:off + Kc * N].reshape(Kc, N) > 0.5
            off += Kc * N
            uv_q = packed[off:off + 2 * N].reshape(N, 2)
            off += 2 * N
            valid_q = packed[off:off + N] > 0.5
            off += N
            cand_ok = packed[off:off + Kc] > 0.5
            keys = jax.random.split(key, Kc)
            Lpad = lm_table.shape[0]

            def one(k_key, desc_k, valid_k, kp_lm_k, ok_k):
                m = match_descriptors(desc_k, valid_k, desc_q, valid_q,
                                      cfg.match)
                lm_of = kp_lm_k[m.idx_a]
                has = m.valid & (lm_of >= 0) & ok_k
                lms = lm_table[jnp.clip(lm_of, 0, Lpad - 1)]
                uv = uv_q[m.idx_b]
                pose, inl, rmse = pose_ransac_refine(
                    k_key, new_pose, K, lms, uv, has,
                    delta=cfg.ransac.inlier_threshold)
                inl = inl & has
                f32 = jnp.float32
                return jnp.concatenate([
                    pose,
                    jnp.sum(has).astype(f32)[None],
                    jnp.sum(inl).astype(f32)[None],
                    rmse.astype(f32)[None],
                    m.idx_b.astype(f32), lm_of.astype(f32),
                    inl.astype(f32)])

            return jax.vmap(one)(keys, desc_bank, valid_bank, kp_lm,
                                 cand_ok)

        @jax.jit
        def _triangulate(pose_a, pose_b, pa, pb):
            """Fixed-capacity triangulation; returns PACKED (N, 4) [X|good]
            so the host pays one read, and callers pad (pa, pb) to a static
            capacity — variable-length inputs would recompile every
            promotion. (Shared math in `_tri_pair`, which the fused
            promotion dispatch also uses; late-bound closure.)"""
            return _tri_pair(pose_a, pose_b, pa, pb)

        ba_cfg = cfg.ba
        if cfg.ba_tracking_iterations > 0:
            ba_cfg_track = ba_cfg.replace(
                max_iterations=cfg.ba_tracking_iterations,
                cg_iterations=cfg.ba_tracking_cg)
        else:
            ba_cfg_track = ba_cfg

        def _pack_ba(st):
            # one packed buffer per BA: poses | landmarks | rmse | iters
            f32 = jnp.float32
            return jnp.concatenate([
                st.poses.reshape(-1), st.landmarks.reshape(-1),
                st.rmse[None].astype(f32),
                st.iterations[None].astype(f32)])

        @functools.partial(jax.jit, static_argnums=())
        def _window_ba(poses, lms, oc, ol, ouv, ov, fixed):
            return _pack_ba(
                run_ba(poses, K, lms, oc, ol, ouv, ov, ba_cfg, fixed))

        @functools.partial(jax.jit, static_argnums=())
        def _window_ba_track(poses, lms, oc, ol, ouv, ov, fixed):
            return _pack_ba(
                run_ba(poses, K, lms, oc, ol, ouv, ov, ba_cfg_track, fixed))

        self._jit_extract = _extract
        self._jit_match = _match
        self._jit_bootstrap = _bootstrap
        self._jit_localize = _localize
        self._jit_loop_probe = _loop_probe
        self._jit_triangulate = _triangulate
        self._jit_window_ba = _window_ba
        self._jit_window_ba_track = _window_ba_track
        # In-flight async window-BA solves, oldest first. A small QUEUE
        # (not a single slot): a multi-promotion chunk dispatches two
        # solves back-to-back, and blocking the second promotion on the
        # first's result costs a full device-queue drain (~90 ms measured,
        # r3). Between dispatch and apply the landmark array only ever
        # APPENDS, so each solve's landmark indices stay valid; mutating
        # operations (PGO, compaction, save/load, global BA) flush first.
        self._pending_ba = []  # [(packed handle, window kfs, uniq, L, O, seq)]
        self._ba_kickoff = None   # deferred _run_window_ba args (chunk path)
        self._chunk_seq = 0       # chunk counter: ages pending BA entries
        # Benchmark introspection: when set to a dict, the steady-state
        # dispatch sites stash (jitted_fn, args) of their LAST call under
        # "chunk" / "ba" so benchmarks can re-time the REAL programs at
        # the REAL shapes with chained_time (RTT/link-weather-proof
        # device floor; see benchmarks/slam_bench.py::bench_device_floor).
        self._capture = None

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _frame_to_device(self, gray) -> jnp.ndarray:
        """Upload one frame, in uint8 when possible (4x fewer link bytes;
        the built-in extractor casts to f32 on device). Injected frontends
        keep the f32 contract."""
        gray = np.asarray(gray)
        if gray.dtype == np.uint8 and self.frontend is None:
            return jnp.asarray(gray)
        return jnp.asarray(gray, jnp.float32)

    # ----------------------------------------------------------------- api
    def process_frame(self, gray: np.ndarray,
                      depth: Optional[np.ndarray] = None,
                      right: Optional[np.ndarray] = None) -> Dict:
        """Feed one grayscale frame ((H, W) float32 [0,255]); returns a dict
        with `pose` (6,), `tracked` (bool), `is_keyframe` (bool).

        `depth` (optional): metric depth that resolves the monocular scale
        gauge — either an (H, W) map (RGB-D) or an (N,) per-keypoint array.
        `right` (optional): rectified right stereo frame; requires
        `stereo_baseline` at construction — per-keypoint depths come from
        MXU stereo matching (`matching/stereo.py`).
        """
        self._frame_idx += 1
        kp_dev = self._jit_extract(self._frame_to_device(gray))
        if right is not None:
            assert self.stereo_baseline is not None, \
                "pass stereo_baseline= to SfmPipeline for stereo input"
            kp_r = self._jit_extract(self._frame_to_device(right))
            depth = np.asarray(self._jit_stereo(kp_dev, kp_r))
        if self.state == "bootstrap":
            kp = _np_kp(kp_dev, self.cfg.sift.subpixel)
            if depth is not None:
                out = self._bootstrap_rgbd(kp, depth)
            else:
                out = self._bootstrap_step(kp)
        else:
            out = self._tracking_step(kp_dev, depth)
        out["frame_idx"] = self._frame_idx
        self.trajectory.append(out)
        if self.logger is not None:
            self.logger.log("frame", **{k: v for k, v in out.items()
                                        if not isinstance(v, np.ndarray)})
        return out

    def _depth_at(self, kp: Dict[str, np.ndarray], depth: np.ndarray,
                  slots: np.ndarray) -> np.ndarray:
        """Per-keypoint depth (0 where invalid/out of range): samples a 2-D
        map at the keypoint pixels, or indexes a 1-D per-keypoint array
        (the stereo path)."""
        if depth.ndim == 1:
            z = depth[slots]
        else:
            h, w = depth.shape
            u = np.clip(kp["u"][slots].astype(np.int64), 0, w - 1)
            v = np.clip(kp["v"][slots].astype(np.int64), 0, h - 1)
            z = depth[v, u]
        z = np.where(np.isfinite(z) & (z > self.cfg.depth_min)
                     & (z < self.cfg.depth_max), z, 0.0)
        return z

    def _backproject(self, kp, slots, z, pose) -> np.ndarray:
        """Keypoints + depth -> world points under `pose` (world-from-cam)."""
        fx, fy, cx, cy = self.K
        x = (kp["u"][slots] - cx) / fx * z
        y = (kp["v"][slots] - cy) / fy * z
        pts_c = np.stack([x, y, z], -1).astype(np.float32)
        R, t = _se3_exp_np(pose)
        return pts_c @ R.T + t

    def _bootstrap_rgbd(self, kp, depth: np.ndarray) -> Dict:
        """RGB-D bootstrap: landmarks from the first frame's depth map."""
        pose0 = np.zeros(6, np.float32)
        slots = np.nonzero(kp["valid"])[0]
        z = self._depth_at(kp, depth, slots)
        good = z > 0
        slots = slots[good]
        if slots.shape[0] < self.cfg.keyframe_min_inliers:
            return dict(pose=pose0, tracked=False, is_keyframe=False,
                        n_inliers=int(slots.shape[0]), state=self.state)
        self.landmarks = self._backproject(kp, slots, z[good], pose0)
        self.lm_ref_kf = np.zeros(slots.shape[0], np.int64)
        kf = Keyframe(self._frame_idx, pose0, kp)
        kf.kp_lm[slots] = np.arange(slots.shape[0])
        self.keyframes.append(kf)
        self._index_keyframe(len(self.keyframes) - 1, kf)
        self.state = "tracking"
        self._frames_since_kf = 0
        if self.logger is not None:
            self.logger.log("bootstrap_rgbd", n_landmarks=len(self.landmarks))
        return dict(pose=pose0, tracked=True, is_keyframe=True,
                    n_inliers=int(slots.shape[0]), state="tracking")

    def process_sequence(self, frames, depths=None, rights=None,
                         batch: int = 8):
        """Process a frame sequence with batched extraction.

        Per-frame `process_frame` dispatches one image at a time; on TPU
        the extractor is massively underutilized that way. This path runs
        the frontend over `batch`-frame chunks (one vmapped program, one
        dispatch) and feeds the host-side tracking logic from the
        precomputed keypoint buffers. Same results, much higher device
        utilization.

        frames: list/sequence of (H, W) arrays (equal shapes).
        depths: optional matching sequence of depth maps.
        rights: optional matching sequence of rectified right stereo
            frames (requires `stereo_baseline`); right extraction and
            per-keypoint stereo depth run batched — 2 extract + 1 stereo
            dispatch and ONE depth read per chunk instead of 3 dispatches
            + a read per frame.
        Returns the list of per-frame result dicts.
        """
        assert self.frontend is None, \
            "process_sequence uses the built-in extractor"
        assert rights is None or depths is None, "rights XOR depths"
        assert rights is None or self.stereo_baseline is not None, \
            "pass stereo_baseline= to SfmPipeline for stereo input"
        assert rights is None or all(r is not None for r in rights), \
            "stereo batching needs every right frame; route sequences " \
            "with missing right images through per-frame process_frame"
        cfg = self.cfg
        # Stage-level jit (NOT defined here): a fresh jit wrapper per call
        # would re-trace/compile on every process_sequence invocation.
        _extract_batch = self._jit_extract_batch

        def upload(start):
            """Async host->device upload of one padded chunk.

            uint8 frames ship as uint8 (4x fewer tunnel bytes than f32 —
            the single largest term of the measured chunk budget; the
            device casts inside the extract program). Other dtypes ship
            as f32 bit-faithfully.
            """
            chunk = [np.asarray(f) for f in frames[start:start + batch]]
            if not all(f.dtype == np.uint8 for f in chunk):
                chunk = [f.astype(np.float32, copy=False) for f in chunk]
            pad = batch - len(chunk)
            imgs = np.stack(chunk + [chunk[-1]] * pad)
            if rights is not None:
                rchunk = [np.asarray(f) for f in rights[start:start + batch]]
                if not all(f.dtype == np.uint8 for f in rchunk):
                    rchunk = [f.astype(np.float32, copy=False)
                              for f in rchunk]
                rimgs = np.stack(rchunk + [rchunk[-1]] * pad)
                return (jnp.asarray(imgs), jnp.asarray(rimgs)), len(chunk)
            return jnp.asarray(imgs), len(chunk)

        results = []
        n = len(frames)
        # Uploads run on a single worker thread: the ~22 ms/chunk of
        # host-blocking transfer prep (np.stack + device_put of a 16xVGA
        # uint8 chunk) comes OFF the host critical path, which is what the
        # chunk cycle is balanced against (device work overlaps the host
        # decode window — see _process_chunk_tracked).
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=1)
        try:
            nxt_fut = pool.submit(upload, 0) if n else None
            kp_next = None          # extract dispatched one chunk ahead
            for start in range(0, n, batch):
                ph = getattr(self, "_phase_log", None)
                tu = time.perf_counter() if ph is not None else 0.0
                nxt = nxt_fut.result()
                if ph is not None:
                    ph.setdefault("upload_wait", []).append(
                        time.perf_counter() - tu)
                imgs_dev, n_chunk = nxt
                stereo_z = None
                if rights is not None:
                    # Stereo chunk: both sides extracted batched, per-
                    # keypoint depths for the whole chunk in one dispatch
                    # + ONE read.
                    kp_batch = _extract_batch(imgs_dev[0])
                    kp_r_batch = _extract_batch(imgs_dev[1])
                    stereo_z = np.asarray(
                        self._jit_stereo_batch(kp_batch, kp_r_batch))
                else:
                    kp_batch = kp_next if kp_next is not None \
                        else _extract_batch(imgs_dev)
                kp_next = None
                nxt_fut = None

                def _submit_upload():
                    # Prefetch the next chunk's transfer — submitted AFTER
                    # this chunk's track dispatch (pre_read hook below),
                    # never before it: upload bytes queue ahead of later
                    # dispatch COMMANDS on the tunnel's host->device
                    # stream (measured r3: a dispatch issued behind an
                    # 18 MB upload waited the full ~190 ms transfer), so a
                    # pre-dispatch upload adds its entire transfer time to
                    # the chunk read under congested link weather
                    # (20-210 MB/s same-day swings). Idempotent.
                    nonlocal nxt_fut
                    if nxt_fut is None and start + batch < n:
                        nxt_fut = pool.submit(upload, start + batch)

                def _extract_ahead(fut=None):
                    # Dispatch the NEXT chunk's extraction behind this
                    # chunk's device work (idempotent — safe to call from
                    # several fall-through paths). Called post-read by the
                    # chunked tracker so the dispatch overlaps the host
                    # decode window instead of the read.
                    nonlocal kp_next
                    _submit_upload()
                    f = fut if fut is not None else nxt_fut
                    if cfg.extract_ahead and rights is None \
                            and kp_next is None and f is not None:
                        kp_next = _extract_batch(f.result()[0])

                if cfg.chunked_tracking and depths is None \
                        and rights is None and self.state == "tracking" \
                        and cfg.use_local_map:
                    handled = self._process_chunk_tracked(
                        kp_batch, n_chunk, results,
                        after_dispatch=_extract_ahead,
                        pre_read=_submit_upload)
                    _submit_upload()    # bail-out paths skip the hooks
                    if handled:
                        continue    # whole chunk handled in one dispatch

                _submit_upload()
                _extract_ahead()
                for bi in range(n_chunk):
                    kp_i = jax.tree.map(lambda a: a[bi], kp_batch)
                    self._frame_idx += 1
                    depth = (depths[start + bi]
                             if depths is not None else None)
                    if stereo_z is not None:
                        depth = stereo_z[bi]      # (N,) per-keypoint depths
                    if self.state == "bootstrap":
                        kp = _np_kp(kp_i, cfg.sift.subpixel)
                        out = (self._bootstrap_rgbd(kp, depth)
                               if depth is not None
                               else self._bootstrap_step(kp))
                    else:
                        out = self._tracking_step(kp_i, depth)
                    out["frame_idx"] = self._frame_idx
                    self.trajectory.append(out)
                    results.append(out)
                    if self.logger is not None:
                        self.logger.log("frame", **{
                            k: v for k, v in out.items()
                            if not isinstance(v, np.ndarray)})
        finally:
            pool.shutdown(wait=True)
        self.finalize()
        return results

    def _process_chunk_tracked(self, kp_batch: Keypoints, n_frames: int,
                               results: List[Dict],
                               after_dispatch=None,
                               pre_read=None) -> bool:
        """Device-resident tracking of one extraction chunk
        (PipelineConfig.chunked_tracking): one fused dispatch + one packed
        read covers every frame AND the (at most one) keyframe promotion —
        the promotion frame is selected on device with the host's exact
        policy and its guided keyframe match / localization / candidate
        triangulation ride the same program, so a promotion adds no
        dispatches or reads beyond the window-BA kickoff. Returns False
        (nothing recorded) to fall back to the per-frame path — e.g. no
        local map yet or a frame lost tracking mid-chunk."""
        cfg = self.cfg
        local = self._build_local_map()
        if local is None:
            return False
        desc_ref, valid_ref, lm_ids = local
        lms_ref = self.landmarks[np.clip(lm_ids, 0,
                                         max(self.landmarks.shape[0] - 1, 0))]

        # Constant-velocity seed from the trajectory (host math).
        tracked_recs = [r for r in self.trajectory if r.get("tracked")]
        pose0 = (np.asarray(tracked_recs[-1]["pose"], np.float32)
                 if tracked_recs else self.keyframes[-1].pose)
        if len(tracked_recs) >= 2:
            vel0 = self._rel_pose(
                np.asarray(tracked_recs[-2]["pose"], np.float32), pose0)
        else:
            vel0 = np.zeros(6, np.float32)

        # Last-keyframe buffers for the speculative promotion payload
        # (descriptors are already device-resident; the rest is a few KB).
        ref_kf = self.keyframes[-1]
        has = ref_kf.kp_lm >= 0
        if not (cfg.guided_radius > 0 and has.any()):
            return False       # fused path needs a guided-matchable ref KF
        lms_a = self.landmarks[np.clip(ref_kf.kp_lm, 0,
                                       self.landmarks.shape[0] - 1)]
        uv_a = np.stack([ref_kf.kp["u"], ref_kf.kp["v"]],
                        -1).astype(np.float32)

        B = int(kp_batch.x.shape[0])
        N = int(kp_batch.x.shape[1])
        M = cfg.match.max_matches
        P = max(1, B // 8)                           # fused promotion slots
        ph = getattr(self, "_phase_log", None)       # benchmark introspection
        t0 = time.perf_counter() if ph is not None else 0.0
        chunk_args = (
            self._next_key(), jnp.asarray(pose0), jnp.asarray(vel0),
            jnp.int32(self._frames_since_kf), jnp.int32(n_frames),
            desc_ref, jnp.asarray(valid_ref),
            jnp.asarray(lms_ref.astype(np.float32)), kp_batch,
            jnp.asarray(ref_kf.pose), ref_kf.kp["desc"],
            jnp.asarray(ref_kf.kp["valid"]),
            jnp.asarray(lms_a.astype(np.float32)), jnp.asarray(has),
            jnp.asarray(uv_a))
        if self._capture is not None:
            self._capture["chunk"] = (self._jit_track_chunk_promo,
                                      chunk_args)
        res = self._jit_track_chunk_promo(*chunk_args)
        packed_dev, desc_valid_p = res[0], res[1:]
        # A BA deferred by the previous chunk's promotion dispatches NOW —
        # behind this chunk's track program — so the blocking read below
        # never waits on a solve.
        self._kickoff_ba()
        if pre_read is not None:
            # Next chunk's host->device upload starts HERE — after every
            # dispatch of this chunk is on the wire (see _submit_upload in
            # process_sequence for the measured ordering hazard), so the
            # transfer overlaps this chunk's device work instead of
            # delaying its dispatch commands.
            pre_read()
        if ph is not None:
            t1 = time.perf_counter()
            ph.setdefault("chunk_dispatch", []).append(t1 - t0)
        arr = np.asarray(packed_dev)                 # the chunk's ONE read
        if ph is not None:
            ph.setdefault("chunk_read", []).append(time.perf_counter() - t1)
        if after_dispatch is not None:
            # Next chunk's extraction dispatches AFTER the read: the read
            # waits on everything submitted before it (measured r3 — the
            # pre-read ahead-extract added its full device time to every
            # chunk's read), while a post-read dispatch executes during
            # the ~40 ms host decode/promotion window below, overlapping
            # device work with host work instead of with the read.
            after_dispatch()
        per_frame = arr[:B * 8].reshape(B, 8)[:n_frames]
        n_inls = per_frame[:, 6].astype(np.int32)
        min_inl = cfg.keyframe_min_inliers // 2
        if not (n_inls >= min_inl).all():
            return False            # lost frame: per-frame path handles it
        promote_ats = arr[B * 8:B * 8 + P].astype(np.int32)
        pay0 = B * 8 + P
        meta0 = pay0 + P * (8 * M + 8)
        self.chunk_stats["chunks"] += 1
        self._chunk_seq += 1       # ages pending BA entries (see _flush_ba)
        if cfg.track_saturation:
            # Extraction capacity audit (opt-in: one extra device->host
            # read per chunk — ~30 ms on tunneled backends, so never on
            # by default). Nonzero means fixed-capacity keypoint buffers
            # silently truncated the detection set.
            self.chunk_stats["extract_dropped"] = (
                self.chunk_stats.get("extract_dropped", 0)
                + int(np.asarray(kp_batch.n_dropped).sum()))
            if kp_batch.n_cand_pruned is not None:
                # Informational: strongest-N pre-refinement pruning (see
                # types.Keypoints) — not silent loss, so not asserted on.
                self.chunk_stats["extract_cand_pruned"] = (
                    self.chunk_stats.get("extract_cand_pruned", 0)
                    + int(np.asarray(kp_batch.n_cand_pruned).sum()))

        promote_of = {int(pa): pi for pi, pa in enumerate(promote_ats)
                      if pa >= 0}
        for bi in range(n_frames):
            self._frame_idx += 1
            out = dict(pose=per_frame[bi, :6].astype(np.float32),
                       tracked=True, is_keyframe=False,
                       n_inliers=int(n_inls[bi]),
                       rmse=float(per_frame[bi, 7]), state=self.state,
                       frame_idx=self._frame_idx)
            if bi in promote_of:
                pi = promote_of[bi]
                payload = arr[pay0 + pi * (8 * M + 8):
                              pay0 + (pi + 1) * (8 * M + 8)]
                meta = arr[meta0 + pi * 4 * N:
                           meta0 + (pi + 1) * 4 * N].reshape(4, N)
                kp = self._kp_from_meta(meta, desc_valid_p[2 * pi])
                # Promo slot > 0 was matched against the PREVIOUS promoted
                # frame (now the last keyframe) — exactly `ref_kf` when
                # pi == 0, keyframes[-1] afterwards.
                ref_i = ref_kf if pi == 0 else self.keyframes[-1]
                pose, inliers, sel, m, lm_of_match, tri = \
                    self._decode_kf_payload(payload, ref_i)
                # If another fused promotion follows in THIS chunk, its
                # window BA re-optimizes this keyframe moments later —
                # skip the redundant intermediate solve.
                later = any(pa > bi for pa in promote_ats if pa >= 0)
                self._promote_keyframe(kp, pose, m, inliers, sel,
                                       lm_of_match, tri=tri, ref_kf=ref_i,
                                       defer_ba=cfg.ba_defer_kickoff,
                                       ba_seq=self._chunk_seq,
                                       skip_ba=later)
                self.chunk_stats["fused_promotions"] += 1
                self._frames_since_kf = 0
                out["pose"] = self.keyframes[-1].pose
                out["is_keyframe"] = True
            else:
                self._frames_since_kf += 1
            self.trajectory.append(out)
            results.append(out)
            if self.logger is not None:
                self.logger.log("frame", **{k: v for k, v in out.items()
                                            if not isinstance(v, np.ndarray)})
        self._frames_lost = 0
        return True

    def _kp_from_meta(self, meta: np.ndarray, desc_dev) -> Dict:
        """Host keypoint dict from the packed (4, N) [x, y, octave, valid]
        metadata block (same mapping as `_np_kp`; descriptors stay on
        device)."""
        octave = meta[2].astype(np.int32)
        d = dict(x=meta[0], y=meta[1], valid=meta[3] > 0.5, octave=octave,
                 desc=desc_dev)
        factor = np.exp2(octave.astype(np.float64))
        if self.cfg.sift.subpixel:
            factor = factor / 2.0
        d["u"] = (d["x"] * factor).astype(np.float64)
        d["v"] = (d["y"] * factor).astype(np.float64)
        return d

    def _decode_kf_payload(self, packed: np.ndarray, ref_kf: Keyframe):
        """Decode a `_kf_track_body` buffer (host side of
        `_match_and_localize`, shared with the fused chunk dispatch)."""
        M = self.cfg.match.max_matches
        ia = packed[0:M].astype(np.int32)
        ib = packed[M:2 * M].astype(np.int32)
        valid = packed[2 * M:3 * M] > 0.5
        inl_slot = packed[3 * M:4 * M] > 0.5
        tri = packed[4 * M:8 * M].reshape(M, 4)
        pose = packed[8 * M:8 * M + 6].astype(np.float32)
        # HOST arrays on purpose: every consumer of this Matches is host
        # code (promotion bookkeeping); wrapping in jnp here cost three
        # device reads (~90 ms over the tunnel) to get the values back.
        m = Matches(idx_a=ia, idx_b=ib,
                    distance=np.zeros((M,), np.float32), valid=valid)
        lm_of_match = ref_kf.kp_lm[ia]
        has_lm = valid & (lm_of_match >= 0)
        sel = np.nonzero(has_lm)[0]
        inliers = np.zeros((M,), bool)
        inliers[:sel.shape[0]] = inl_slot[sel]
        return pose, inliers, sel, m, lm_of_match, tri

    # ------------------------------------------------------ save / resume
    def save_map(self, path: str) -> None:
        """Serialize the full SLAM state (keyframes, landmarks, pose graph)
        to one .npz — the checkpoint/resume path for resumable incremental
        SfM (SURVEY.md §5)."""
        self._flush_ba()
        arrays = dict(
            landmarks=self.landmarks,
            lm_ref_kf=self.lm_ref_kf,
            intrinsics=self.K,
            prng_key=np.asarray(self._key),
            meta=np.asarray([self._frame_idx, self._frames_since_kf,
                             self._frames_lost, self.num_loop_closures,
                             1 if self.state == "tracking" else 0]),
            n_keyframes=np.asarray(len(self.keyframes)),
            edges_i=np.asarray([e["i"] for e in self.pose_edges], np.int32),
            edges_j=np.asarray([e["j"] for e in self.pose_edges], np.int32),
            edges_z=(np.stack([e["z"] for e in self.pose_edges])
                     if self.pose_edges else np.zeros((0, 6), np.float32)),
            edges_w=np.asarray([e["w"] for e in self.pose_edges], np.float32),
            edges_loop=np.asarray(
                [e.get("kind") == "loop" for e in self.pose_edges], bool),
            edges_sigma=np.asarray(
                [e.get("sigma", 0.0) for e in self.pose_edges], np.float32),
        )
        for i, kf in enumerate(self.keyframes):
            arrays[f"kf{i}_pose"] = kf.pose
            arrays[f"kf{i}_frame"] = np.asarray(kf.frame_idx)
            arrays[f"kf{i}_lm"] = kf.kp_lm
            for field in ("x", "y", "valid", "desc", "octave", "u", "v"):
                arrays[f"kf{i}_{field}"] = kf.kp[field]
        np.savez_compressed(path, **arrays)

    def load_map(self, path: str) -> None:
        """Restore state saved by `save_map` (config must match)."""
        z = np.load(path, allow_pickle=False)
        self.landmarks = z["landmarks"]
        self.lm_ref_kf = z["lm_ref_kf"]
        self._key = jnp.asarray(z["prng_key"])
        meta = z["meta"]
        self._frame_idx = int(meta[0])
        self._frames_since_kf = int(meta[1])
        self._frames_lost = int(meta[2])
        self.num_loop_closures = int(meta[3])
        self.state = "tracking" if meta[4] else "bootstrap"
        self.keyframes = []
        for i in range(int(z["n_keyframes"])):
            kp = {f: z[f"kf{i}_{f}"]
                  for f in ("x", "y", "valid", "desc", "octave", "u", "v")}
            # Descriptors live on device (matching consumes them there).
            kp["desc"] = jnp.asarray(kp["desc"])
            kf = Keyframe(int(z[f"kf{i}_frame"]), z[f"kf{i}_pose"], kp)
            kf.kp_lm = z[f"kf{i}_lm"]
            self.keyframes.append(kf)
        self._map_version += 1
        self._local_map_cache = None
        # Deferred BA results from the PRE-load map must never be applied
        # to the loaded one (their landmark indices belong to the old map).
        self._pending_ba = []
        self._ba_kickoff = None
        self._global_index = None
        for i, kf in enumerate(self.keyframes):
            self._index_keyframe(i, kf)
        sig = z["edges_sigma"] if "edges_sigma" in z.files else \
            np.zeros(z["edges_i"].shape[0], np.float32)
        self.pose_edges = [
            dict(i=int(z["edges_i"][k]), j=int(z["edges_j"][k]),
                 z=z["edges_z"][k], w=float(z["edges_w"][k]),
                 kind="loop" if z["edges_loop"][k] else "odom",
                 sigma=float(sig[k]))
            for k in range(z["edges_i"].shape[0])]

    def positions(self) -> np.ndarray:
        """Trajectory camera centers (F, 3) for evaluation."""
        out = []
        for rec in self.trajectory:
            _, t = _se3_exp_np(rec["pose"])
            out.append(t)
        return np.stack(out) if out else np.zeros((0, 3), np.float32)

    def poses_Rt(self):
        """Full trajectory poses: (F, 3, 3) rotations + (F, 3) centers,
        camera-to-world (the TUM trajectory convention; feed to
        io.trajectory.save_tum for evo-compatible export)."""
        Rs, ts = [], []
        for rec in self.trajectory:
            R, t = _se3_exp_np(rec["pose"])
            Rs.append(R)
            ts.append(t)
        if not Rs:
            return np.zeros((0, 3, 3), np.float32), np.zeros((0, 3),
                                                             np.float32)
        return np.stack(Rs), np.stack(ts)

    # ----------------------------------------------------------- bootstrap
    def _bootstrap_step(self, kp) -> Dict:
        pose0 = np.zeros(6, np.float32)
        if not self.keyframes:
            kf0 = Keyframe(self._frame_idx, pose0, kp)
            self.keyframes.append(kf0)
            self._index_keyframe(0, kf0)
            return dict(pose=pose0, tracked=True, is_keyframe=True,
                        n_inliers=0, state=self.state)

        kf0 = self.keyframes[0]
        m = self._jit_match(jnp.asarray(kf0.kp["desc"]),
                            jnp.asarray(kf0.kp["valid"]),
                            jnp.asarray(kp["desc"]),
                            jnp.asarray(kp["valid"]))
        valid = np.asarray(m.valid)
        ia, ib = np.asarray(m.idx_a), np.asarray(m.idx_b)
        n_matches = int(valid.sum())
        if n_matches < self.cfg.min_bootstrap_matches:
            # Too little overlap: restart from this frame.
            if self._frame_idx - kf0.frame_idx > self.cfg.kf_max_interval:
                self.keyframes = [Keyframe(self._frame_idx, pose0, kp)]
                self._index_keyframe(0, self.keyframes[0])
            return dict(pose=pose0, tracked=False, is_keyframe=False,
                        n_inliers=n_matches, state=self.state)

        pa = np.stack([kf0.kp["u"][ia], kf0.kp["v"][ia]], -1)
        pb = np.stack([kp["u"][ib], kp["v"][ib]], -1)
        flow = np.linalg.norm(pa - pb, axis=-1)
        if np.median(flow[valid]) < self.cfg.min_bootstrap_parallax:
            return dict(pose=pose0, tracked=True, is_keyframe=False,
                        n_inliers=n_matches, state=self.state)

        R, t, X, good, n_inl, success, use_h = self._jit_bootstrap(
            self._next_key(), jnp.asarray(pa, jnp.float32),
            jnp.asarray(pb, jnp.float32), jnp.asarray(valid))
        R, t, X, good = np.asarray(R), np.asarray(t), np.asarray(X), \
            np.asarray(good)
        # Acceptance gate: beyond RANSAC success, the *map* must be healthy —
        # most epipolar inliers must triangulate in front of both cameras
        # with low reprojection error. Near-degenerate (planar-ish) data can
        # hand RANSAC a wrong-basin essential whose mirror map dies on the
        # next frame; rejecting here just retries the bootstrap later.
        n_good = int(good.sum())
        if not bool(success) or n_good < max(
                self.cfg.min_bootstrap_matches // 2, int(0.5 * int(n_inl))):
            return dict(pose=pose0, tracked=False, is_keyframe=False,
                        n_inliers=int(n_inl), state=self.state)
        # A homography-selected bootstrap needs EXTRA parallax (r5
        # knife-edge fix): at ~gate-level flow H ~ I and the Faugeras
        # decomposition is numerically meaningless — yet its inliers and
        # triangulation health look fine, because low parallax cannot
        # invalidate ANY motion model (points re-fit both views). Deferring
        # costs nothing: the pending frames' poses are backfilled below
        # once the bootstrap lands.
        if bool(use_h) and float(np.median(flow[valid])) < \
                self.cfg.h_parallax_factor * self.cfg.min_bootstrap_parallax:
            return dict(pose=pose0, tracked=True, is_keyframe=False,
                        n_inliers=int(n_inl), state=self.state)
        # World = first camera; second pose world-from-camera = (R^T, -R^T t).
        pose1 = _se3_log_np(R.T, -R.T @ t)

        # Create landmarks for good triangulations.
        sel = np.nonzero(good)[0]
        lm_ids = np.arange(sel.shape[0])
        self.landmarks = X[sel].astype(np.float32)
        self.lm_ref_kf = np.zeros(sel.shape[0], np.int64)
        kf1 = Keyframe(self._frame_idx, pose1, kp)
        kf0.kp_lm[ia[sel]] = lm_ids
        kf1.kp_lm[ib[sel]] = lm_ids
        self.keyframes.append(kf1)
        self._index_keyframe(1, kf1)
        self._add_odometry_edge(0, 1)

        # Two-frame BA (gauge: both cameras fixed would freeze scale+pose;
        # fix cam0 fully, keep cam1 free — scale gauge held by fixing it too
        # for only-two-frames stability).
        self._run_window_ba(fix_first_n=2)
        self.state = "tracking"
        self._frames_since_kf = 0
        # Backfill bootstrap-pending frames (r5): frames between kf0 and
        # here recorded placeholder identity poses while waiting for
        # parallax/health — interpolate them along the accepted two-view
        # motion (exact for constant-velocity segments, and strictly
        # better than identity for any motion). This removes the cliff
        # where one deferred frame poisons unmasked trajectory metrics.
        pose_new = self.keyframes[-1].pose
        r0, f1_ = kf0.frame_idx, self._frame_idx
        if f1_ - r0 > 1:
            rel = self._rel_pose(kf0.pose, pose_new)
            for rec in self.trajectory:
                fi = rec.get("frame_idx", -1)
                if r0 < fi < f1_:
                    frac = (fi - r0) / (f1_ - r0)
                    rec["pose"] = lie_np.boxplus(
                        kf0.pose, (frac * rel).astype(np.float32)
                    ).astype(np.float32)
                    rec["backfilled"] = True
        if self.logger is not None:
            self.logger.log("bootstrap", n_landmarks=len(self.landmarks),
                            n_inliers=int(n_inl))
        return dict(pose=self.keyframes[-1].pose, tracked=True,
                    is_keyframe=True, n_inliers=int(n_inl), state="tracking")

    # ------------------------------------------------------------ tracking
    def _match_and_localize(self, kp, ref_kf: Keyframe, init_pose,
                            guided: bool = False):
        """Match `kp` against a reference keyframe and localize on the 2D-3D
        correspondences. Returns (pose, inliers, rmse, m, sel, lm_of_match,
        n_inl). `guided`: restrict candidates near each reference landmark's
        projection under `init_pose` (tracking only — probes stay unguided).

        One fused device dispatch (projection -> match -> robust pose GN)
        returning one packed buffer; the host only gathers the reference
        landmark positions from its own bookkeeping."""
        n_ref = ref_kf.kp["x"].shape[0]
        has = ref_kf.kp_lm >= 0
        if self.landmarks.shape[0] > 0:
            lms_a = self.landmarks[np.clip(ref_kf.kp_lm, 0,
                                           self.landmarks.shape[0] - 1)]
        else:
            lms_a = np.zeros((n_ref, 3), np.float32)
            has = np.zeros((n_ref,), bool)
        use_guided = bool(guided and self.cfg.guided_radius > 0 and
                          has.any())
        uv_a = np.stack([ref_kf.kp["u"], ref_kf.kp["v"]],
                        -1).astype(np.float32)
        uv_b = np.stack([kp["u"], kp["v"]], -1).astype(np.float32)

        packed = np.asarray(self._jit_kf_track[use_guided](
            self._next_key(), jnp.asarray(init_pose),
            jnp.asarray(ref_kf.pose),
            jnp.asarray(ref_kf.kp["desc"]), jnp.asarray(ref_kf.kp["valid"]),
            jnp.asarray(lms_a.astype(np.float32)), jnp.asarray(has),
            jnp.asarray(uv_a),
            jnp.asarray(kp["desc"]), jnp.asarray(kp["valid"]),
            jnp.asarray(uv_b)))

        M = self.cfg.match.max_matches
        n_inl = int(packed[8 * M + 6])
        rmse = float(packed[8 * M + 7])
        pose, inliers, sel, m, lm_of_match, tri = \
            self._decode_kf_payload(packed, ref_kf)
        return pose, inliers, rmse, m, sel, lm_of_match, n_inl, tri

    def _index_keyframe(self, idx: int, kf: Keyframe) -> None:
        """Add a keyframe's descriptors to the global place-recognition
        index (lazy-built to the pose-graph node capacity)."""
        if not self.cfg.use_global_index:
            return
        if self._global_index is None:
            from sift_tpu.matching.global_index import GlobalDescriptorIndex
            self._global_index = GlobalDescriptorIndex(
                self.cfg.max_pose_graph_nodes, kf.kp["x"].shape[0])
        self._global_index.add(idx, kf.kp["desc"], kf.kp["valid"])

    def _candidate_keyframes(self, kp, k: int,
                             exclude_from: Optional[int] = None,
                             min_votes: int = 1) -> np.ndarray:
        """Loop/reloc candidate keyframe indices: descriptor-vote ranking
        from the global index when available, uniform probing otherwise.
        `min_votes` drops weak candidates BEFORE the (expensive) fused
        probe dispatch — a closure ultimately needs `loop_min_inliers`
        true 2D-3D matches, and the 0.85-cosine vote count upper-bounds
        them, so sub-threshold candidates can never be accepted anyway."""
        n = len(self.keyframes)
        if self._global_index is not None:
            cand = self._global_index.top_candidates(
                kp["desc"], kp["valid"], k, exclude_from=exclude_from,
                min_votes=min_votes)
            cand = cand[cand < n]
            return cand
        hi = (n if exclude_from is None else min(exclude_from, n)) - 1
        if hi < 0:
            return np.zeros((0,), int)
        # Uniform fallback, most recent first (the return order IS the
        # probing order; the vote-ranked path is already best-first).
        return np.unique(np.linspace(0, hi,
                                     min(k, hi + 1)).astype(int))[::-1]

    def _attempt_relocalization(self, kp):
        """Probe keyframes across the history for a confident re-fix.

        Candidates come from the global descriptor index (vote-ranked;
        falls back to uniform probing). Returns (ref_kf_index, pose, m,
        inliers, sel, lm_of_match, tri) or None.
        """
        cfg = self.cfg
        cand = [int(oi) for oi in
                self._candidate_keyframes(kp, cfg.reloc_candidates)]
        cand = cand[:cfg.reloc_candidates]
        if not cand:
            return None

        # ONE fused dispatch probes every candidate (see _reloc_probe);
        # decode below keeps the sequential best-candidate-first semantics.
        Kc = cfg.reloc_candidates
        N = kp["x"].shape[0]
        valid_bank = np.zeros((Kc, N), np.float32)
        lms_bank = np.zeros((Kc, N, 3), np.float32)
        has_bank = np.zeros((Kc, N), np.float32)
        uv_bank = np.zeros((Kc, N, 2), np.float32)
        poses = np.zeros((Kc, 6), np.float32)
        desc_list = []
        for s, oi in enumerate(cand):
            ref = self.keyframes[oi]
            has = ref.kp_lm >= 0
            if self.landmarks.shape[0] > 0:
                lms_bank[s] = self.landmarks[np.clip(
                    ref.kp_lm, 0, self.landmarks.shape[0] - 1)]
            else:
                has = np.zeros_like(has)
            valid_bank[s] = ref.kp["valid"].astype(np.float32)
            has_bank[s] = has.astype(np.float32)
            uv_bank[s, :, 0] = ref.kp["u"]
            uv_bank[s, :, 1] = ref.kp["v"]
            poses[s] = ref.pose
            desc_list.append(jnp.asarray(ref.kp["desc"]))
        while len(desc_list) < Kc:          # pad to the compiled shape
            desc_list.append(desc_list[0])
        desc_bank = _stack_jit(*desc_list)  # one jitted dispatch
        uv_q = np.stack([kp["u"], kp["v"]], -1).astype(np.float32)
        packed_in = np.concatenate([
            valid_bank.ravel(), lms_bank.ravel(), has_bank.ravel(),
            uv_bank.ravel(), poses.ravel(),
            kp["valid"].astype(np.float32), uv_q.ravel()])
        out = np.asarray(self._jit_reloc_probe(
            self._next_key(), desc_bank, jnp.asarray(kp["desc"]),
            jnp.asarray(packed_in)))

        M = cfg.match.max_matches
        for s, oi in enumerate(cand):       # best-candidate first
            row = out[s]
            n_inl = int(row[8 * M + 6])
            rmse = float(row[8 * M + 7])
            if n_inl >= cfg.keyframe_min_inliers and \
                    rmse <= 2.0 * cfg.loop_max_rmse:
                pose, inl, sel, m, lm_of, tri = \
                    self._decode_kf_payload(row, self.keyframes[oi])
                if self.logger is not None:
                    self.logger.log("relocalized", ref_kf=int(oi),
                                    inliers=n_inl, rmse=rmse)
                return int(oi), pose, m, inl, sel, lm_of, tri
        return None

    def _build_local_map(self):
        """Deduplicated (descriptor, landmark-id) union of the window's
        keyframe observations, recent-first, padded to the static
        `local_map_size`. Returns (desc (M, D) ON DEVICE, valid (M,),
        lm_ids (M,)).

        Descriptors never touch the host: per-keyframe device buffers are
        concatenated and the deduplicated rows selected with ONE device
        gather via a host-computed fixed-size index vector. The result is
        cached until the map version changes (promotion / fusion / load) —
        tracking frames between promotions reuse it for free.
        """
        cfg = self.cfg
        if self._local_map_cache is not None and \
                self._local_map_cache[0] == self._map_version:
            return self._local_map_cache[1]

        window = self.keyframes[-cfg.window_size:]
        ids, rows = [], []
        for wi, kf in enumerate(reversed(window)):   # recent wins dedup
            slots = np.nonzero(kf.kp_lm >= 0)[0]
            n = kf.kp["x"].shape[0]
            ids.append(kf.kp_lm[slots])
            rows.append(wi * n + slots)              # rows into the concat
        result = None
        if ids:
            ids = np.concatenate(ids)
            rows = np.concatenate(rows)
            if ids.shape[0] > 0:
                # first occurrence == most recent observation per landmark
                _, first = np.unique(ids, return_index=True)
                first = np.sort(first)[:cfg.local_map_size]
                M = cfg.local_map_size
                k = first.shape[0]
                sel_rows = np.zeros((M,), np.int32)
                sel_rows[:k] = rows[first]
                out_ids = np.zeros((M,), np.int64)
                out_ids[:k] = ids[first]
                out_valid = np.zeros((M,), bool)
                out_valid[:k] = True
                # Pad the concat to a FIXED window_size buffers (fillers
                # are never indexed by sel_rows) so the gather program
                # compiles once, not once per window length.
                bufs = [kf.kp["desc"] for kf in reversed(window)]
                while len(bufs) < cfg.window_size:
                    bufs.append(bufs[0])
                window_desc = jnp.concatenate(bufs, axis=0)
                out_desc = window_desc[jnp.asarray(sel_rows)]   # (M, D) dev
                result = (out_desc, out_valid, out_ids)
        self._local_map_cache = (self._map_version, result)
        return result

    def _localize_local_map(self, kp_dev: Keypoints, init_pose):
        """Guided association against the local map; returns
        (pose, n_inliers, rmse) or None when no local map exists.

        One fused device dispatch (projection -> guided match -> robust
        pose GN) and ONE packed (8,) read; the host only assembles the
        (cached) local-map buffers and gathers current landmark positions."""
        local = self._build_local_map()
        if local is None:
            return None
        desc_ref, valid_ref, lm_ids = local
        lms_ref = self.landmarks[np.clip(lm_ids, 0,
                                         max(self.landmarks.shape[0] - 1, 0))]
        packed = np.asarray(self._jit_track_local(
            self._next_key(), jnp.asarray(init_pose),
            desc_ref, jnp.asarray(valid_ref),
            jnp.asarray(lms_ref.astype(np.float32)), kp_dev))
        return packed[:6].astype(np.float32), int(packed[6]), float(packed[7])

    def _predicted_pose(self) -> np.ndarray:
        """Constant-velocity prediction: advance the last tracked pose by the
        last inter-frame motion — a much better GN seed than the reference
        keyframe's pose under fast motion."""
        tracked = [r for r in self.trajectory if r.get("tracked")]
        if len(tracked) < 2:
            return self.keyframes[-1].pose
        p2 = np.asarray(tracked[-1]["pose"], np.float32)
        p1 = np.asarray(tracked[-2]["pose"], np.float32)
        vel = self._rel_pose(p1, p2)
        return lie_np.boxplus(p2, vel).astype(np.float32)

    def _tracking_step(self, kp_dev: Keypoints,
                       depth: Optional[np.ndarray] = None) -> Dict:
        """`kp_dev` is the device Keypoints pytree. The host keypoint dict
        is materialized LAZILY — a frame that tracks against the cached
        local map and is not promoted never transfers keypoint buffers at
        all (one packed (8,) read is its entire device->host traffic)."""
        kp_cache: Dict = {}

        def kp():
            if "v" not in kp_cache:
                kp_cache["v"] = _np_kp(kp_dev, self.cfg.sift.subpixel)
            return kp_cache["v"]

        kf = self.keyframes[-1]
        pred = self._predicted_pose()
        kf_assoc = None          # lazy: only promotions need the kf match
        if self.cfg.use_local_map:
            hit = self._localize_local_map(kp_dev, pred)
        else:
            hit = None
        if hit is not None:
            pose, n_inl, rmse = hit
        else:
            pose, inliers, rmse, m, sel, lm_of_match, n_inl, tri = \
                self._match_and_localize(kp(), kf, pred, guided=True)
            kf_assoc = (m, inliers, sel, lm_of_match, tri)
        tracked = n_inl >= self.cfg.keyframe_min_inliers // 2
        self._frames_since_kf += 1

        if not tracked:
            self._frames_lost += 1
            if self._frames_lost >= self.cfg.reloc_after_lost:
                hit = self._attempt_relocalization(kp())
                if hit is not None:
                    oi, pose, m, inliers, sel, lm_of_match, tri = hit
                    n_inl = int(inliers.sum())
                    tracked = True
                    # Promote immediately against the reloc reference so
                    # subsequent frames track from a fresh keyframe.
                    self._promote_keyframe(kp(), pose, m, inliers, sel,
                                           lm_of_match, depth,
                                           ref_kf=self.keyframes[oi],
                                           tri=tri)
                    self._frames_since_kf = 0
                    self._frames_lost = 0
                    return dict(pose=self.keyframes[-1].pose, tracked=True,
                                is_keyframe=True, n_inliers=n_inl,
                                rmse=rmse, state=self.state)
        else:
            self._frames_lost = 0

        is_kf = tracked and (
            n_inl < self.cfg.kf_min_tracked or
            self._frames_since_kf >= self.cfg.kf_max_interval)
        if is_kf:
            if kf_assoc is None:
                # Local-map tracking: the promotion bookkeeping (carry-over
                # + 2D-2D triangulation) needs the keyframe-aligned match;
                # run it now, seeded by the local-map pose.
                pose, inliers, rmse, m, sel, lm_of_match, _, tri = \
                    self._match_and_localize(kp(), kf, pose, guided=True)
            else:
                m, inliers, sel, lm_of_match, tri = kf_assoc
            self._promote_keyframe(kp(), pose, m, inliers, sel, lm_of_match,
                                   depth, tri=tri)
            self._frames_since_kf = 0
            pose = self.keyframes[-1].pose
        return dict(pose=pose.astype(np.float32), tracked=tracked,
                    is_keyframe=is_kf, n_inliers=n_inl, rmse=float(rmse),
                    state=self.state)

    def _promote_keyframe(self, kp, pose, m, inliers, sel, lm_of_match,
                          depth: Optional[np.ndarray] = None,
                          ref_kf: Optional[Keyframe] = None,
                          tri: Optional[np.ndarray] = None,
                          defer_ba: bool = False,
                          ba_seq: Optional[int] = None,
                          skip_ba: bool = False):
        """`ref_kf`: the keyframe the match `m` was computed against
        (defaults to the last keyframe; relocalization passes its hit).
        `tri`: optional (M, 4) [X | good] per match slot from the fused
        match+localize+triangulate dispatch — when present the standalone
        triangulation dispatch (and its host read) is skipped.
        `defer_ba`: don't dispatch the window BA here — record a pending
        kickoff that the chunked tracker issues AFTER the next chunk's
        track+extract dispatches, so the solve rides behind the chunk's
        blocking read instead of serializing in front of it (the measured
        read wait is the device queue: BA + track; see BENCH.md r3).
        `ba_seq`: the dispatching chunk's sequence number (chunk path) —
        flushes only OLDER solves, so a multi-promotion chunk's second
        promotion never blocks on the first's in-flight BA; None (the
        per-frame path) drains fully, exactly the pre-queue behavior."""
        self._flush_ba(before_seq=ba_seq)
        kf_prev = ref_kf if ref_kf is not None else self.keyframes[-1]
        valid = np.asarray(m.valid)
        ia, ib = np.asarray(m.idx_a), np.asarray(m.idx_b)

        new_kf = Keyframe(self._frame_idx, pose, kp)
        # Carry over tracked landmark associations (inlier 2D-3D matches).
        inl_sel = sel[inliers[:sel.shape[0]]]
        new_kf.kp_lm[ib[inl_sel]] = lm_of_match[inl_sel]

        # Triangulate new landmarks from unassociated 2D-2D matches.
        no_lm = valid & (kf_prev.kp_lm[ia] < 0)
        nsel = np.nonzero(no_lm)[0]
        if nsel.shape[0] > 0:
            if tri is not None:
                # Fused path: X/good already computed per match slot
                # against the accepted pose in the same dispatch.
                X = tri[nsel, :3]
                good = tri[nsel, 3] > 0.5
            else:
                # Static capacity: pad to the match buffer size so the
                # program compiles once (padding rows triangulate garbage
                # but are dropped by the nsel-bounded mask below).
                cap = self.cfg.match.max_matches
                nsel = nsel[:cap]
                pa = np.zeros((cap, 2), np.float32)
                pb = np.zeros((cap, 2), np.float32)
                pa[:nsel.shape[0], 0] = kf_prev.kp["u"][ia[nsel]]
                pa[:nsel.shape[0], 1] = kf_prev.kp["v"][ia[nsel]]
                pb[:nsel.shape[0], 0] = kp["u"][ib[nsel]]
                pb[:nsel.shape[0], 1] = kp["v"][ib[nsel]]
                packed = np.asarray(self._jit_triangulate(
                    jnp.asarray(kf_prev.pose), jnp.asarray(pose),
                    jnp.asarray(pa), jnp.asarray(pb)))
                X = packed[:nsel.shape[0], :3]
                good = packed[:nsel.shape[0], 3] > 0.5
            gsel = np.nonzero(good)[0]
            if gsel.shape[0] > 0:
                base = self.landmarks.shape[0]
                new_ids = base + np.arange(gsel.shape[0])
                self.landmarks = np.concatenate(
                    [self.landmarks, X[gsel].astype(np.float32)])
                kf_prev.kp_lm[ia[nsel[gsel]]] = new_ids
                new_kf.kp_lm[ib[nsel[gsel]]] = new_ids

        if depth is not None:
            # RGB-D: any still-unassociated keypoint with valid depth spawns
            # a metric landmark (no parallax requirement).
            free = np.nonzero(kp["valid"] & (new_kf.kp_lm < 0))[0]
            z = self._depth_at(kp, depth, free)
            good = z > 0
            free = free[good]
            if free.shape[0] > 0:
                base = self.landmarks.shape[0]
                self.landmarks = np.concatenate(
                    [self.landmarks,
                     self._backproject(kp, free, z[good], pose)])
                new_kf.kp_lm[free] = base + np.arange(free.shape[0])

        new_idx = len(self.keyframes)
        self.keyframes.append(new_kf)
        # Landmarks created this promotion reference the new keyframe.
        created = self.landmarks.shape[0] - self.lm_ref_kf.shape[0]
        if created > 0:
            self.lm_ref_kf = np.concatenate(
                [self.lm_ref_kf, np.full(created, new_idx, np.int64)])
        self._map_version += 1         # invalidate the local-map cache
        self._index_keyframe(new_idx, new_kf)
        self._add_odometry_edge(new_idx - 1, new_idx)
        if self.cfg.enable_loop_closure:
            self._try_loop_closure(new_idx)
        if self.cfg.compact_interval_kf and \
                (new_idx + 1) % self.cfg.compact_interval_kf == 0:
            # Before the window-BA kickoff: nothing is pending here, so
            # the compaction's flush never blocks on an in-flight solve.
            self.compact_landmarks()
        if skip_ba:
            # A second promotion from the same chunk follows immediately
            # and its window covers this keyframe — one solve suffices.
            pass
        elif defer_ba:
            self._ba_kickoff = dict(fix_first_n=2)
        else:
            self._run_window_ba(fix_first_n=2)
        if self.logger is not None:
            self.logger.log("keyframe", frame=self._frame_idx,
                            n_keyframes=len(self.keyframes),
                            n_landmarks=len(self.landmarks))

    # ------------------------------------------------- pose graph / loops
    def _rel_pose(self, xi_i: np.ndarray, xi_j: np.ndarray) -> np.ndarray:
        """log(T_i^-1 T_j) as numpy (6,) — pure host math, no dispatch."""
        return lie_np.rel_pose(np.asarray(xi_i, np.float32),
                               np.asarray(xi_j, np.float32))

    def _add_odometry_edge(self, i: int, j: int, weight: float = 1.0):
        # z is refreshed from the *current* poses at every optimization —
        # window BA keeps improving relative poses after edge creation, and
        # optimizing against stale snapshots makes the graph fight the map
        # (cost blow-up). Only loop edges keep their measured constraint.
        self.pose_edges.append(dict(
            i=i, j=j, kind="odom",
            z=self._rel_pose(self.keyframes[i].pose, self.keyframes[j].pose),
            w=weight))

    def _try_loop_closure(self, new_idx: int):
        """Probe a few old keyframes for a 2D-3D re-localization; accepted
        closures add a high-weight pose-graph edge and trigger optimization.
        Candidates are vote-ranked by the global descriptor index
        (restricted to keyframes outside the covisible window), with
        uniform probing as the fallback."""
        cfg = self.cfg
        old_max = new_idx - cfg.window_size
        if old_max < 1 or self.landmarks.shape[0] == 0:
            return
        cand_idx = self._candidate_keyframes(
            self.keyframes[new_idx].kp, cfg.loop_candidates,
            exclude_from=old_max, min_votes=cfg.loop_min_inliers)
        new_kf = self.keyframes[new_idx]
        new_lms = new_kf.kp_lm[new_kf.kp_lm >= 0]
        # Covisibility gate (host bookkeeping, no dispatch): sharing
        # landmarks with the candidate means it's a tracked neighbour, not
        # a loop — re-closing against it just injects noisy redundant
        # constraints and churns the graph.
        cands: List[int] = []
        for oi in cand_idx:
            old_lms = self.keyframes[oi].kp_lm[self.keyframes[oi].kp_lm >= 0]
            if np.intersect1d(new_lms, old_lms).size > 10:
                continue
            cands.append(int(oi))
        cands = cands[:cfg.loop_candidates]
        if not cands:
            return

        # ONE fused dispatch probes every candidate (match -> 2D-3D gather
        # -> robust localize); decode order below preserves the sequential
        # best-candidate-first acceptance semantics.
        Kc = cfg.loop_candidates
        N = new_kf.kp["x"].shape[0]
        kp_lm_bank = np.zeros((Kc, N), np.float32)
        valid_bank = np.zeros((Kc, N), np.float32)
        cand_ok = np.zeros((Kc,), np.float32)
        desc_list = []
        for s, oi in enumerate(cands):
            kf = self.keyframes[oi]
            kp_lm_bank[s] = kf.kp_lm.astype(np.float32)
            valid_bank[s] = kf.kp["valid"].astype(np.float32)
            cand_ok[s] = 1.0
            desc_list.append(jnp.asarray(kf.kp["desc"]))
        while len(desc_list) < Kc:          # pad to the compiled shape
            desc_list.append(desc_list[0])
        desc_bank = _stack_jit(*desc_list)  # one jitted dispatch
        uv_q = np.stack([new_kf.kp["u"], new_kf.kp["v"]],
                        -1).astype(np.float32)
        packed_in = np.concatenate([
            kp_lm_bank.ravel(), valid_bank.ravel(), uv_q.ravel(),
            new_kf.kp["valid"].astype(np.float32), cand_ok])
        Ln = self.landmarks.shape[0]
        Lpad = ((Ln + 4095) // 4096) * 4096
        lm_table = np.zeros((Lpad, 3), np.float32)
        lm_table[:Ln] = self.landmarks
        out = np.asarray(self._jit_loop_probe(
            self._next_key(), jnp.asarray(new_kf.pose), desc_bank,
            jnp.asarray(new_kf.kp["desc"]), jnp.asarray(packed_in),
            jnp.asarray(lm_table)))

        Mcap = cfg.match.max_matches
        for s, oi in enumerate(cands):
            old_kf = self.keyframes[oi]
            row = out[s]
            n_has = int(row[6])
            n_inl = int(row[7])
            rmse = float(row[8])
            # `rmse <= max` (not `not >`): a degenerate candidate's NaN
            # rmse must reject, not slip past an inverted comparison.
            accept = (n_has >= cfg.loop_min_inliers
                      and n_inl >= cfg.loop_min_inliers
                      and rmse <= cfg.loop_max_rmse)
            self.loop_probe_log.append(dict(
                kf=new_idx, old=int(oi), n_has=n_has, n_inl=n_inl,
                rmse=rmse, accepted=bool(accept)))
            if not accept:
                continue
            pose = row[:6].astype(np.float32)
            ib_all = row[9:9 + Mcap].astype(np.int64)
            lm_all = row[9 + Mcap:9 + 2 * Mcap].astype(np.int64)
            inl_mask = row[9 + 2 * Mcap:9 + 3 * Mcap] > 0.5
            ib_inl = ib_all[inl_mask]
            lm_inl = lm_all[inl_mask]
            # Scale drift across the loop (Sim(3) graphs only): the new
            # keyframe's duplicate landmark estimates vs the old map's
            # points for the same physical features. Umeyama's scale s_u
            # maps local -> old (an inflated local map gives s_u < 1), and
            # the landmark re-anchor applies D = S_new S_old^-1, so the
            # new node's sigma must equal log(s_u) for D to carry the
            # shrink — hence edge sigma_z = sigma_j - sigma_i = log(s_u).
            sigma = 0.0
            if cfg.pose_graph_sim3:
                cur_ids = new_kf.kp_lm[ib_inl]
                old_ids = lm_inl
                dup = (cur_ids >= 0) & (cur_ids != old_ids)
                if dup.sum() >= 8:
                    # numpy Umeyama: this is tiny host math, and the jnp
                    # variant would dispatch dozens of EAGER remote ops on
                    # tunneled backends (seconds per closure).
                    from sift_tpu.eval.ate import umeyama_alignment
                    src = self.landmarks[cur_ids[dup]].astype(np.float64)
                    dst = self.landmarks[old_ids[dup]].astype(np.float64)
                    s_u, _, _ = umeyama_alignment(src, dst, with_scale=True)
                    s_u = float(np.clip(float(s_u), 0.2, 5.0))
                    sigma = float(np.log(s_u))

            # Edge: old -> new with the re-localized pose.
            self.pose_edges.append(dict(
                i=int(oi), j=new_idx, kind="loop",
                z=self._rel_pose(old_kf.pose, pose),
                w=cfg.loop_weight, sigma=sigma))
            self.num_loop_closures += 1
            # Landmark fusion: the accepted 2D-3D inliers tie new-keyframe
            # keypoints to OLD map points — adopt/merge so subsequent window
            # BA constrains the loop through shared observations, not only
            # through the pose-graph edge.
            self._fuse_loop_landmarks(new_kf, ib_inl, lm_inl)
            if self.logger is not None:
                self.logger.log("loop_closure", old=int(oi), new=new_idx,
                                inliers=n_inl, rmse=rmse)
            self._run_pose_graph()
            break          # at most one closure per keyframe

    def run_global_ba(self, mesh=None, cfg_ba=None,
                      fix_first_n: int = 2) -> Dict[str, float]:
        """Full-map bundle adjustment: every keyframe pose and landmark.

        The online loop only ever solves the sliding window
        (`_run_window_ba`) plus pose-graph corrections; this is the
        offline/final refinement over the whole reconstruction. With
        `mesh`, observations run data-sharded and landmark blocks
        model-sharded through `dist.run_ba_sharded` (identical math —
        the multidevice suite asserts psum'd-vs-single equivalence).

        Buffers are padded to coarse multiples so repeated calls on a
        growing map hit a handful of compiled shapes, not one per call.
        Updates keyframe poses and landmarks in place; returns
        {"rmse": ..., "n_obs": ..., "n_cams": ..., "n_lms": ...}.
        """
        self._flush_ba()
        C = len(self.keyframes)
        if C < 2:
            return dict(rmse=0.0, n_obs=0, n_cams=C, n_lms=0)

        oc, ol, ouv = [], [], []
        for ci, kf in enumerate(self.keyframes):
            slots = np.nonzero(kf.kp_lm >= 0)[0]
            oc.append(np.full(slots.shape[0], ci, np.int32))
            ol.append(kf.kp_lm[slots])
            ouv.append(np.stack([kf.kp["u"][slots], kf.kp["v"][slots]], -1))
        oc = np.concatenate(oc)
        ol = np.concatenate(ol).astype(np.int64)
        ouv = np.concatenate(ouv).astype(np.float32)
        uniq, inv = np.unique(ol, return_inverse=True)
        L, O = uniq.shape[0], oc.shape[0]
        if L < 8 or O < 24:
            return dict(rmse=0.0, n_obs=O, n_cams=C, n_lms=L)

        def pad_to(n, mult):
            return ((n + mult - 1) // mult) * mult

        ndev = mesh.size if mesh is not None else 1
        Ccap = pad_to(C, 8)
        Lcap = pad_to(L, max(512, ndev))
        Ocap = pad_to(O, max(2048, ndev))

        poses = np.zeros((Ccap, 6), np.float32)
        poses[:C] = np.stack([kf.pose for kf in self.keyframes])
        lms = np.zeros((Lcap, 3), np.float32)
        lms[:L] = self.landmarks[uniq]
        obs_cam = np.zeros(Ocap, np.int32)
        obs_lm = np.zeros(Ocap, np.int32)
        obs_uv = np.zeros((Ocap, 2), np.float32)
        obs_valid = np.zeros(Ocap, bool)
        obs_cam[:O] = oc
        obs_lm[:O] = inv
        obs_uv[:O] = ouv
        obs_valid[:O] = True
        fixed = np.zeros(Ccap, bool)
        fixed[:min(fix_first_n, C)] = True
        fixed[C:] = True                     # padding cameras pinned

        bcfg = cfg_ba if cfg_ba is not None else self.cfg.ba
        args = (jnp.asarray(poses), jnp.asarray(self.K), jnp.asarray(lms),
                jnp.asarray(obs_cam), jnp.asarray(obs_lm),
                jnp.asarray(obs_uv), jnp.asarray(obs_valid))
        if mesh is not None:
            from sift_tpu.dist.ba_dist import run_ba_sharded
            st = run_ba_sharded(mesh, *args, cfg=bcfg,
                                fixed_cam_mask=jnp.asarray(fixed))
        else:
            st = _global_ba_jit(*args, bcfg, jnp.asarray(fixed))
        new_poses = np.asarray(st.poses)
        new_lms = np.asarray(st.landmarks)
        for ci, kf in enumerate(self.keyframes):
            kf.pose = new_poses[ci].astype(np.float32)
        self.landmarks[uniq] = new_lms[:L].astype(np.float32)
        self._map_version += 1
        rmse = float(st.rmse)
        if self.logger is not None:
            self.logger.log("global_ba", rmse=rmse, n_obs=O, n_cams=C,
                            n_lms=L)
        return dict(rmse=rmse, n_obs=int(O), n_cams=int(C), n_lms=int(L))

    def cull_keyframes(self, redundancy: float = 0.9,
                       min_other_refs: int = 3) -> Dict[str, int]:
        """Remove redundant keyframes (ORB-SLAM-style map maintenance).

        A keyframe outside the newest BA window is redundant when at
        least `redundancy` of its associated landmarks are also observed
        by `min_other_refs` OTHER keyframes — removing it loses no map
        constraint that matters. Never culls keyframe 0 (the gauge
        anchor) or endpoints of loop-closure edges (their measured
        constraints are irreplaceable).

        Bookkeeping: keyframe indices are renumbered; odometry edges are
        rebuilt over surviving consecutive pairs (their relative poses
        are refreshed from current estimates at every PGO anyway,
        `_add_odometry_edge`), loop edges keep their measurement with
        remapped endpoints, `lm_ref_kf` re-anchors each landmark to the
        nearest surviving keyframe at or before its creator, and the
        global descriptor index is rebuilt. Any deferred window-BA
        result is applied first.
        """
        self._flush_ba()
        n_kf = len(self.keyframes)
        window_start = max(0, n_kf - self.cfg.window_size)
        if window_start <= 1:
            return dict(culled=0, kept=n_kf)

        refs = np.zeros(max(self.landmarks.shape[0], 1), np.int64)
        for kf in self.keyframes:
            np.add.at(refs, kf.kp_lm[kf.kp_lm >= 0], 1)
        protected = {0}
        for e in self.pose_edges:
            if e.get("kind") != "odom":
                protected.add(e["i"])
                protected.add(e["j"])

        cull = []
        for i in range(1, window_start):
            if i in protected:
                continue
            ids = self.keyframes[i].kp_lm
            ids = ids[ids >= 0]
            if ids.size and np.mean(
                    refs[ids] >= min_other_refs + 1) < redundancy:
                continue
            cull.append(i)
            np.subtract.at(refs, ids, 1)  # removal affects later decisions
        if not cull:
            return dict(culled=0, kept=n_kf)

        keep = [i for i in range(n_kf) if i not in set(cull)]
        remap = {old: new for new, old in enumerate(keep)}
        # Nearest surviving keyframe at-or-before each old index (for
        # landmark re-anchoring; old 0 always survives).
        anchor = np.zeros(n_kf, np.int64)
        cur = 0
        for old in range(n_kf):
            if old in remap:
                cur = remap[old]
            anchor[old] = cur
        self.keyframes = [self.keyframes[i] for i in keep]
        self.lm_ref_kf = anchor[np.clip(self.lm_ref_kf, 0, n_kf - 1)]

        loop_edges = []
        for e in self.pose_edges:
            if e.get("kind") == "odom":
                continue
            e2 = dict(e)
            e2["i"], e2["j"] = remap[e["i"]], remap[e["j"]]
            loop_edges.append(e2)
        self.pose_edges = [
            dict(i=k, j=k + 1, kind="odom",
                 z=self._rel_pose(self.keyframes[k].pose,
                                  self.keyframes[k + 1].pose), w=1.0)
            for k in range(len(self.keyframes) - 1)] + loop_edges

        self._global_index = None
        for i, kf in enumerate(self.keyframes):
            self._index_keyframe(i, kf)
        self._map_version += 1
        self._local_map_cache = None
        if self.logger is not None:
            self.logger.log("cull_keyframes", culled=len(cull),
                            kept=len(keep))
        return dict(culled=len(cull), kept=len(keep))

    def compact_landmarks(self, min_refs: int = 1) -> Dict[str, int]:
        """Drop under-referenced landmarks and compact the id space.

        Loop-closure fusion remaps duplicate landmark ids but leaves the
        duplicate ROWS behind; long runs accumulate orphans and the map
        arrays grow without bound. This removes every landmark referenced
        by fewer than `min_refs` keyframe slots and renumbers the rest
        (landmark array, `lm_ref_kf`, every keyframe's `kp_lm`).

        `min_refs=1` is result-neutral: dropped rows are unreachable from
        any keyframe, so tracking, BA windows, and loop re-anchoring never
        see them. `min_refs=2` additionally drops single-observation
        points (weakly constrained in BA) — slots referencing them lose
        their association. Any deferred window-BA result is applied first
        (its landmark ids refer to the pre-compaction space).
        """
        self._flush_ba()
        n = self.landmarks.shape[0]
        refs = np.zeros(n, np.int64)
        for kf in self.keyframes:
            ids = kf.kp_lm[kf.kp_lm >= 0]
            np.add.at(refs, ids, 1)
        keep = refs >= min_refs
        kept = int(keep.sum())
        remap = np.full(n, -1, np.int64)
        remap[keep] = np.arange(kept)
        self.landmarks = self.landmarks[keep]
        self.lm_ref_kf = self.lm_ref_kf[keep]
        for kf in self.keyframes:
            has = kf.kp_lm >= 0
            kf.kp_lm[has] = remap[kf.kp_lm[has]]
        self._map_version += 1
        if self.logger is not None:
            self.logger.log("compact", kept=kept, dropped=n - kept)
        return dict(kept=kept, dropped=n - kept)

    def _fuse_loop_landmarks(self, new_kf: Keyframe,
                             new_slots: np.ndarray,
                             old_lm_ids: np.ndarray) -> None:
        """Adopt/merge landmark identities across a loop closure.

        For each inlier pair (new keyframe slot, old landmark): a slot with
        no landmark adopts the old id; a slot carrying a duplicate (the
        return-path re-triangulation of the same physical point) has every
        reference to the duplicate remapped to the old id, fusing the map.
        """
        self._map_version += 1         # kp_lm changes invalidate the cache
        cur = new_kf.kp_lm[new_slots]
        adopt = cur < 0
        new_kf.kp_lm[new_slots[adopt]] = old_lm_ids[adopt]

        dup_pairs = [(int(d), int(o))
                     for d, o in zip(cur[~adopt], old_lm_ids[~adopt])
                     if d != o]
        if not dup_pairs:
            return
        # Union-find: exact chain resolution at any depth (repeated
        # closures over the same region can build arbitrarily long
        # duplicate chains; fixed-pass squashing left tails unresolved).
        remap = np.arange(self.landmarks.shape[0], dtype=np.int64)

        def find(i):
            while remap[i] != i:
                remap[i] = remap[remap[i]]   # path halving
                i = remap[i]
            return i

        for d, o in dup_pairs:
            rd, ro = find(d), find(o)
            if rd != ro:
                # Merge toward the older (smaller-id) landmark so the
                # survivor is always the first triangulation.
                remap[max(rd, ro)] = min(rd, ro)
        # Flatten to roots (vectorized; doubles resolved depth per pass).
        flat = remap[remap]
        while not np.array_equal(flat, remap):
            remap, flat = flat, flat[flat]
        remap = flat
        for kf in self.keyframes:
            has = kf.kp_lm >= 0
            kf.kp_lm[has] = remap[kf.kp_lm[has]]
        if self.logger is not None:
            self.logger.log("landmark_fusion", merged=len(dup_pairs),
                            adopted=int(adopt.sum()))

    def _run_pose_graph(self):
        """Optimize all keyframe poses over the accumulated edge set (padded
        static shapes), then re-anchor landmarks by their creating keyframe's
        correction."""
        self._flush_ba()
        from sift_tpu.slam.pose_graph import PoseGraph

        cfg = self.cfg
        N = cfg.max_pose_graph_nodes
        E = cfg.max_pose_graph_edges
        n = len(self.keyframes)
        if n > N or len(self.pose_edges) > E:
            return                      # capacity exceeded; skip (configurable)

        poses = np.zeros((N, 6), np.float32)
        old_poses = np.stack([kf.pose for kf in self.keyframes])
        poses[:n] = old_poses
        # Refresh odometry constraints to the current relative poses.
        for e in self.pose_edges:
            if e.get("kind") == "odom":
                e["z"] = self._rel_pose(self.keyframes[e["i"]].pose,
                                        self.keyframes[e["j"]].pose)
        ei = np.zeros(E, np.int32)
        ej = np.zeros(E, np.int32)
        ez = np.zeros((E, 6), np.float32)
        ew = np.zeros(E, np.float32)
        for k, e in enumerate(self.pose_edges):
            ei[k], ej[k], ez[k], ew[k] = e["i"], e["j"], e["z"], e["w"]
        fixed = np.ones(N, bool)
        fixed[1:n] = False              # node 0 is the gauge

        if cfg.pose_graph_sim3:
            self._run_pose_graph_sim3(ei, ej, ez, ew, fixed, old_poses, n, N)
        else:
            graph = PoseGraph(poses=jnp.asarray(poses),
                              edge_i=jnp.asarray(ei),
                              edge_j=jnp.asarray(ej), edge_z=jnp.asarray(ez),
                              edge_w=jnp.asarray(ew),
                              fixed=jnp.asarray(fixed))
            out = np.asarray(_pgo_jit(graph).poses)

            # Apply corrections: keyframe poses, then landmarks via the
            # rigid delta of their creating keyframe (T_new T_old^-1).
            Rd, td = lie_np.pose_deltas(
                np.pad(old_poses, ((0, N - n), (0, 0))), out)
            for k in range(n):
                self.keyframes[k].pose = out[k]
            ref = self.lm_ref_kf
            self.landmarks = np.einsum("lij,lj->li", Rd[ref],
                                       self.landmarks) + td[ref]
        if self.logger is not None:
            self.logger.log("pose_graph", nodes=n,
                            edges=len(self.pose_edges),
                            sim3=bool(cfg.pose_graph_sim3))

    def _run_pose_graph_sim3(self, ei, ej, ez6, ew, fixed, old_poses,
                             n: int, N: int):
        """Sim(3) pose-graph step: 7-dof nodes absorb monocular scale
        drift; landmarks are re-anchored with the full similarity delta of
        their creating keyframe (X' = s_d R_d X + t_d), and keyframe poses
        take the (R, t) part — the residual scale has been pushed into the
        landmarks, and the next window BA polishes the seam."""
        from sift_tpu.geometry import sim3 as sim3m
        from sift_tpu.slam.pose_graph import Sim3Graph

        E = ez6.shape[0]
        sig = np.zeros((E,), np.float32)
        for k, e in enumerate(self.pose_edges):
            sig[k] = float(e.get("sigma", 0.0))
        # Edge measurement as a true Sim(3) log: the host stores the SE(3)
        # relative log plus a scalar sigma; the similarity they describe is
        # (e^sigma, R_z, t_z), whose log's v-component differs from the
        # SE(3) one whenever sigma != 0 (W(omega, sigma) != V(omega)).
        # ONE jitted dispatch (eager ops here cost a remote round trip
        # EACH on tunneled backends — measured ~56 s per PGO run).
        ez7 = np.asarray(_sim3_edges_jit(jnp.asarray(ez6),
                                         jnp.asarray(sig)), np.float32)
        poses7 = np.zeros((N, 7), np.float32)
        poses7[:n, :6] = old_poses

        graph = Sim3Graph(
            poses=jnp.asarray(poses7), edge_i=jnp.asarray(ei),
            edge_j=jnp.asarray(ej), edge_z=jnp.asarray(ez7),
            edge_w=jnp.asarray(ew), fixed=jnp.asarray(fixed))
        out = _pgo_sim3_jit(graph).poses                      # (N, 7) dev

        # Similarity deltas D_k = S_new S_old^-1 per node (old sigma = 0):
        # one jitted dispatch at the padded capacity, ONE packed read.
        old6 = np.zeros((N, 6), np.float32)
        old6[:n] = old_poses
        packed = np.asarray(_sim3_deltas_jit(out, jnp.asarray(old6)))[:n]
        sd = packed[:, 0]
        Rd = packed[:, 1:10].reshape(n, 3, 3)
        td = packed[:, 10:13]
        R_new_h = packed[:, 13:22].reshape(n, 3, 3)
        t_new_h = packed[:, 22:25]
        for k in range(n):
            self.keyframes[k].pose = _se3_log_np(R_new_h[k], t_new_h[k])
        ref = self.lm_ref_kf
        self.landmarks = (sd[ref, None] *
                          np.einsum("lij,lj->li", Rd[ref], self.landmarks)
                          + td[ref]).astype(np.float32)

    # ------------------------------------------------------------------ ba
    def _run_window_ba(self, fix_first_n: int = 2):
        cfg = self.cfg
        window = self.keyframes[-cfg.window_size:]
        C = cfg.window_size

        # Collect window observations (kf-local camera ids).
        oc, ol, ouv = [], [], []
        for ci, kf in enumerate(window):
            slots = np.nonzero(kf.kp_lm >= 0)[0]
            oc.append(np.full(slots.shape[0], ci, np.int32))
            ol.append(kf.kp_lm[slots])
            ouv.append(np.stack([kf.kp["u"][slots], kf.kp["v"][slots]], -1))
        oc = np.concatenate(oc) if oc else np.zeros(0, np.int32)
        ol = np.concatenate(ol) if ol else np.zeros(0, np.int64)
        ouv = (np.concatenate(ouv) if ouv else
               np.zeros((0, 2), np.float32)).astype(np.float32)

        # Window-local landmark remap, capped to static capacity.
        uniq, inv = np.unique(ol, return_inverse=True)
        Lcap, Ocap = cfg.ba_max_landmarks, cfg.ba_max_observations
        if uniq.shape[0] > Lcap:
            # Keep the most-observed landmarks.
            counts = np.bincount(inv)
            keep = np.argsort(-counts)[:Lcap]
            keep_mask = np.isin(inv, keep)
            oc, ol, ouv, inv = (oc[keep_mask], ol[keep_mask], ouv[keep_mask],
                                inv[keep_mask])
            uniq, inv = np.unique(ol, return_inverse=True)
        if oc.shape[0] > Ocap:
            pick = np.random.default_rng(0).permutation(oc.shape[0])[:Ocap]
            oc, ol, ouv, inv = oc[pick], ol[pick], ouv[pick], inv[pick]
            uniq, inv = np.unique(ol, return_inverse=True)

        L = uniq.shape[0]
        O = oc.shape[0]
        if L < 8 or O < 24:
            return

        # Bucketed capacities: the window problem is usually FAR smaller
        # than the configured ceilings (measured L~120-210 / O~240-780 vs
        # caps 2048/8192 in the r3 bench), and the dense-Schur einsum
        # passes cost ~linearly in the PADDED sizes. Pad to the smallest
        # of three compiled shapes that fits — identical masked math,
        # ~an order of magnitude less BA device time at typical sizes.
        for frac in (8, 2, 1):
            if L <= Lcap // frac and O <= Ocap // frac:
                Lcap, Ocap = max(Lcap // frac, 8), max(Ocap // frac, 32)
                break

        lms = np.zeros((Lcap, 3), np.float32)
        lms[:L] = self.landmarks[uniq]
        obs_cam = np.zeros(Ocap, np.int32)
        obs_lm = np.zeros(Ocap, np.int32)
        obs_uv = np.zeros((Ocap, 2), np.float32)
        obs_valid = np.zeros(Ocap, bool)
        obs_cam[:O] = oc
        obs_lm[:O] = inv
        obs_uv[:O] = ouv
        obs_valid[:O] = True

        poses = np.zeros((C, 6), np.float32)
        for ci, kf in enumerate(window):
            poses[ci] = kf.pose
        fixed = np.zeros(C, bool)
        fixed[:min(fix_first_n, len(window))] = True
        fixed[len(window):] = True          # unused slots pinned

        ba_fn = (self._jit_window_ba_track
                 if self.state == "tracking" else self._jit_window_ba)
        ba_args = (jnp.asarray(poses), jnp.asarray(lms),
                   jnp.asarray(obs_cam), jnp.asarray(obs_lm),
                   jnp.asarray(obs_uv), jnp.asarray(obs_valid),
                   jnp.asarray(fixed))
        if self._capture is not None:
            self._capture["ba"] = (ba_fn, ba_args)
        st = ba_fn(*ba_args)
        if self.cfg.ba_async:
            # Deferred: JAX dispatch is asynchronous — keep the device
            # handles and apply the results before the map state is next
            # mutated destructively (PGO / compaction / save / finalize).
            # Tracking frames in between run against the pre-BA poses,
            # which a window's worth of robust localization tolerates by
            # design. Start the device->host copy NOW: the transfer rides
            # behind the BA program and the tracking chunks that follow,
            # so the blocking read in `_flush_ba` finds the bytes already
            # on the host instead of paying a tunnel round trip.
            try:
                st.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass                       # backend without async D2H
            self._pending_ba.append((st, list(window), uniq, L, O,
                                     self._chunk_seq))
            # Bound the in-flight queue: anything two promotions old has
            # had a full chunk of device time — applying it is free.
            while len(self._pending_ba) > 2:
                self._apply_ba_result(*self._pending_ba.pop(0)[:5])
            return
        self._apply_ba_result(st, window, uniq, L, O)

    def _apply_ba_result(self, packed, window, uniq, L, O):
        """`packed`: the BA jit's single buffer [poses | landmarks | rmse |
        iters] — one host read applies the whole result."""
        packed = np.asarray(packed)
        C = self.cfg.window_size
        # Landmark capacity is BUCKETED per solve (see _run_window_ba);
        # recover it from the buffer layout [poses C*6 | lms Lcap*3 |
        # rmse | iters] rather than the config ceiling.
        Lcap = (packed.shape[0] - C * 6 - 2) // 3
        new_poses = packed[:C * 6].reshape(C, 6).astype(np.float32)
        new_lms = packed[C * 6:C * 6 + Lcap * 3].reshape(Lcap, 3)
        for ci, kf in enumerate(window):
            kf.pose = new_poses[ci]
        self.landmarks[uniq] = new_lms[:L].astype(np.float32)
        if self.logger is not None:
            self.logger.log("window_ba", rmse=float(packed[-2]),
                            iters=int(packed[-1]), n_obs=O, n_lms=L)

    def _kickoff_ba(self):
        """Dispatch a deferred window-BA solve, if one is pending."""
        if self._ba_kickoff is not None:
            kw, self._ba_kickoff = self._ba_kickoff, None
            self._run_window_ba(**kw)

    def _flush_ba(self, before_seq: Optional[int] = None):
        """Apply deferred window-BA results in dispatch order (dispatching
        a still-pending deferred kickoff first). `before_seq`: only apply
        solves dispatched before that chunk — a multi-promotion chunk's
        second promotion must not block on the solve its first promotion
        dispatched microseconds earlier (a full device-queue drain, ~90 ms
        measured r3); destructive operations pass None and drain fully."""
        self._kickoff_ba()
        while self._pending_ba and (
                before_seq is None or self._pending_ba[0][5] < before_seq):
            self._apply_ba_result(*self._pending_ba.pop(0)[:5])

    def finalize(self):
        """Flush deferred work (async window BA). Call at sequence end."""
        self._flush_ba()
