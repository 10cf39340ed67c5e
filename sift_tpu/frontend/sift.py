"""SIFT extraction entry points.

`extract(img, cfg)` — single (H, W) image -> fixed-capacity `Keypoints`.
`extract_batch(imgs, cfg)` — (B, H, W) via vmap (lowe mode).

The lowe pipeline (production path) processes octave by octave — detection,
iterative refinement, orientation histograms, peak duplication, descriptors —
then compacts all octaves' candidates into the global `cfg.max_keypoints`
buffer by detection score. Every stage is a fixed-shape tensor program: the
whole extractor jits to a single XLA computation per (H, W).

Pipeline stage order mirrors the reference spine (`Sift::calculate`,
sift.cpp:19-57); the implementation shares no structure with its per-pixel
C++ loops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sift_tpu.config import SiftConfig
from sift_tpu.types import Keypoints
from sift_tpu.frontend.pyramid import build_pyramid
from sift_tpu.frontend.extrema import detect_extrema_octave
from sift_tpu.frontend.refine import refine_octave_lowe
from sift_tpu.frontend.windows import (
    R_DESC,
    R_ORI,
    gather_gradient_windows,
    orientation_from_windows,
    descriptors_from_windows_multi,
)
from sift_tpu.frontend.parity import extract_parity

MAX_ORI_PEAKS = 2


def _gradient_xy(g: jnp.ndarray):
    """Central-difference gradient maps of a (..., H, W) stack (interior; border 0)."""
    dx = jnp.zeros_like(g)
    dy = jnp.zeros_like(g)
    dx = dx.at[..., 1:-1].set((g[..., 2:] - g[..., :-2]) * 0.5)
    dy = dy.at[..., 1:-1, :].set((g[..., 2:, :] - g[..., :-2, :]) * 0.5)
    return dx, dy


def extract_lowe(img: jnp.ndarray, cfg: SiftConfig,
                 with_descriptors: bool = True) -> Keypoints:
    """Per-image lowe extraction — the SEMANTIC ORACLE (r5).

    Production single-image extraction routes through
    `extract_lowe_batched` at B=1 (`extract()`); this unbatched program
    exists so equivalence tests can compare the batched implementation
    against an independent formulation of the same math
    (tests/unit/test_frontend_batched.py).
    """
    pyr = build_pyramid(img, cfg)
    octave_factor = cfg.k ** (cfg.dogs_per_epoch - 1)

    fields = ["x", "y", "octave", "level", "scale", "score", "orientation",
              "valid"]
    buffers = {f: [] for f in fields}
    descs = []

    dropped = jnp.asarray(0, jnp.int32)
    cand_pruned = jnp.asarray(0, jnp.int32)
    for o in range(pyr.num_octaves):
        x, y, lvl, score, valid, n_drop = detect_extrema_octave(
            pyr.dogs[o], cfg, o)
        cand_pruned = cand_pruned + n_drop
        cand = dict(x=x, y=y, level=lvl, score=score, valid=valid)
        cand = refine_octave_lowe(pyr.dogs[o], cand, cfg, pyr.dog_sigmas,
                                  o, octave_factor)

        g = pyr.gauss[o]
        H, W = g.shape[-2:]
        dxm, dym = _gradient_xy(g)

        # gaussian level whose sigma is nearest the keypoint's within-octave
        # scale; gradients are read from that level
        sigma_within = cand["scale"] / jnp.float32(octave_factor ** o)
        table = jnp.asarray(pyr.gauss_sigmas[o], jnp.float32)
        gl = jnp.argmin(jnp.abs(table[None, :] - sigma_within[:, None]),
                        axis=-1)
        in_bounds = ((cand["x"] >= R_ORI) & (cand["x"] < W - R_ORI) &
                     (cand["y"] >= R_ORI) & (cand["y"] < H - R_ORI))

        # ONE contiguous gradient window per keypoint feeds both the
        # orientation histogram and (both) descriptors — see windows.py.
        # Tiny top octaves clamp the window to fit (or drop out entirely
        # below the orientation radius).
        r_eff = min(R_DESC, H // 2, W // 2)
        if r_eff < R_ORI:
            K = cand["x"].shape[0]
            peak_oris = jnp.zeros((K, MAX_ORI_PEAKS), jnp.float32)
            peak_valid = jnp.zeros((K, MAX_ORI_PEAKS), bool)
            gxw = jnp.zeros((K, 2 * R_ORI, 2 * R_ORI), jnp.float32)
            gyw = jnp.zeros_like(gxw)
            oy0 = jnp.zeros((K,), jnp.float32)
            ox0 = jnp.zeros((K,), jnp.float32)
        else:
            gxw, gyw, oy0, ox0 = gather_gradient_windows(
                dxm, dym, gl, cand["y"], cand["x"], radius=r_eff,
                pallas=cfg.pallas, dtype=cfg.window_dtype)
            peak_oris, peak_valid = orientation_from_windows(
                gxw, gyw, oy0, ox0, sigma_within, in_bounds, cfg,
                MAX_ORI_PEAKS)

        # duplicate keypoints per orientation peak: (K,) -> (K*P,)
        K = cand["x"].shape[0]
        P = MAX_ORI_PEAKS

        def rep(a):
            return jnp.repeat(a, P, axis=0)

        dup = dict(
            x=rep(cand["x"]), y=rep(cand["y"]),
            octave=jnp.full((K * P,), o, jnp.int32),
            level=rep(cand["level"]), scale=rep(cand["scale"]),
            score=rep(cand["score"]),
            orientation=peak_oris.reshape(-1),
            valid=rep(cand["valid"] & in_bounds) & peak_valid.reshape(-1),
        )
        if with_descriptors:
            # ALL orientation peaks over the SAME windows in one call (the
            # Pallas kernel reads windows from HBM once for both peaks; the
            # XLA fallback loops per peak — no duplicated (K*P, d, d)
            # materialization either way); stack order matches jnp.repeat's
            # k0p0, k0p1, k1p0, ... interleaving.
            dm = descriptors_from_windows_multi(
                gxw, gyw, oy0, ox0, peak_oris, sigma_within, cfg,
                pallas=cfg.pallas)
            descs.append(dm.reshape(K * P, -1))
        for f in fields:
            buffers[f].append(dup[f])

    kp = {f: jnp.concatenate(buffers[f]) for f in fields}
    desc = jnp.concatenate(descs) if with_descriptors else None

    # global compaction: top max_keypoints by score among valid
    N = cfg.max_keypoints
    rank_score = jnp.where(kp["valid"], kp["score"], -jnp.inf)
    top_scores, idx = lax.top_k(rank_score, min(N, rank_score.shape[0]))
    take = lambda a: a[idx]
    out_valid = take(kp["valid"]) & jnp.isfinite(top_scores)
    # Saturation accounting (see types.Keypoints): n_dropped counts REFINED
    # valid keypoints lost to the global top-K — real silent truncation;
    # pre-refinement strongest-N candidate pruning is the separate
    # n_cand_pruned (quality-managed, informational).
    dropped = dropped + jnp.maximum(
        jnp.sum(kp["valid"].astype(jnp.int32))
        - jnp.sum(out_valid.astype(jnp.int32)), 0)
    out = Keypoints(
        x=take(kp["x"]), y=take(kp["y"]), octave=take(kp["octave"]),
        level=take(kp["level"]), scale=take(kp["scale"]),
        score=take(kp["score"]), orientation=take(kp["orientation"]),
        valid=out_valid,
        desc=take(desc) if desc is not None else None,
        n_dropped=dropped,
        n_cand_pruned=cand_pruned,
    )
    return out


def extract(img: jnp.ndarray, cfg: SiftConfig,
            with_descriptors: bool = True) -> Keypoints:
    """Extract SIFT keypoints from one (H, W) float32 image in [0, image_max].

    Lowe mode routes through the batched extractor at B=1 — ONE extraction
    semantic for every caller (r5 unification; VERDICT r4 #2). The r4
    "knife edge on keypoint low bits" that justified a separate
    single-image program was diagnosed as bootstrap-frame sensitivity in
    the SLAM pipeline (tools/diag_bootstrap.py), fixed there
    (health-selected two-view model + deferral + pose backfill), so the
    duality is retired. `extract_lowe` remains as the per-image semantic
    oracle for equivalence tests.
    """
    if cfg.mode == "parity":
        return extract_parity(img, cfg)
    kp = extract_lowe_batched(img[None], cfg, with_descriptors)
    return jax.tree.map(lambda a: a[0], kp)


@functools.partial(jax.jit, static_argnums=(1, 2))
def extract_jit(img: jnp.ndarray, cfg: SiftConfig,
                with_descriptors: bool = True) -> Keypoints:
    return extract(img, cfg, with_descriptors)


def extract_lowe_batched(imgs: jnp.ndarray, cfg: SiftConfig,
                         with_descriptors: bool = True,
                         _upto: str | None = None) -> Keypoints:
    """Batch-flattened lowe extraction over (B, H, W).

    Structurally `vmap(extract_lowe)` — same kernels, same per-keypoint
    math, same outputs — but the PER-KEYPOINT stages (window gather,
    orientation, descriptors) run on keypoints FLATTENED ACROSS THE
    BATCH ((B*K,) instead of vmapped (B, K)): the vmapped lowering of
    the descriptor stage measured 2.35x slower per image than the
    identical un-batched program (benchmarks/desc_experiments.py,
    desc_two_peaks_vmap8_ms), because the batched einsums tile worse.
    The dense map stages (pyramid, extrema, refinement) keep the batch
    dimension — they are stencil/top_k work that batches well. Window
    gathers index a (2, B*L, H, W) level-stack with per-keypoint fused
    (image, level) indices, so the flattening costs nothing.

    `_upto`: instrumentation only (benchmarks/roofline_r5.py) — truncate
    the program after the named stage ("pyramid" | "extrema" | "refine" |
    "windows" | "orientation") and return the partial products, so
    prefix-differenced timings/cost-analysis attribute to stages of the
    REAL fused program rather than re-derived stage replicas.
    """
    B = imgs.shape[0]
    pyr = build_pyramid(imgs, cfg)       # batch-transparent: (B, L, H, W)
    if _upto == "pyramid":
        return pyr
    probes = []
    octave_factor = cfg.k ** (cfg.dogs_per_epoch - 1)

    fields = ["x", "y", "octave", "level", "scale", "score", "orientation",
              "valid"]
    buffers = {f: [] for f in fields}
    descs = []

    dropped = jnp.zeros((B,), jnp.int32)
    cand_pruned = jnp.zeros((B,), jnp.int32)
    for o in range(pyr.num_octaves):
        def det(dogs):
            x, y, lvl, score, valid, n_drop = detect_extrema_octave(
                dogs, cfg, o)
            return dict(x=x, y=y, level=lvl, score=score, valid=valid), \
                n_drop

        cand, n_drop = jax.vmap(det)(pyr.dogs[o])      # fields (B, K)
        cand_pruned = cand_pruned + n_drop
        if _upto == "extrema":
            probes.append(cand)
            continue
        cand = jax.vmap(lambda d, c: refine_octave_lowe(
            d, c, cfg, pyr.dog_sigmas, o, octave_factor))(pyr.dogs[o], cand)
        if _upto == "refine":
            probes.append(cand)
            continue

        g = pyr.gauss[o]                                # (B, L1, H, W)
        L1, H, W = g.shape[-3:]
        K = cand["x"].shape[1]
        dxm, dym = _gradient_xy(g)

        sigma_within = cand["scale"] / jnp.float32(octave_factor ** o)
        table = jnp.asarray(pyr.gauss_sigmas[o], jnp.float32)
        gl = jnp.argmin(jnp.abs(table[None, None, :]
                                - sigma_within[..., None]), axis=-1)
        in_bounds = ((cand["x"] >= R_ORI) & (cand["x"] < W - R_ORI) &
                     (cand["y"] >= R_ORI) & (cand["y"] < H - R_ORI))

        # ---- flatten keypoints across the batch for the window stages ----
        flat = lambda a: a.reshape((B * K,) + a.shape[2:])
        sw_f = flat(sigma_within)
        ib_f = flat(in_bounds)
        r_eff = min(R_DESC, H // 2, W // 2)
        if r_eff < R_ORI:
            peak_oris = jnp.zeros((B * K, MAX_ORI_PEAKS), jnp.float32)
            peak_valid = jnp.zeros((B * K, MAX_ORI_PEAKS), bool)
            gxw = jnp.zeros((B * K, 2 * R_ORI, 2 * R_ORI), jnp.float32)
            gyw = jnp.zeros_like(gxw)
            oy0 = jnp.zeros((B * K,), jnp.float32)
            ox0 = jnp.zeros((B * K,), jnp.float32)
        else:
            # fused (image, level) index into the (B*L1, H, W) map stack
            gl_f = flat(gl + jnp.arange(B, dtype=gl.dtype)[:, None] * L1)
            gxw, gyw, oy0, ox0 = gather_gradient_windows(
                dxm.reshape(B * L1, H, W), dym.reshape(B * L1, H, W),
                gl_f, flat(cand["y"]), flat(cand["x"]), radius=r_eff,
                pallas=cfg.pallas, dtype=cfg.window_dtype)
            if _upto == "windows":
                probes.append((gxw, gyw))
                continue
            peak_oris, peak_valid = orientation_from_windows(
                gxw, gyw, oy0, ox0, sw_f, ib_f, cfg, MAX_ORI_PEAKS)
        if _upto == "windows":
            continue
        if _upto == "orientation":
            probes.append((peak_oris, peak_valid))
            continue

        P = MAX_ORI_PEAKS

        def rep(a):                      # (B, K) -> (B, K*P), peak-major
            # [k0, k0, k1, k1, ...] per row — must match peak_oris
            # .reshape(B, K*P) and the descriptor stacking order.
            return jnp.repeat(a, P, axis=1)

        dup = dict(
            x=rep(cand["x"]), y=rep(cand["y"]),
            octave=jnp.full((B, K * P), o, jnp.int32),
            level=rep(cand["level"]), scale=rep(cand["scale"]),
            score=rep(cand["score"]),
            orientation=peak_oris.reshape(B, K * P),
            valid=(rep(cand["valid"] & in_bounds)
                   & peak_valid.reshape(B, K * P)),
        )
        if with_descriptors:
            dm = descriptors_from_windows_multi(
                gxw, gyw, oy0, ox0, peak_oris, sw_f, cfg,
                pallas=cfg.pallas)
            descs.append(dm.reshape(B, K * P, -1))
        for f in fields:
            buffers[f].append(dup[f])

    if _upto is not None:
        return probes
    kp = {f: jnp.concatenate(buffers[f], axis=1) for f in fields}
    desc = jnp.concatenate(descs, axis=1) if with_descriptors else None

    N = cfg.max_keypoints
    rank_score = jnp.where(kp["valid"], kp["score"], -jnp.inf)
    top_scores, idx = lax.top_k(rank_score, min(N, rank_score.shape[1]))
    take = lambda a: jnp.take_along_axis(a, idx, axis=1)
    out_valid = take(kp["valid"]) & jnp.isfinite(top_scores)
    # n_dropped = refined valid keypoints lost to the global top-K (real
    # silent truncation); n_cand_pruned = pre-refinement strongest-N
    # candidate pruning (quality-managed) — see types.Keypoints.
    dropped = dropped + jnp.maximum(
        jnp.sum(kp["valid"].astype(jnp.int32), axis=1)
        - jnp.sum(out_valid.astype(jnp.int32), axis=1), 0)
    return Keypoints(
        x=take(kp["x"]), y=take(kp["y"]), octave=take(kp["octave"]),
        level=take(kp["level"]), scale=take(kp["scale"]),
        score=take(kp["score"]), orientation=take(kp["orientation"]),
        valid=out_valid,
        desc=(jnp.take_along_axis(desc, idx[..., None], axis=1)
              if desc is not None else None),
        n_dropped=dropped,
        n_cand_pruned=cand_pruned,
    )


def extract_batch(imgs: jnp.ndarray, cfg: SiftConfig,
                  with_descriptors: bool = True) -> Keypoints:
    """Batched extraction over (B, H, W); all Keypoints fields gain a leading B."""
    if cfg.mode == "parity":
        return jax.vmap(lambda im: extract(im, cfg, with_descriptors))(imgs)
    return extract_lowe_batched(imgs, cfg, with_descriptors)
