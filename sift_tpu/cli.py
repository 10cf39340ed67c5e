"""Command-line interface.

Mirrors the reference executable's surface (``/root/reference/main.cpp:30-89``):
the same flags and defaults (``--img/-i``, ``--sigma/-s``, ``--k``,
``--octaves/-o``, ``--dogsPerEpoch/-d``, ``--subpixel/-p``, ``--result/-r``,
positional image), the same keypoint-overlay artifact
(``<img>_orientation.png`` — each keypoint drawn as a rotated square of side
``scale*10`` at original-image coordinates, ``main.cpp:59-76``), and the same
result dump (``interstpoints.txt`` [sic], tab table of location / scale /
orientation / descriptors, ``main.cpp:78-89``).

Beyond the mirror, subcommands expose the subsystems the reference lacks:
``match`` (pairwise descriptor matching), ``twoview`` (relative pose),
``sfm`` (incremental SfM on a sequence), and ``bench``.

Usage (reference-compatible):
    python -m sift_tpu.cli path/to/img.jpg --sigma 1.6 -o 4 -d 3 -r 1
    python -m sift_tpu.cli extract path/to/img.jpg --mode lowe
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np

SUBCOMMANDS = ("extract", "match", "twoview", "sfm", "bench")


def _add_reference_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("image", nargs="?", help="input image (positional, ref main.cpp:41)")
    p.add_argument("--img", "-i", dest="img", help="the image on which sift will be executed")
    p.add_argument("--sigma", "-s", type=float, default=1.6,
                   help="sigma of the Gaussian calculations (default 1.6)")
    p.add_argument("--k", "-k", type=float, default=math.sqrt(2.0),
                   help="scale-step constant (default sqrt(2))")
    p.add_argument("--octaves", "-o", type=int, default=4,
                   help="number of octaves (default 4)")
    p.add_argument("--dogsPerEpoch", "-d", dest="dogs_per_epoch", type=int, default=3,
                   help="DoGs per octave (default 3)")
    p.add_argument("--subpixel", "-p", type=int, default=0,
                   help="start from a 2x-upsampled image (default 0)")
    p.add_argument("--result", "-r", type=int, default=0,
                   help="dump interest points to interstpoints.txt (default 0)")
    # Extensions over the reference CLI:
    p.add_argument("--mode", choices=("lowe", "parity"), default="parity",
                   help="'parity' replicates the reference's behaviour; "
                        "'lowe' is the correct Lowe-2004 pipeline")
    p.add_argument("--max-keypoints", type=int, default=1024)
    p.add_argument("--max-keypoints-per-octave", type=int, default=None,
                   help="per-octave candidate buffer capacity (default: "
                        "SiftConfig's; raise when the saturation warning "
                        "prints — e.g. parrot.jpg needs ~4096 in parity "
                        "mode)")
    p.add_argument("--rootsift", action="store_true",
                   help="RootSIFT descriptors (lowe mode): L1-normalize + "
                        "sqrt; L2 distance becomes the Hellinger kernel")
    p.add_argument("--no-viz", action="store_true",
                   help="skip writing <img>_orientation.png")
    p.add_argument("--time", action="store_true", help="print wall-clock timings")
    p.add_argument("--pallas", choices=("auto", "on", "off"), default="auto",
                   help="Pallas TPU kernels for the hot stages (default "
                        "auto: on for TPU backends)")
    p.add_argument("--window-dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="gradient-map precision for the window fetch "
                        "(bfloat16 halves its HBM bytes; lowe mode only)")
    p.add_argument("--extrema-topk", choices=("exact", "approx"),
                   default="exact",
                   help="candidate selection: approx uses the "
                        "TPU-optimized approx_max_k (recall ~0.99)")


def _sift_config(args):
    from sift_tpu.config import SiftConfig

    kw = {}
    if getattr(args, "max_keypoints_per_octave", None) is not None:
        kw["max_keypoints_per_octave"] = args.max_keypoints_per_octave
    if getattr(args, "rootsift", False):
        kw["rootsift"] = True
    for f in ("pallas", "window_dtype", "extrema_topk"):
        v = getattr(args, f, None)
        if v is not None:
            kw[f] = v
    return SiftConfig(
        sigma=args.sigma, k=args.k, octaves=args.octaves,
        dogs_per_epoch=args.dogs_per_epoch, subpixel=bool(args.subpixel),
        mode=args.mode, max_keypoints=args.max_keypoints, **kw,
    )


def viz_geometry(x, y, octave, scale, orientation_deg, subpixel: bool):
    """Keypoint -> drawn-square geometry, mirroring the reference's
    visualization transform (main.cpp:59-74): center = octave-local
    location scaled to original-image coordinates `loc * 2^octave /
    (subpixel ? 2 : 1)` (main.cpp:60-63), side = `scale * 10`
    (the cv::RotatedRect size, main.cpp:66), angle = orientation in
    degrees (main.cpp:66). Returns (cx, cy, side, angle_deg) arrays."""
    div = 2.0 if subpixel else 1.0
    factor = np.exp2(np.asarray(octave, np.float64)) / div
    cx = np.asarray(x, np.float64) * factor
    cy = np.asarray(y, np.float64) * factor
    side = np.asarray(scale, np.float64) * 10.0
    return cx, cy, side, np.asarray(orientation_deg, np.float64)


def square_corners(x: float, y: float, side: float, angle_deg: float):
    """The 4 corners of a side x side square centred at (x, y), rotated by
    `angle_deg` — cv::RotatedRect::points() semantics (degrees, clockwise
    in image coordinates; ref main.cpp:66-74). Order: top-left, top-right,
    bottom-right, bottom-left of the unrotated square."""
    half = 0.5 * float(side)
    rad = math.radians(float(angle_deg))
    c, sn = math.cos(rad), math.sin(rad)
    return [(x + dx * c - dy * sn, y + dx * sn + dy * c)
            for dx, dy in ((-half, -half), (half, -half),
                           (half, half), (-half, half))]


def draw_keypoints(rgb: np.ndarray, xs, ys, sides, angles_deg,
                   color=(0, 0, 255)) -> np.ndarray:
    """Draw each keypoint as a rotated square outline (ref main.cpp:59-74).

    The reference uses cv::RotatedRect(center, (scale*10, scale*10),
    orientation) and draws the 4 edges in blue (BGR 255,0,0). Angle follows
    OpenCV's convention: degrees, rotating the rect clockwise in image coords.
    """
    from PIL import Image, ImageDraw

    im = Image.fromarray(rgb.astype(np.uint8), mode="RGB")
    drw = ImageDraw.Draw(im)
    for x, y, s, a in zip(xs, ys, sides, angles_deg):
        pts = square_corners(float(x), float(y), float(s), float(a))
        drw.line([pts[0], pts[1], pts[2], pts[3], pts[0]], fill=color, width=1)
    return np.asarray(im)


def _dump_result_file(path: str, kps, descs) -> None:
    """Reference result-table format (main.cpp:78-89), %g float formatting."""
    def g(v):
        return f"{float(v):g}"

    with open(path, "w") as out:
        out.write("Location\tscale\torientation\tdescriptors\n")
        for kp, d in zip(kps, descs):
            desc_str = "".join(g(v) + ", " for v in d)
            out.write(f"[{g(kp['x'])}, {g(kp['y'])}]\t{g(kp['scale'])}\t"
                      f"{g(kp['orientation'])}\t[{desc_str}]\n")


def cmd_extract(args) -> int:
    import jax.numpy as jnp
    from sift_tpu.io.image import load_image_gray
    from sift_tpu.frontend.sift import extract_jit

    img_file = args.img or args.image
    if not img_file:
        print("error: no input image (use positional arg or --img/-i)", file=sys.stderr)
        return 2

    cfg = _sift_config(args)
    gray = load_image_gray(img_file)

    t0 = time.perf_counter()
    kp = extract_jit(jnp.asarray(gray), cfg, True)
    kp = jax_to_host(kp)
    t1 = time.perf_counter()

    valid = kp["valid"]
    n = int(valid.sum())
    print(f"{n} interest points ({img_file}, mode={args.mode})")
    if kp.get("n_dropped") is not None and int(kp["n_dropped"]) > 0:
        print(f"warning: {int(kp['n_dropped'])} keypoints "
              f"exceeded the static buffer capacities and were dropped "
              f"(weakest-response first). Raise --max-keypoints-per-octave/"
              f"--max-keypoints; parity-mode output is NOT "
              f"reference-faithful while this warning prints.",
              file=sys.stderr)
    if kp.get("n_cand_pruned") is not None and int(kp["n_cand_pruned"]) > 0:
        print(f"note: {int(kp['n_cand_pruned'])} raw extrema candidates "
              f"beyond the per-octave cap were pruned weakest-first before "
              f"refinement (strongest-N selection, not silent loss).",
              file=sys.stderr)
    if args.time:
        print(f"extract wall time: {t1 - t0:.3f}s (includes compile on first call)")

    xs, ys, sides, angles = viz_geometry(
        kp["x"][valid], kp["y"][valid], kp["octave"][valid],
        kp["scale"][valid], kp["orientation"][valid], cfg.subpixel)

    if not args.no_viz:
        from sift_tpu.io.image import save_image_rgb
        from PIL import Image

        with Image.open(img_file) as im:
            rgb = np.asarray(im.convert("RGB"))
        overlay = draw_keypoints(rgb, xs, ys, sides, angles)
        out_png = img_file + "_orientation.png"
        save_image_rgb(out_png, overlay)
        print(f"wrote {out_png}")

    if args.result:
        rows = [dict(x=kp["x"][valid][i], y=kp["y"][valid][i],
                     scale=kp["scale"][valid][i],
                     orientation=kp["orientation"][valid][i])
                for i in range(n)]
        descs = kp["desc"][valid] if kp["desc"] is not None else np.zeros((n, 128))
        _dump_result_file("interstpoints.txt", rows, descs)
        print("wrote interstpoints.txt")
    return 0


def jax_to_host(kp):
    """Device Keypoints pytree -> dict of numpy arrays."""
    out = dict(x=np.asarray(kp.x), y=np.asarray(kp.y),
               octave=np.asarray(kp.octave), level=np.asarray(kp.level),
               scale=np.asarray(kp.scale), score=np.asarray(kp.score),
               orientation=np.asarray(kp.orientation),
               valid=np.asarray(kp.valid))
    out["desc"] = np.asarray(kp.desc) if kp.desc is not None else None
    out["n_dropped"] = (np.asarray(kp.n_dropped)
                        if kp.n_dropped is not None else None)
    out["n_cand_pruned"] = (np.asarray(kp.n_cand_pruned)
                            if kp.n_cand_pruned is not None else None)
    return out


def cmd_match(args) -> int:
    import jax.numpy as jnp
    from sift_tpu.io.image import load_image_gray
    from sift_tpu.frontend.sift import extract_jit
    from sift_tpu.matching.matcher import match_descriptors_jit
    from sift_tpu.config import MatchConfig

    cfg = _sift_config(args)
    mcfg = MatchConfig(ratio=args.ratio,
                       impl=getattr(args, "match_impl", "auto"))
    kps = []
    for f in (args.image_a, args.image_b):
        gray = load_image_gray(f)
        kps.append(extract_jit(jnp.asarray(gray), cfg, True))
    if getattr(args, "match_impl", "auto") == "ivf":
        # Approximate path (matching/ann.py): index image B, probe with A.
        from sift_tpu.config import AnnConfig
        from sift_tpu.matching.ann import build_ivf, match_descriptors_ann
        ann = AnnConfig(n_clusters=min(64, max(4, cfg.max_keypoints // 32)),
                        bucket_capacity=max(128, cfg.max_keypoints // 4))
        index = build_ivf(kps[1].desc, kps[1].valid, ann)
        novf = int(index.n_overflow)
        if novf:
            print(f"warning: IVF bucket overflow dropped {novf} descriptors")
        m = match_descriptors_ann(kps[0].desc, kps[0].valid, index,
                                  mcfg.replace(impl="auto"), ann)
    else:
        m = match_descriptors_jit(kps[0].desc, kps[0].valid,
                                  kps[1].desc, kps[1].valid, mcfg)
    n = int(np.asarray(m.valid).sum())
    print(f"{n} matches (ratio={mcfg.ratio}, mutual={mcfg.mutual})")

    # Geometric verification (BASELINE config #2: homography RANSAC).
    import jax
    from sift_tpu.matching.matcher import matched_coords
    from sift_tpu.geometry.homography import ransac_homography
    from sift_tpu.config import RansacConfig

    pa, pb, valid = matched_coords(kps[0], kps[1], m)
    est = ransac_homography(jax.random.PRNGKey(0), pa, pb, valid,
                            RansacConfig(inlier_threshold=3.0))
    print(f"homography-verified inliers: {int(est.num_inliers)} "
          f"(success={bool(est.success)})")
    if bool(est.success):
        H = np.array(est.model)
        print("H =\n", np.round(H / H[2, 2], 4))

    if args.viz:
        from sift_tpu.io.viz import side_by_side_matches
        from sift_tpu.io.image import load_image_gray, save_image_rgb

        img = side_by_side_matches(
            load_image_gray(args.image_a), load_image_gray(args.image_b),
            np.asarray(pa), np.asarray(pb), np.asarray(valid),
            np.asarray(est.inliers))
        save_image_rgb(args.viz, img)
        print(f"wrote {args.viz}")
    return 0


def cmd_twoview(args) -> int:
    """Relative pose between two frames (essential RANSAC + GN polish)."""
    import jax
    import jax.numpy as jnp
    from sift_tpu.io.image import load_image_gray
    from sift_tpu.frontend.sift import extract_jit
    from sift_tpu.matching.matcher import match_keypoints, matched_coords
    from sift_tpu.geometry.epipolar import estimate_relative_pose
    from sift_tpu.config import MatchConfig, RansacConfig

    cfg = _sift_config(args)
    kps = []
    for f in (args.image_a, args.image_b):
        kps.append(extract_jit(jnp.asarray(load_image_gray(f)), cfg, True))
    m = match_keypoints(kps[0], kps[1], MatchConfig(ratio=args.ratio))
    pa, pb, valid = matched_coords(kps[0], kps[1], m)

    fx, fy, cx, cy = args.fx, args.fy, args.cx, args.cy
    if fx is None:
        # Crude default: focal = max image dim, principal point = center.
        h, w = np.asarray(load_image_gray(args.image_a)).shape
        fx = fy = float(max(h, w))
        cx, cy = w / 2.0, h / 2.0
    na = jnp.stack([(pa[:, 0] - cx) / fx, (pa[:, 1] - cy) / fy], -1)
    nb = jnp.stack([(pb[:, 0] - cx) / fx, (pb[:, 1] - cy) / fy], -1)
    R, t, est = estimate_relative_pose(
        jax.random.PRNGKey(0), na, nb, valid,
        RansacConfig(inlier_threshold=args.threshold), focal=fx)
    print(f"matches: {int(np.asarray(m.valid).sum())}  "
          f"inliers: {int(est.num_inliers)}  success: {bool(est.success)}")
    print("R =\n", np.round(np.asarray(R), 5))
    print("t =", np.round(np.asarray(t), 5), "(unit scale)")
    return 0 if bool(est.success) else 1


def cmd_sfm(args) -> int:
    """Incremental SfM over an image sequence (directory or dataset)."""
    from sift_tpu.config import PipelineConfig
    from sift_tpu.slam.pipeline import SfmPipeline
    from sift_tpu.io.datasets import load_tum_rgbd, load_kitti_odometry
    from sift_tpu.eval.ate import ate_rmse
    from sift_tpu.utils.metrics import MetricsLogger

    use_stereo = False
    if args.format == "tum":
        seq = load_tum_rgbd(args.path, max_frames=args.max_frames,
                            stride=args.stride)
    elif args.format == "kitti":
        seq = load_kitti_odometry(args.path, sequence=args.sequence,
                                  max_frames=args.max_frames,
                                  stride=args.stride, stereo=args.stereo)
        use_stereo = args.stereo and seq.baseline is not None and \
            any(f.gray_right is not None for f in seq)
    else:
        print(f"unknown format {args.format}", file=sys.stderr)
        return 2

    logger = MetricsLogger(args.metrics) if args.metrics else None
    kw = {}
    if getattr(args, "chunked", False):
        kw["chunked_tracking"] = True
    if getattr(args, "ba_async", False):
        kw["ba_async"] = True
    if getattr(args, "loop_closure", False) or getattr(args, "sim3", False):
        kw["enable_loop_closure"] = True
    if getattr(args, "sim3", False):
        kw["pose_graph_sim3"] = True
    if getattr(args, "window", None):
        kw["window_size"] = args.window
    if getattr(args, "compact_every", 0):
        kw["compact_interval_kf"] = args.compact_every
    pipe = SfmPipeline(seq.intrinsics, PipelineConfig(**kw), logger=logger,
                       stereo_baseline=seq.baseline if use_stereo else None)
    use_depth = args.format == "tum" and not args.no_depth
    t0 = time.perf_counter()
    # Batched extraction keeps the device busy (see
    # SfmPipeline.process_sequence); --batch 1 falls back to per-frame.
    # Stereo batching needs EVERY right frame present (fixed chunk
    # shapes); a sequence with missing right images — the loader yields
    # gray_right=None per missing file — keeps the per-frame path, which
    # degrades those frames to monocular tracking instead of crashing.
    all_rights = use_stereo and all(f.gray_right is not None for f in seq)
    if args.batch > 1 and (not use_stereo or all_rights):
        results = pipe.process_sequence(
            [f.gray for f in seq],
            depths=[f.depth for f in seq] if use_depth else None,
            rights=[f.gray_right for f in seq] if use_stereo else None,
            batch=args.batch)
    else:
        results = [pipe.process_frame(f.gray,
                                      depth=f.depth if use_depth else None,
                                      right=f.gray_right if use_stereo else None)
                   for f in seq]
        pipe.finalize()          # apply any deferred (ba_async) window BA
    if args.verbose:
        for r in results:
            print(f"frame {r['frame_idx']}: tracked={r['tracked']} "
                  f"kf={r['is_keyframe']} inliers={r['n_inliers']}")
    dt = time.perf_counter() - t0
    print(f"{len(seq)} frames in {dt:.1f}s ({len(seq)/dt:.1f} fps), "
          f"{len(pipe.keyframes)} keyframes, "
          f"{pipe.landmarks.shape[0]} landmarks")
    if getattr(args, "global_ba", False):
        stats = pipe.run_global_ba()
        print(f"global BA: {stats['n_cams']} cams / {stats['n_lms']} lms / "
              f"{stats['n_obs']} obs, reproj RMSE {stats['rmse']:.3f} px")

    gt = seq.gt_positions()
    if gt is not None and len(pipe.trajectory) == gt.shape[0]:
        # RGB-D/stereo trajectories are metric (rigid alignment); monocular
        # ones are scale-free (similarity alignment).
        metric = use_depth or use_stereo
        # One alignment serves both metrics (RPE compares raw per-step
        # deltas, so the estimate must be in the ground-truth frame first
        # — and at metric scale for monocular runs).
        from sift_tpu.eval.ate import (rpe_rmse, rpe_rmse_poses,
                                       poses_from_Rt, umeyama_alignment)
        est = np.asarray(pipe.positions(), np.float64)
        gt64 = np.asarray(gt, np.float64)
        s, R, t = umeyama_alignment(est, gt64, with_scale=not metric)
        est_aligned = (s * (R @ est.T)).T + t
        ate = ate_rmse(est_aligned, gt64, align=False)
        kind = "se3" if metric else "sim3"
        print(f"ATE RMSE ({kind}-aligned): {ate:.4f} m")
        gtT = seq.gt_poses() if hasattr(seq, "gt_poses") else None
        if gtT is not None:
            # True TUM/evo RPE from full poses (alignment-invariant up to
            # the monocular scale, which Umeyama supplies).
            Rs, ts = pipe.poses_Rt()
            estT = poses_from_Rt(Rs, ts)
            rpe = rpe_rmse_poses(estT, gtT, delta=1, scale=s)
            print(f"RPE RMSE (TUM, delta=1): {rpe:.4f} m")
        else:
            rpe = rpe_rmse(est_aligned, gt64, delta=1)
            print(f"RPE RMSE (position-delta, delta=1, {kind}-aligned): "
                  f"{rpe:.4f} m")
    if args.traj:
        if getattr(args, "traj_format", "xyz") == "tum":
            from sift_tpu.io.trajectory import save_tum
            Rs, ts = pipe.poses_Rt()
            stamps = [f.timestamp for f in seq][:ts.shape[0]]
            save_tum(args.traj, Rs, ts, timestamps=stamps)
        else:
            np.savetxt(args.traj, pipe.positions())
        print(f"wrote {args.traj}")
    if args.plot:
        from sift_tpu.io.viz import plot_trajectory
        plot_trajectory(pipe.positions(), gt, path=args.plot,
                        title=f"{seq.name} trajectory")
        print(f"wrote {args.plot}")
    if getattr(args, "ply", None):
        from sift_tpu.io.trajectory import save_ply
        lms = pipe.landmarks
        finite = np.isfinite(lms).all(axis=1)
        save_ply(args.ply, lms[finite])
        print(f"wrote {args.ply} ({int(finite.sum())} points)")
    return 0


def cmd_bench(args) -> int:
    import subprocess

    return subprocess.call([sys.executable, "bench.py"])


def build_parser() -> argparse.ArgumentParser:
    top = argparse.ArgumentParser(
        prog="sift-tpu",
        description="TPU-native SIFT / SfM / SLAM framework "
                    "(reference-compatible CLI)")
    sub = top.add_subparsers(dest="command")

    pe = sub.add_parser("extract", help="extract SIFT keypoints (reference-compatible)")
    _add_reference_flags(pe)
    pe.set_defaults(func=cmd_extract)

    pm = sub.add_parser("match", help="extract + match two images")
    pm.add_argument("image_a")
    pm.add_argument("image_b")
    pm.add_argument("--ratio", type=float, default=0.8)
    pm.add_argument("--match-impl", choices=("auto", "xla", "pallas", "ivf"),
                    default="auto",
                    help="top-2 backend: auto switches to the streaming "
                         "Pallas kernel above 4096^2 pairs on TPU "
                         "(kernels/pallas/match.py); ivf = approximate "
                         "IVF-Flat index (matching/ann.py)")
    pm.add_argument("--viz", help="write side-by-side match visualization")
    _add_reference_flags(pm)
    # Parity-mode descriptors are degenerate BY SPEC (the reference's
    # all-bin-0 histograms can't discriminate); matching subcommands
    # therefore default to the correct lowe pipeline. `extract` keeps the
    # parity default — it mirrors the reference executable.
    pm.set_defaults(func=cmd_match, mode="lowe")

    pt = sub.add_parser("twoview", help="relative pose between two frames")
    pt.add_argument("image_a")
    pt.add_argument("image_b")
    pt.add_argument("--ratio", type=float, default=0.8)
    pt.add_argument("--threshold", type=float, default=2.0)
    pt.add_argument("--fx", type=float)
    pt.add_argument("--fy", type=float)
    pt.add_argument("--cx", type=float)
    pt.add_argument("--cy", type=float)
    _add_reference_flags(pt)
    pt.set_defaults(func=cmd_twoview, mode="lowe")   # see `match` note

    ps = sub.add_parser("sfm", help="incremental SfM over a sequence")
    ps.add_argument("path", help="sequence directory (TUM) or dataset root (KITTI)")
    ps.add_argument("--format", choices=("tum", "kitti"), default="tum")
    ps.add_argument("--sequence", default="00", help="KITTI sequence id")
    ps.add_argument("--max-frames", type=int)
    ps.add_argument("--stride", type=int, default=1)
    ps.add_argument("--metrics", help="JSONL metrics output path")
    ps.add_argument("--no-depth", action="store_true",
                    help="ignore TUM depth maps (pure monocular)")
    ps.add_argument("--batch", type=int, default=8,
                    help="frontend extraction batch size (1 = per-frame)")
    ps.add_argument("--stereo", action="store_true",
                    help="KITTI: use image_1 for stereo depth (metric scale)")
    ps.add_argument("--traj", help="write trajectory positions to this file")
    ps.add_argument("--traj-format", choices=["xyz", "tum"], default="xyz",
                    help="trajectory file dialect: bare xyz rows, or the "
                         "TUM grammar (ts tx ty tz qx qy qz qw; "
                         "evo-compatible)")
    ps.add_argument("--plot", help="write a top-down trajectory plot (png)")
    ps.add_argument("--ply", help="write the sparse landmark map as an "
                                  "ASCII PLY point cloud")
    ps.add_argument("--verbose", action="store_true")
    # Performance / SLAM options (round 2).
    ps.add_argument("--chunked", action="store_true",
                    help="device-resident chunked tracking (one scan "
                         "dispatch per extraction batch)")
    ps.add_argument("--ba-async", action="store_true",
                    help="deferred (asynchronous) window BA")
    ps.add_argument("--loop-closure", action="store_true",
                    help="enable covisibility-gated loop closure + "
                         "pose-graph optimization")
    ps.add_argument("--sim3", action="store_true",
                    help="Sim(3) pose graph (monocular scale-drift "
                         "correction; implies --loop-closure)")
    ps.add_argument("--window", type=int, default=None,
                    help="sliding BA window size (keyframes)")
    ps.add_argument("--compact-every", type=int, default=0, metavar="N",
                    help="drop orphaned landmark rows every N keyframe "
                         "promotions (map maintenance; 0 = off)")
    ps.add_argument("--global-ba", action="store_true",
                    help="run full-map bundle adjustment after the "
                         "sequence (final offline refinement)")
    ps.set_defaults(func=cmd_sfm)

    pb = sub.add_parser("bench", help="run the benchmark")
    pb.set_defaults(func=cmd_bench)
    return top


def main(argv=None) -> int:
    import os
    # Persistent XLA compilation cache: the extractor is a large program and
    # cold compiles take minutes; warm runs load from disk.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    argv = list(sys.argv[1:] if argv is None else argv)
    # Reference compatibility: a bare image path (or --img usage) with no
    # subcommand behaves like the reference binary, i.e. `extract`.
    if not argv or (argv[0] not in SUBCOMMANDS
                    and argv[0] not in ("-h", "--help")):
        argv = ["extract"] + argv
    args = build_parser().parse_args(argv)
    if not hasattr(args, "func"):
        build_parser().print_help()
        return 1
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
