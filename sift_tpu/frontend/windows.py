"""Shared per-keypoint gradient windows (the frontend's hot-path redesign).

TPU microbenchmarks (v5e, 512 keypoints, one octave): a bilinear gather of
256 rotated samples through 3-D advanced indexing costs ~14 ms per map;
a vmapped `dynamic_slice` of a contiguous 64x64 window costs ~2 ms for BOTH
gradient maps. So the orientation and descriptor stages share ONE window
fetch per keypoint and do everything else as dense VPU/MXU math on the
windows:

  * orientation: 36-bin histogram over the central 16x16 of the window
    (one-hot einsum, circular smoothing, top-2 parabola-refined peaks);
  * descriptor: scatter-style trilinear accumulation — every window pixel
    computes its rotated descriptor-frame coordinates and soft-assigns
    (4-cell-x, 4-cell-y, 8-orientation) weights; the 128-D histogram is one
    einsum contraction over window pixels. No gathers anywhere.

Window radius is static. Pixels outside a keypoint's descriptor support get
zero weight from the spatial tent functions, so the clamped (never
out-of-bounds) windows need no masking; support truncation only affects the
largest-scale keypoints (weight < e^-2 beyond the window corner).

The window FETCH has a Pallas fast path (`kernels/pallas/windows.py`,
selected by `SiftConfig.pallas`): measured 5.9x faster than the vmapped
`dynamic_slice` on v5e (0.147 ms vs 0.869 ms, 512 kp at 600x488) by
replacing K tiny slice programs with one kernel — double-buffered
tile-exact band DMAs, a VPU lane roll for column alignment, and an MXU
one-hot matmul for the sub-tile row selection, bit-exact vs this path.
(The r1 negative result stands for the *naive* formulation: lane-slicing
48-wide windows forces 256-wide masked bands; tile-aligned DMAs plus
roll/shift-selection are what make the kernel win.) The histogram /
descriptor math stays in XLA either way — it is dense VPU/MXU work that
fuses well.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sift_tpu.config import SiftConfig
from sift_tpu.frontend.orientation import _circular_smooth, peaks_from_histogram

R_DESC = 24        # window radius -> 48x48 windows
R_ORI = 8          # orientation uses the central 16x16
CELLS = 4
BINS = 8


def _use_pallas(mode: str, radius: int) -> bool:
    """Resolve SiftConfig.pallas to a concrete choice at trace time."""
    if mode == "off" or (2 * radius) % 8 != 0:
        return False
    if mode == "on":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def gather_gradient_windows(dx_maps: jnp.ndarray, dy_maps: jnp.ndarray,
                            gl: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray,
                            radius: int = R_DESC, pallas: str = "auto",
                            dtype: str = "float32"):
    """One contiguous (2, 2r, 2r) slice per keypoint from stacked gradients.

    dx_maps/dy_maps: (L, H, W). gl: (K,) level; y, x: (K,) float positions.
    Returns (gx (K, 2r, 2r), gy (K, 2r, 2r), oy0, ox0) where (oy0, ox0) are
    the float offsets of window pixel (0, 0) from the true keypoint centre
    (windows always come back float32).

    `pallas`: "auto" | "on" | "off" — the Pallas fetch kernel is bit-exact
    vs the XLA path (module docstring has the measured comparison).
    `dtype`: "bfloat16" fetches through bf16 maps — halves the stage's HBM
    bytes; the selection stays exact (the quantization happens ONCE at the
    map cast, identically on both fetch paths). Requires 2r % 16 == 0
    (bf16 sublane tiling); other radii silently stay f32.
    """
    L, H, W = dx_maps.shape
    d = 2 * radius
    if dtype == "bfloat16" and d % 16 == 0:
        dx_maps = dx_maps.astype(jnp.bfloat16)
        dy_maps = dy_maps.astype(jnp.bfloat16)
    stacked = jnp.stack([dx_maps, dy_maps])            # (2, L, H, W)
    yi = jnp.clip(y.astype(jnp.int32), radius, max(H - radius, radius))
    xi = jnp.clip(x.astype(jnp.int32), radius, max(W - radius, radius))
    yi = jnp.minimum(yi, max(H - radius, radius))
    xi = jnp.minimum(xi, max(W - radius, radius))

    if _use_pallas(pallas, radius) and H >= d and W >= d:
        from sift_tpu.kernels.pallas.windows import gather_windows_pallas
        # "on" off-TPU runs the (slow) interpreter — test-only escape hatch.
        interp = jax.devices()[0].platform != "tpu"
        wins = gather_windows_pallas(stacked, gl, yi - radius, xi - radius,
                                     radius, interp)   # (K, 2, d, d)
        gx = wins[:, 0]
        gy = wins[:, 1]
    else:
        def one(l, yy, xx):
            return lax.dynamic_slice(stacked,
                                     (0, l, yy - radius, xx - radius),
                                     (2, 1, d, d))

        wins = jax.vmap(one)(gl, yi, xi)               # (K, 2, 1, d, d)
        gx = wins[:, 0, 0]
        gy = wins[:, 1, 0]
    oy0 = yi.astype(jnp.float32) - radius - y          # offset of pixel (0,*)
    ox0 = xi.astype(jnp.float32) - radius - x
    return (gx.astype(jnp.float32), gy.astype(jnp.float32), oy0, ox0)


def orientation_from_windows(gx, gy, oy0, ox0, sigma_within, in_bounds,
                             cfg: SiftConfig, max_peaks: int = 2):
    """36-bin orientation histogram + top-`max_peaks` refined peaks.

    gx/gy: (K, d, d) windows. Uses the central (2*R_ORI)^2 region. Returns
    (orientations_deg (K, P), peak_valid (K, P)).
    """
    K, d, _ = gx.shape
    c0 = d // 2 - R_ORI
    c1 = d // 2 + R_ORI
    sgx = gx[:, c0:c1, c0:c1].reshape(K, -1)
    sgy = gy[:, c0:c1, c0:c1].reshape(K, -1)
    mag = jnp.sqrt(sgx * sgx + sgy * sgy)
    ang = jnp.mod(jnp.degrees(jnp.arctan2(sgy, sgx)) + 360.0, 360.0)

    rows = jnp.arange(2 * R_ORI, dtype=jnp.float32) + c0
    oy = oy0[:, None, None] + rows[None, :, None]
    ox = ox0[:, None, None] + rows[None, None, :]
    sw = 1.5 * sigma_within
    wgt = jnp.exp(-(ox * ox + oy * oy).reshape(K, -1)
                  / (2.0 * sw * sw)[:, None])

    # one-hot histogram (K, 256, 36) -> (K, 36): MXU-friendly contraction
    bin_idx = jnp.clip((ang / 10.0).astype(jnp.int32), 0, 35)
    onehot = jax.nn.one_hot(bin_idx, 36, dtype=mag.dtype)
    hist = jnp.einsum("kp,kpb->kb", mag * wgt, onehot)
    hist = _circular_smooth(hist, passes=2)
    hist = jnp.where(in_bounds[:, None], hist, 0.0)
    return peaks_from_histogram(hist, max_peaks, cfg.ori_peak_rel)


def descriptors_from_windows(gx, gy, oy0, ox0, orientation_deg,
                             sigma_within, cfg: SiftConfig) -> jnp.ndarray:
    """Scatter-style 128-D descriptors from shared windows.

    gx/gy: (K, d, d); orientation_deg, sigma_within: (K,). Returns (K, 128)
    L2-normalized, clamped, renormalized (Lowe 2004 §6.1).
    """
    K, d, _ = gx.shape
    P = d * d
    fgx = gx.reshape(K, P)
    fgy = gy.reshape(K, P)
    mag = jnp.sqrt(fgx * fgx + fgy * fgy)
    ang = jnp.degrees(jnp.arctan2(fgy, fgx))

    rows = jnp.arange(d, dtype=jnp.float32)
    oy = (oy0[:, None, None] + rows[None, :, None]
          + jnp.zeros((1, 1, d))).reshape(K, P)
    ox = (ox0[:, None, None] + rows[None, None, :]
          + jnp.zeros((1, d, 1))).reshape(K, P)

    theta = jnp.deg2rad(orientation_deg)
    cos_t = jnp.cos(theta)[:, None]
    sin_t = jnp.sin(theta)[:, None]
    hist_width = jnp.maximum(3.0 * sigma_within, 1e-3)[:, None]

    # rotated descriptor-frame coordinates in cell units
    u = (ox * cos_t + oy * sin_t) / hist_width
    v = (-ox * sin_t + oy * cos_t) / hist_width

    # Gaussian window over the descriptor frame (sigma = half width)
    wsig = 0.5 * CELLS
    w = mag * jnp.exp(-(u * u + v * v) / (2.0 * wsig * wsig))

    # spatial tent weights to the 4 cell centres per axis
    cell_centers = jnp.arange(CELLS, dtype=jnp.float32) - (CELLS - 1) / 2.0
    tu = jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - cell_centers))
    tv = jnp.maximum(0.0, 1.0 - jnp.abs(v[..., None] - cell_centers))

    # soft orientation binning to the 2 nearest of 8 bins
    rel = jnp.mod(ang - orientation_deg[:, None], 360.0)
    ob = rel / (360.0 / BINS) - 0.5
    b0 = jnp.floor(ob)
    frac = ob - b0
    bins_iota = jnp.arange(BINS, dtype=jnp.int32)
    b0i = jnp.mod(b0.astype(jnp.int32), BINS)
    b1i = jnp.mod(b0i + 1, BINS)
    ooh = ((b0i[..., None] == bins_iota) * (1.0 - frac)[..., None]
           + (b1i[..., None] == bins_iota) * frac[..., None])
    ooh = ooh * w[..., None]                             # (K, P, 8)

    # bf16 operands halve VPU/MXU cycles; f32 accumulation keeps the
    # histogram sums accurate (descriptors are normalized anyway).
    # (Negative result, r3: pre-fusing tu x ooh into a (K, P, 32) operand
    # is 2.3x faster ON THE CONTRACTION microbench, but the stage is
    # elementwise-bound so the end-to-end win was ~0.2 ms — and the extra
    # bf16 rounding of the fused operand shifts descriptor low bits
    # enough to flip knife-edge matching scenarios. Not worth it.)
    desc = jnp.einsum("kpa,kpb,kpo->kabo",
                      tv.astype(jnp.bfloat16), tu.astype(jnp.bfloat16),
                      ooh.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)  # (K, 4, 4, 8)
    desc = desc.reshape(K, CELLS * CELLS * BINS)
    return _finalize_descriptor(desc, cfg)


def _finalize_descriptor(desc: jnp.ndarray, cfg: SiftConfig) -> jnp.ndarray:
    """L2-normalize + clamp + renormalize (Lowe 2004 §6.1) or RootSIFT.

    Shared tail of the XLA and Pallas descriptor paths; `desc` is the raw
    (..., 128) trilinear histogram."""
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-7)
    desc = jnp.minimum(desc, cfg.descriptor_max_component)
    if cfg.rootsift:
        # RootSIFT (Arandjelovic & Zisserman 2012): L1-normalize + sqrt,
        # so L2 distance between descriptors equals the Hellinger kernel
        # — materially better matching on repetitive texture for free.
        # Components are non-negative by construction (histogram mass).
        s = jnp.sum(desc, axis=-1, keepdims=True)
        return jnp.sqrt(desc / jnp.maximum(s, 1e-7))
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    return desc / jnp.maximum(norm, 1e-7)


def descriptors_from_windows_multi(gx, gy, oy0, ox0, peak_oris,
                                   sigma_within, cfg: SiftConfig,
                                   pallas: str = "auto") -> jnp.ndarray:
    """Descriptors for ALL orientation peaks of each keypoint: (K, P, 128).

    peak_oris: (K, P) degrees. On TPU (or `pallas="on"`) this runs the
    VMEM-resident Pallas accumulation kernel
    (`kernels/pallas/descriptor.py`) — windows are read from HBM once for
    both peaks and none of the (K, d*d, ·) soft-assignment operands are
    materialized (the measured HBM-bandwidth wall of the XLA path).
    Falls back to one `descriptors_from_windows` pass per peak.
    """
    K, d, _ = gx.shape
    P = peak_oris.shape[1]
    from sift_tpu.kernels.pallas.descriptor import N_PEAKS
    if P == N_PEAKS and _use_pallas(pallas, d // 2):
        from sift_tpu.kernels.pallas.descriptor import (
            descriptor_accumulate_pallas)
        interp = jax.devices()[0].platform != "tpu"
        Kp = -(-K // 128) * 128
        padk = lambda a: jnp.pad(a, ((0, Kp - K),) + ((0, 0),) *
                                 (a.ndim - 1))
        # mag/angle in XLA (fuses with the kernel-layout transpose; Mosaic
        # has no atan2) — bit-identical bin maths to the XLA path.
        fgx = gx.reshape(K, d * d)
        fgy = gy.reshape(K, d * d)
        mag = jnp.sqrt(fgx * fgx + fgy * fgy)
        a45 = jnp.degrees(jnp.arctan2(fgy, fgx)) * (1.0 / 45.0)
        magT = padk(mag).T                       # (P, Kp)
        a45T = padk(a45).T
        hw = jnp.maximum(3.0 * sigma_within, 1e-3)
        theta = jnp.deg2rad(peak_oris)
        rows = [oy0, ox0, 1.0 / hw]
        for pk in range(N_PEAKS):
            rows += [jnp.cos(theta[:, pk]), jnp.sin(theta[:, pk]),
                     peak_oris[:, pk] * (1.0 / 45.0)]
        scal = jnp.zeros((16, K), jnp.float32).at[:len(rows)].set(
            jnp.stack(rows))
        scal = jnp.pad(scal, ((0, 0), (0, Kp - K)))
        raw = descriptor_accumulate_pallas(magT, a45T, scal, d, interp)
        # (2*128, Kp) -> (K, 2, 128); row pk*128 + c matches the XLA
        # (K, 4, 4, 8) -> (K, 128) reshape.
        desc = raw.reshape(N_PEAKS, 128, Kp).transpose(2, 0, 1)[:K]
        return _finalize_descriptor(desc, cfg)
    return jnp.stack([descriptors_from_windows(
        gx, gy, oy0, ox0, peak_oris[:, p], sigma_within, cfg)
        for p in range(P)], axis=1)
