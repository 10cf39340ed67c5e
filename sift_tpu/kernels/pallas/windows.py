"""Pallas TPU kernel: fused per-keypoint window gather from stacked maps.

The lowe frontend needs one contiguous (C, d, d) window per keypoint from a
channel-stacked map pyramid — gradient maps for orientation/descriptors
(C=2), DoG levels for refinement (C=L). The XLA formulation is a vmapped
`lax.dynamic_slice` — K independent tiny slice programs whose per-slice
dispatch overhead (~2-5 us on v5e) dominates the stage (~18 ms of a ~38 ms
batch at the r1 caps, BENCH.md).

Why the naive Pallas version lost (r1 negative result): Mosaic requires
VMEM/HBM slices to respect the (8, 128) f32 tiling — cutting a d=48-wide
window out of a row by lane slicing forces 256-wide masked bands (~5x VPU
work), and even the row DMA cannot start at an arbitrary y (the sublane
dimension is tiled by 8). The r2 kernel dodged both walls with full-width
row-band DMAs plus MXU one-hot shift-matmuls for row AND column selection;
profiling showed that version FLOP-bound: the (d, W) x (W, 128) f32
column-selection matmul at HIGHEST precision was ~0.7 us/window of MXU
work, and the full-width band DMA moved 2.5x more bytes than needed.

This version removes both costs:

  * the maps are re-laid out as (C, L, Wq, Hq, 8, 128) — BOTH the
    column-tile index (Wq) and the row-tile index (Hq) are untiled
    dimensions, so a double-buffered async DMA copies exactly the
    (C, 2, B8, 8, 128) band covering the window (2 column tiles span any
    d <= 128 window; B8 = d/8+1 row tiles cover any row misalignment)
    with data-dependent offsets Mosaic accepts;
  * columns: the two tiles concatenate to (B, 256) lanes and a dynamic
    LANE ROLL (`pltpu.roll`, VPU) aligns x0 to lane 0 — no column matmul
    at all; the [:, :128] keep-slice is tile-aligned;
  * rows: the <=7-row misalignment is one small one-hot matmul
    Rsel[i, j] = (j == y_off + i), (d, B) x (B, 128) at HIGHEST
    precision — each output element is exactly one product x * 1.0, so
    gathered values are bit-exact.

Per keypoint this is ~0.1 us of MXU work plus a ~100 KB DMA, with the next
keypoint's DMA overlapped behind the current selection (2-slot double
buffer, GROUP keypoints per grid step). Output is (K, C, d, 128)
lane-padded; the caller slices [..., :d], one cheap XLA copy.

Used by `frontend/windows.py::gather_gradient_windows` (C=2 gradient maps)
and `frontend/refine.py::_gather_local_patches` (DoG levels as channels);
equivalence with the XLA path is asserted in
tests/unit/test_pallas_windows.py (interpreter mode on CPU, real kernel on
TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 8          # f32 sublane tiling ((16, 128) for bf16 — see _subl)
GROUP = 8         # keypoints gathered per grid step (amortizes the fixed
                  # per-step cost; G band DMAs per step overlap the
                  # previous group's selection math via 2-slot buffering)
WB = 2            # column tiles per band: spans any d <= 128 window


def _subl(dtype) -> int:
    """Sublane tile height for the map dtype (Mosaic tiling: f32 (8, 128),
    bf16 (16, 128)). bf16 maps halve the band DMA and window-write bytes
    (r5: the fetch stage measured 62% of HBM peak; quality impact of bf16
    gradient maps measured nil — tools/diag_bf16_windows.py)."""
    return 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8


def _window_kernel(d: int, use_roll: bool, subl: int, gl_ref, y0_ref,
                   x0_ref, maps_ref, out_ref, scratch, sems):
    """Grid step k: gather GROUP keypoints' (C, d, d) windows.

    maps_ref: (C, L, Wq, Hq, subl, LANES) in HBM; scratch: (2 slots, GROUP,
    C, WB, B8, subl, LANES) VMEM; out_ref: (GROUP, C, d, LANES) VMEM block.
    """
    k = pl.program_id(0)
    n = pl.num_programs(0)
    C = scratch.shape[2]
    B8 = scratch.shape[4]                 # band height in subl-row tiles
    B = B8 * subl

    def dma(slot, g, kk):
        return pltpu.make_async_copy(
            maps_ref.at[:, gl_ref[kk],
                        pl.ds(x0_ref[kk] // LANES, WB),
                        pl.ds(y0_ref[kk] // subl, B8), :, :],
            scratch.at[slot, g],
            sems.at[slot, g],
        )

    # Warm-up: first grid step starts its own group's DMAs.
    @pl.when(k == 0)
    def _():
        for g in range(GROUP):
            dma(0, g, g).start()

    # Overlap: kick off the next group's band DMAs before blocking.
    @pl.when(k + 1 < n)
    def _():
        for g in range(GROUP):
            dma((k + 1) % 2, g, (k + 1) * GROUP + g).start()

    for g in range(GROUP):
        dma(k % 2, g, k * GROUP + g).wait()

    base = k * GROUP
    i_iota = lax.broadcasted_iota(jnp.int32, (d, B), 0)
    j_iota = lax.broadcasted_iota(jnp.int32, (d, B), 1)
    # Static per-keypoint loop (Mosaic has no multi-batch dot_general); the
    # fixed per-grid-step cost is amortized over GROUP keypoints.
    dt = out_ref.dtype
    f32 = jnp.float32
    for g in range(GROUP):
        y0g = y0_ref[base + g]
        x0g = x0_ref[base + g]
        y_off = y0g - (y0g // subl) * subl                   # [0, subl)
        x_off = x0g - (x0g // LANES) * LANES                 # [0, 128)
        rsel = (j_iota == y_off + i_iota).astype(f32)
        for m in range(C):
            band = scratch[k % 2, g, m]                # (WB, B8, subl, LANES)
            # Selection math runs in f32 regardless of the map dtype:
            # Mosaic's dynamic lane rotate is 32-bit only ("Rotate with
            # non-32-bit data" — measured on v5e), and bf16->f32 is an
            # exact upcast, so only the HBM band DMA (the bytes that
            # matter) stays at the narrow dtype.
            wide = jnp.concatenate([band[t].reshape(B, LANES)
                                    for t in range(WB)], axis=-1).astype(f32)
            if use_roll:
                # lane roll left by x_off: aligned[:, j] = wide[:, j + x_off]
                aligned = pltpu.roll(wide, WB * LANES - x_off, axis=1)
            else:  # interpreter fallback: one-hot column matmul (bit-exact)
                w_iota = lax.broadcasted_iota(jnp.int32, (WB * LANES,
                                                          WB * LANES), 0)
                c_iota = lax.broadcasted_iota(jnp.int32, (WB * LANES,
                                                          WB * LANES), 1)
                csel = (w_iota == x_off + c_iota).astype(f32)
                aligned = jnp.dot(wide, csel,
                                  preferred_element_type=jnp.float32,
                                  precision=lax.Precision.HIGHEST)
            # f32-accumulated one-hot: each output is exactly one product
            # x * 1.0 — the cast back to `dt` is exact for bf16 inputs.
            out_ref[g, m] = jnp.dot(rsel, aligned[:, :LANES],
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.HIGHEST
                                    ).astype(dt)


def _kernel_entry(d, use_roll, subl, gl_ref, y0_ref, x0_ref, maps_ref,
                  out_ref, scratch, sems):
    # out_ref block is (1, GROUP, C, d, LANES); drop the leading group axis.
    _window_kernel(d, use_roll, subl, gl_ref, y0_ref, x0_ref, maps_ref,
                   out_ref.at[0], scratch, sems)


@functools.partial(jax.jit, static_argnums=(4, 5))
def gather_windows_pallas(maps: jnp.ndarray, gl: jnp.ndarray,
                          y0: jnp.ndarray, x0: jnp.ndarray,
                          radius: int, interpret: bool = False):
    """(C, L, H, W) channel-stacked maps + (K,) level / top-left coords ->
    (K, C, d, d) windows, d = 2*radius (multiple of 8, at most 128). All C
    channels of level gl[k] are gathered at the same offset (the frontend
    passes C=2 gradient maps; refine passes the DoG levels as C channels
    with L=1).

    y0/x0 are the window's top-left corner (already clamped to
    [0, max(H-d, 0)] x [0, max(W-d, 0)] by the caller; windows larger than
    the image read zero padding, which the caller must never select).
    `interpret=True` runs the Pallas interpreter (CPU tests).
    """
    d = 2 * radius
    subl = _subl(maps.dtype)
    assert d % subl == 0, f"window size {d} must be a multiple of {subl}"
    assert d <= LANES, f"window size {d} must be <= {LANES}"
    K = gl.shape[0]
    C, L, H, W = maps.shape
    B8 = d // subl + 1                       # band covers any misalignment

    # Re-lay the maps out so BOTH band offsets land on untiled dimensions:
    # pad H to at least B8 row tiles plus one spare (the band DMA starting
    # at tile y0//subl never runs off the end), pad W to at least WB column
    # tiles plus one spare, then expose the tile indices:
    # (C, L, Wq, Hq, subl, 128). Padded rows/columns are never selected by
    # the caller's clamped coordinates.
    Hq = max(-(-H // subl) + 1, B8)
    Wq = max(-(-W // LANES) + 1, WB)
    mp = jnp.pad(maps, ((0, 0), (0, 0), (0, Hq * subl - H),
                        (0, Wq * LANES - W)))
    maps6 = mp.reshape(C, L, Hq, subl, Wq, LANES).transpose(0, 1, 4, 2, 3, 5)

    # Pad the keypoint list to a GROUP multiple (coords (0,0,0) are always
    # in-bounds; padded outputs are sliced off below).
    Kp = -(-K // GROUP) * GROUP
    pad = Kp - K
    gl = jnp.pad(gl.astype(jnp.int32), (0, pad))
    y0 = jnp.pad(y0.astype(jnp.int32), (0, pad))
    x0 = jnp.pad(x0.astype(jnp.int32), (0, pad))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Kp // GROUP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, GROUP, C, d, LANES),
                               lambda k, *_: (k, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, C, WB, B8, subl, LANES), maps.dtype),
            pltpu.SemaphoreType.DMA((2, GROUP)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel_entry, d, not interpret, subl),
        out_shape=jax.ShapeDtypeStruct((Kp // GROUP, GROUP, C, d, LANES),
                                       maps.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(gl, y0, x0, maps6)
    return out.reshape(Kp, C, d, LANES)[:K, :, :, :d]
