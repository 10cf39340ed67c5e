"""Pallas TPU kernel: fused per-keypoint gradient-window gather.

The lowe frontend needs one contiguous (2, d, d) window of the gradient
maps per keypoint (windows.py). The XLA formulation is a vmapped
`lax.dynamic_slice` — K independent tiny slice programs whose per-slice
dispatch overhead (~2-5 us on v5e) dominates the stage (~18 ms of a
~38 ms batch at the r1 caps, BENCH.md).

Why the naive Pallas version lost (r1 negative result): Mosaic requires
VMEM/HBM slices to respect the (8, 128) f32 tiling — cutting a d=48-wide
window out of a row by lane slicing forces 256-wide masked bands (~5x VPU
work), and even the row DMA cannot start at an arbitrary y (the sublane
dimension is tiled by 8). This kernel dodges both walls:

  * rows: the maps are passed reshaped to (2, L, H/8, 8, W) so the
    keypoint's 8-row-aligned band index lives on an UNTILED dimension —
    a double-buffered async DMA copies a (2, 7, 8, W) band (56 rows
    covering any 48-row window) with a data-dependent offset Mosaic
    accepts; the <=7-row misalignment is resolved by an MXU one-hot
    row-selection matmul (Rsel[i, j] = (j == y_off + i));
  * columns: the unaligned d-wide selection is a second MXU matmul with
    the shift matrix Csel[w, j] = (w == x0 + j) — the MXU does not care
    that 48 is not a multiple of 128.

One-hot f32 matmuls at HIGHEST precision reproduce the gathered values
bit-exactly (each output element is exactly one product x * 1.0).
Per keypoint this is ~11 MFLOP of shift-matmuls and a 56-row DMA — both
well under a microsecond on v5e — with the next keypoint's DMA overlapped
behind the current matmuls (2-slot double buffer). Output is
(K, 2, d, 128) lane-padded; the caller slices [..., :d], one cheap XLA
copy.

Used by `frontend/windows.py::gather_gradient_windows` when
`SiftConfig.pallas` resolves to on (TPU backends); equivalence with the
XLA path is asserted in tests/unit/test_pallas_windows.py (interpreter
mode on CPU, real kernel on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 8          # f32 sublane tiling
GROUP = 8         # keypoints gathered per grid step (amortizes the fixed
                  # per-step cost ~8x; G row-band DMAs per step overlap the
                  # previous group's shift-matmuls via 2-slot buffering)


def _window_kernel(d: int, gl_ref, y0_ref, x0_ref, maps_ref, out_ref,
                   scratch, sems):
    """Grid step k: gather GROUP keypoints' (2, d, d) windows.

    maps_ref: (2, L, Hq, 8, W) in HBM; scratch: (2 slots, GROUP, 2, B8, 8,
    W) VMEM; out_ref: (GROUP, 2, d, LANES) VMEM block for this group.
    """
    k = pl.program_id(0)
    n = pl.num_programs(0)
    B8 = scratch.shape[3]                      # band height in 8-row tiles
    W = scratch.shape[-1]
    B = B8 * SUBL

    def dma(slot, g, kk):
        return pltpu.make_async_copy(
            maps_ref.at[:, gl_ref[kk], pl.ds(y0_ref[kk] // SUBL, B8), :, :],
            scratch.at[slot, g],
            sems.at[slot, g],
        )

    # Warm-up: first grid step starts its own group's DMAs.
    @pl.when(k == 0)
    def _():
        for g in range(GROUP):
            dma(0, g, g).start()

    # Overlap: kick off the next group's row DMAs before blocking.
    @pl.when(k + 1 < n)
    def _():
        for g in range(GROUP):
            dma((k + 1) % 2, g, (k + 1) * GROUP + g).start()

    for g in range(GROUP):
        dma(k % 2, g, k * GROUP + g).wait()

    base = k * GROUP
    i_iota = lax.broadcasted_iota(jnp.int32, (d, B), 0)
    j_iota = lax.broadcasted_iota(jnp.int32, (d, B), 1)
    w_iota = lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
    c_iota = lax.broadcasted_iota(jnp.int32, (W, LANES), 1)
    # Static per-keypoint loop of plain 2-D matmuls (Mosaic has no
    # multi-batch dot_general); the win over the 1-kp/step version is the
    # amortized fixed per-grid-step cost and G DMAs in flight at once.
    for g in range(GROUP):
        y0g = y0_ref[base + g]
        y_off = y0g - (y0g // SUBL) * SUBL                   # [0, 8)
        rsel = (j_iota == y_off + i_iota).astype(jnp.float32)
        csel = (w_iota == x0_ref[base + g] + c_iota).astype(jnp.float32)
        band = scratch[k % 2, g].reshape(2, B, W)
        for m in range(2):
            rows = jnp.dot(rsel, band[m],
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)  # (d, W)
            out_ref[g, m] = jnp.dot(rows, csel,
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.HIGHEST)


def _kernel_entry(d, gl_ref, y0_ref, x0_ref, maps_ref, out_ref,
                  scratch, sems):
    # out_ref block is (1, GROUP, 2, d, LANES); drop the leading group axis.
    _window_kernel(d, gl_ref, y0_ref, x0_ref, maps_ref, out_ref.at[0],
                   scratch, sems)


@functools.partial(jax.jit, static_argnums=(4, 5))
def gather_windows_pallas(maps: jnp.ndarray, gl: jnp.ndarray,
                          y0: jnp.ndarray, x0: jnp.ndarray,
                          radius: int, interpret: bool = False):
    """(2, L, H, W) gradient maps + (K,) level / top-left coords ->
    (K, 2, d, d) windows, d = 2*radius (must be a multiple of 8).

    y0/x0 are the window's top-left corner (already clamped to
    [0, H-d] x [0, W-d] by the caller). `interpret=True` runs the Pallas
    interpreter (CPU tests).
    """
    d = 2 * radius
    assert d % SUBL == 0, f"window size {d} must be a multiple of {SUBL}"
    K = gl.shape[0]
    _, L, H, W = maps.shape
    B8 = d // SUBL + 1                       # band covers any misalignment

    # Pad H to a tile multiple plus one spare tile so the band DMA starting
    # at tile y0//8 never runs off the end, and W to the 128-lane tiling
    # (DMA slice extents must be lane-aligned); then expose the row-tile
    # dimension: (2, L, Hq, 8, Wp) — the band offset indexes the UNTILED
    # dim 2. Padded columns are never selected (x0 + j < W for j < d).
    Hq = -(-H // SUBL) + 1
    Wp = -(-W // LANES) * LANES
    maps5 = jnp.pad(maps, ((0, 0), (0, 0), (0, Hq * SUBL - H),
                           (0, Wp - W)))
    maps5 = maps5.reshape(2, L, Hq, SUBL, Wp)

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
        out_specs=pl.BlockSpec((1, GROUP, 2, d, LANES),
                               lambda k, *_: (k, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, 2, B8, SUBL, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, GROUP)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel_entry, d),
        out_shape=jax.ShapeDtypeStruct((Kp // GROUP, GROUP, 2, d, LANES),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(gl, y0, x0, maps5)
    return out.reshape(Kp, 2, d, LANES)[:K, :, :, :d]
