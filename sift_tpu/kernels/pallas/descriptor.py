"""Pallas TPU kernel: VMEM-resident SIFT descriptor accumulation.

The XLA descriptor stage (`frontend/windows.py::descriptors_from_windows`)
is HBM-BANDWIDTH-bound, not FLOP-bound (r4 measurement set): XLA
materializes the soft-assignment operands — tents tu/tv (K, 2304, 4),
orientation one-hots (K, 2304, 8), and the pairwise (K, 2304, 16) product
feeding the einsum — ~300 KB of HBM traffic per keypoint-peak against a
theoretical floor of ~18 KB (the gradient windows in, 128 floats out). At
the SLAM chunk shapes (B=16, cap 384, 2 peaks) that is ~45% of the whole
extract program.

This kernel computes the full descriptor accumulation with every
intermediate resident in VMEM:

  * layout (P, K): PIXELS on sublanes, KEYPOINTS on lanes — all 128 lanes
    carry real keypoints, the contraction over pixels is a sublane
    reduction, and the 256 outputs x 128 keypoints of a grid step form
    clean (256, 128) output tiles;
  * grid (K/128, P/PC): pixel chunks of PC rows accumulate into the same
    output block (the out index_map ignores the pixel-chunk coordinate, so
    the block stays resident across the inner grid sweep);
  * BOTH orientation peaks of a keypoint ride one kernel call — the
    windows are read from HBM once (the XLA path reads them per peak) and
    the peak-invariant preamble (magnitude, atan2) computes once;
  * per (a, b, o) bin the contraction is `sum(sab * q_o, axis=0)` — a
    multiply + sublane-tree reduction per output, the dense-MAC minimum
    for this accumulation (the per-keypoint (16, 2304) x (2304, 8) matmul
    formulation caps the MXU at <1% utilization — r4 negative result, so
    the VPU does the reduction instead).

Math is exactly `descriptors_from_windows` up to float associativity: the
XLA path rounds the einsum operands to bf16 (its accumulation error is
~1e-3 on normalized descriptors), this kernel stays f32 throughout, so
outputs agree to bf16-rounding tolerance, not bitwise.
(Replaces the descriptor stage of the C++ reference, sift.cpp:60-128, with
the correct-Lowe math of the lowe path.)

Used via `frontend/windows.py::descriptors_from_windows_multi`; equivalence
vs the XLA path is asserted in tests/unit/test_pallas_descriptor.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CELLS = 4
BINS = 8
N_PEAKS = 2
_CC = [-1.5, -0.5, 0.5, 1.5]          # cell centres, (CELLS-1)/2 spacing


def _desc_kernel(d: int, scal_ref, mag_ref, a45_ref, out_ref):
    """Grid step (i, j): accumulate pixel chunk j into keypoint tile i.

    scal_ref: (16, LANES) per-keypoint scalars —
      rows 0..2: oy0, ox0, 1/hist_width
      rows 3..5: cos/sin/ori45 of peak 0;  rows 6..8: same for peak 1.
    mag_ref/a45_ref: (PC, LANES) — pixel-major transposed gradient
    magnitude and angle/45deg (Mosaic has no atan2 lowering, and doing
    mag/angle in the XLA preamble keeps the bin maths bit-identical to
    the XLA descriptor path; the preamble fuses with the transpose the
    kernel layout needs anyway).
    out_ref: (N_PEAKS*128, LANES) accumulator (revisited across j).
    """
    j = pl.program_id(1)
    PC = mag_ref.shape[0]

    mag = mag_ref[...]
    ang45 = a45_ref[...]

    pidx = j * PC + lax.broadcasted_iota(jnp.int32, (PC, LANES), 0)
    rowf = (pidx // d).astype(jnp.float32)
    colf = (pidx % d).astype(jnp.float32)
    oy = scal_ref[0:1, :] + rowf                 # (PC, LANES)
    ox = scal_ref[1:2, :] + colf
    inv_hw = scal_ref[2:3, :]

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for pk in range(N_PEAKS):
        cos_t = scal_ref[3 + 3 * pk:4 + 3 * pk, :]
        sin_t = scal_ref[4 + 3 * pk:5 + 3 * pk, :]
        ori45 = scal_ref[5 + 3 * pk:6 + 3 * pk, :]

        u = (ox * cos_t + oy * sin_t) * inv_hw
        v = (oy * cos_t - ox * sin_t) * inv_hw
        # Gaussian window, sigma = CELLS/2 = 2 cells -> factor 1/8.
        w = mag * jnp.exp((u * u + v * v) * -0.125)

        # Orientation soft-binning: rel bin coord in [0, 8) then the
        # half-bin shift; b0/b1 are the two adjacent bins.
        dd = ang45 - ori45
        rel = dd - 8.0 * jnp.floor(dd * 0.125)
        ob = rel - 0.5
        b0f = jnp.floor(ob)                      # in {-1 .. 7}
        frac = ob - b0f
        b0m = jnp.where(b0f < 0.0, b0f + 8.0, b0f)
        b1m = jnp.where(b0m >= 7.0, b0m - 7.0, b0m + 1.0)
        wf = w * frac
        w1f = w - wf                             # w * (1 - frac)
        qs = [jnp.where(b0m == o, w1f, 0.0) + jnp.where(b1m == o, wf, 0.0)
              for o in range(BINS)]

        tubs = [jnp.maximum(0.0, 1.0 - jnp.abs(u - c)) for c in _CC]
        rows = []
        for a in range(CELLS):
            tva = jnp.maximum(0.0, 1.0 - jnp.abs(v - _CC[a]))
            for b in range(CELLS):
                sab = tva * tubs[b]
                for o in range(BINS):
                    rows.append(jnp.sum(sab * qs[o], axis=0,
                                        keepdims=True))      # (1, LANES)
        blk = jnp.concatenate(rows, axis=0)      # (128, LANES)
        out_ref[pk * 128:(pk + 1) * 128, :] += blk


@functools.partial(jax.jit, static_argnums=(3, 4))
def descriptor_accumulate_pallas(magT: jnp.ndarray, a45T: jnp.ndarray,
                                 scal: jnp.ndarray, d: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """Raw (unnormalized) descriptor histograms for both peaks.

    magT/a45T: (P, Kp) pixel-major transposed gradient magnitude and
    degrees(atan2(gy, gx))/45, P = d*d, Kp a multiple of 128. scal:
    (16, Kp) packed per-keypoint scalars (see `_desc_kernel`). Returns
    (N_PEAKS*128, Kp) f32 — row pk*128 + a*32 + b*8 + o matches
    `descriptors_from_windows`' (K, 4, 4, 8) reshape.
    """
    P, Kp = magT.shape
    assert P == d * d and Kp % LANES == 0, (P, d, Kp)
    # Pixel chunks: bound VMEM residency (~10 live (PC, 128) f32 buffers);
    # 576 rows ~ 0.3 MB each. P is d*d with d a multiple of 8, so P is a
    # multiple of 64; chunks of <=576 that divide P always exist.
    PC = P
    for cand in (576, 512, 384, 288, 256, 192, 144, 128, 96, 72, 64):
        if P % cand == 0:
            PC = cand
            break
    grid = (Kp // LANES, P // PC)

    flops = Kp * P * (2 * N_PEAKS * 128 + 100)
    out = pl.pallas_call(
        functools.partial(_desc_kernel, d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, LANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PC, LANES), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PC, LANES), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_PEAKS * 128, LANES), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_PEAKS * 128, Kp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * P * Kp * 4 + 256 * Kp * 4,
            transcendentals=2 * P * Kp),
        interpret=interpret,
    )(scal, magT, a45T)
    return out
