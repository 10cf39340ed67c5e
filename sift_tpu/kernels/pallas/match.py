"""Pallas TPU kernel: streaming masked top-2 nearest descriptors.

The XLA matcher (`matching/matcher.py`) materializes the full (Na, Nb)
squared-distance matrix in HBM and re-reads it for min / argmin / one-hot
second-best / reverse argmin. At SLAM capacities (<=2048^2) that matrix is
VMEM-sized and XLA fuses everything — the matmul dominates and a kernel
cannot win. At place-recognition / offline-matching scale (16k-64k
descriptors per side) the score matrix is 1-16 GB: writing it once and
reading it three times makes the stage memory-bound at ~5x the matmul's
compute time.

This kernel never materializes the matrix. It tiles the distance
computation over a (rows, cols) grid — one (TA, D) x (D, TB) MXU matmul
per step — and reduces each (TA, TB) tile to its per-row masked top-2
(best distance, second-best distance, global index of the best column)
before anything leaves VMEM; only the (Na, Nb/TB) per-tile partials are
written, each output block exactly once, and a tiny XLA reduction merges
them. HBM traffic drops from O(Na*Nb*4) to
O(Na*D + (Na/TA)*Nb*D + 3*Na*Nb/TB) bytes; the stage returns to
compute-bound. The Lowe ratio / mutual / compaction logic downstream
operates on (Na,)-vectors and stays in XLA.

Masking uses the same +1e30 convention as the XLA path, folded into the
norm terms: an = |a|^2 + (1-valid_a)*BIG, bn likewise, so
d = max(an + bn - 2 a.b, 0) reproduces
`pairwise_sqdist` + validity masking in one expression (for valid pairs
the clamp is identical; invalid pairs saturate to ~1e30, and float32
spacing at 1e30 absorbs the real distance exactly as the XLA `where`
does for every comparison downstream).

Tie-breaking matches `jnp.argmin` (first occurrence): within a tile the
argmin is computed as the smallest column index attaining the min, and the
cross-tile merge keeps the earlier tile on ties (strict `<`).

The mutual-nearest check needs the reverse direction's argmin; the caller
runs the kernel twice with sides swapped — at these scales the stage is
compute-bound and the second pass still leaves the total far below the
XLA formulation's memory time.

Reference behavior being accelerated: `matcher.match_descriptors`
(no analog in /root/reference — matching is a north-star component,
SURVEY.md §2.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = jnp.float32(1e30)
LANES = 128


def _top2_kernel(TB: int, a_ref, an_ref, b_ref, bn_ref,
                 best_ref, second_ref, arg_ref):
    """Grid step (i, j): per-tile top-2 of tile (i, j)'s distances.

    a_ref (TA, D), an_ref (1, TA): row descriptors + masked norms.
    b_ref (TB, D), bn_ref (TB, 1): column tile + masked norms.
    best/second (1, 1, TA) f32, arg (1, 1, TA) i32 — the (j, i) block of
    the TRANSPOSED (nj, 1, Na) partials; every output block is written
    EXACTLY ONCE — the cross-tile merge happens in XLA afterwards. The
    earlier design accumulated into out blocks revisited across the j
    sweep — correct Pallas, but the tunneled axon runtime intermittently
    fails to re-execute such programs (INVALID_ARGUMENT on the second
    run of any scanned/unrolled chain); write-once blocks sidestep that
    entirely and cost only 3*Na*nj*4 bytes of extra HBM.

    The distance tile is computed TRANSPOSED, (TB, TA) = b @ a.T: the
    top-2/argmin reductions then run along the SUBLANE axis (cheap
    per-lane VPU folds) instead of the lane axis (log-shuffle per 8x128
    block), and their (1, TA) results are already lane-major for the
    output blocks. The lane-major variant measured 7.9 ms per 16k x 16k
    pass on v5e vs 3.5 ms for the bare matmul — the reduction epilogue
    was most of the kernel.
    """
    j = pl.program_id(1)

    ab = jnp.dot(b_ref[:], a_ref[:].T,
                 preferred_element_type=jnp.float32)        # (TB, TA) MXU
    d = jnp.maximum(bn_ref[:] + an_ref[:] - 2.0 * ab, 0.0)

    tbest = jnp.min(d, axis=0, keepdims=True)               # (1, TA)
    row = lax.broadcasted_iota(jnp.int32, d.shape, 0)
    # First B-row attaining the min == jnp.argmin tie semantics.
    targ = jnp.min(jnp.where(d <= tbest, row, TB), axis=0, keepdims=True)
    tsec = jnp.min(jnp.where(row == targ, jnp.float32(1e30), d),
                   axis=0, keepdims=True)
    best_ref[:] = tbest[None]
    second_ref[:] = tsec[None]
    arg_ref[:] = (targ + j * TB)[None]


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _top2_call(a, an, b, bn, TA: int, TB: int, interpret: bool):
    Na, D = a.shape
    Nb = b.shape[0]
    nj = Nb // TB
    grid = (Na // TA, nj)

    best_t, sec_t, arg_t = pl.pallas_call(
        functools.partial(_top2_kernel, TB),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TA, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TA), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        # 3-D partials (nj, 1, Na): the block's trailing dims (1, TA) are
        # (full-dim, lane-aligned) — a 2-D (nj, Na) layout would need a
        # (1, TA) block whose sublane size 1 neither divides 8 nor equals
        # nj, which Mosaic rejects.
        out_specs=[
            pl.BlockSpec((1, 1, TA), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TA), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TA), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nj, 1, Na), jnp.float32),
            jax.ShapeDtypeStruct((nj, 1, Na), jnp.float32),
            jax.ShapeDtypeStruct((nj, 1, Na), jnp.int32),
        ],
        interpret=interpret,
    )(a, an, b, bn)
    best_t, sec_t, arg_t = best_t[:, 0], sec_t[:, 0], arg_t[:, 0]

    # Cross-tile top-2 merge over the nj partials (tiny: (nj, Na)).
    # First tile attaining the global min keeps jnp.argmin tie semantics.
    j0 = jnp.argmin(best_t, axis=0)                          # (Na,)
    best = jnp.take_along_axis(best_t, j0[None, :], 0)[0]
    arg = jnp.take_along_axis(arg_t, j0[None, :], 0)[0]
    tile = lax.broadcasted_iota(jnp.int32, best_t.shape, 0)
    rest = jnp.where(tile == j0[None, :], jnp.float32(1e30), best_t)
    second = jnp.minimum(jnp.min(sec_t, axis=0), jnp.min(rest, axis=0))
    return best, second, arg


def _pad_rows(x: jnp.ndarray, n: int) -> jnp.ndarray:
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def streaming_top2(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
                   desc_b: jnp.ndarray, valid_b: jnp.ndarray,
                   interpret: bool = False):
    """Masked per-row (best, second, argbest) squared-L2 distances.

    Streaming-kernel equivalent of `matcher._top2_min` applied to
    `pairwise_sqdist(a, b)` with invalid rows/columns forced to ~1e30.
    Returns (best (Na,), second (Na,), best_idx (Na,)); rows whose best is
    >= 1e30 had no valid candidate (or were invalid themselves), matching
    the XLA path's `best < _BIG` convention. Distances of returned valid
    pairs agree with the XLA formulation up to matmul precision; indices
    agree exactly away from near-exact distance ties.

    `interpret=True` runs the Pallas interpreter (CPU tests).
    """
    Na, D = desc_a.shape
    Nb = desc_b.shape[0]
    assert D % LANES == 0, f"descriptor dim {D} must be lane-aligned"

    pen_a = jnp.where(valid_a, 0.0, _BIG).astype(jnp.float32)
    pen_b = jnp.where(valid_b, 0.0, _BIG).astype(jnp.float32)
    an = jnp.sum(desc_a * desc_a, axis=1) + pen_a            # (Na,)
    bn = jnp.sum(desc_b * desc_b, axis=1) + pen_b            # (Nb,)

    # Lane-aligned tiles (row dimension must respect the (8, 128) f32
    # tiling; 128-multiples keep the MXU fed and divide the padded sizes).
    TA = min(1024, -(-Na // LANES) * LANES)
    TB = min(512, -(-Nb // LANES) * LANES)
    Nap = -(-Na // TA) * TA
    Nbp = -(-Nb // TB) * TB
    a = _pad_rows(desc_a.astype(jnp.float32), Nap)
    b = _pad_rows(desc_b.astype(jnp.float32), Nbp)
    # Padded rows/columns are invalid: BIG norms keep them unselectable.
    an = _pad_rows(an, Nap) + jnp.where(
        jnp.arange(Nap) < Na, 0.0, _BIG)
    bn = _pad_rows(bn, Nbp) + jnp.where(
        jnp.arange(Nbp) < Nb, 0.0, _BIG)

    best, second, arg = _top2_call(a, an[None, :], b, bn[:, None],
                                   TA, TB, interpret)
    # A fully-masked row's argmin lands on a padded/BIG column; clamp into
    # range like the XLA argmin-over-all-BIG convention (index semantics
    # for such rows are unspecified but must be in-bounds).
    return best[:Na], second[:Na], jnp.clip(arg[:Na], 0, Nb - 1)
