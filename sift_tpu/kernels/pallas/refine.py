"""Pallas TPU kernel: VMEM-resident iterative keypoint refinement walk.

The XLA lowe refinement (`frontend/refine.py::refine_octave_lowe`) runs
six `_local_lookup` passes (5 walk iterations + the final read), each
materializing fresh (K, 9, 256) one-hot selection operands in HBM — the
r5 roofline measured the stage at 28.8x its bytes floor (6.76 ms at SLAM
chunk shapes, the extractor's second-largest stage after descriptors).

This kernel keeps each keypoint's (3, 16, 16) DoG patch resident in VMEM
for the WHOLE walk (keypoints on lanes, patch cells on sublanes): every
stencil tap is a sublane-masked reduction, the 3x3 Taylor solve and the
step/clip/convergence logic are lane-wise VPU math, and only the final
27-value cube + walk state leave the chip (32 floats per keypoint). The
walk arithmetic is the same IEEE f32 op sequence as the XLA path, so the
steps — and therefore the final positions and cube values — are
bit-identical (asserted in tests/unit/test_pallas_refine.py).

Restriction: dogs_per_epoch == 3 (L == 3 DoG levels per octave, the
reference default), where the interior level index is pinned to 1 and
the scale axis never moves; other L fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
D = 16               # patch side (PATCH_D)
CELLS = D * D        # 256 sublane cells per level
N_ITERS = 5
N_OUT = 32           # 27 cube values + lx + ly + converged + 2 pad


def _taps(patch_ref, lx, ly):
    """27 stencil values at (ly+dy, lx+dx) per level: list [s][t] of
    (1, LANES) arrays; out-of-range taps read 0 (matches the XLA
    one-hot-miss semantics)."""
    iota = lax.broadcasted_iota(jnp.int32, (CELLS, LANES), 0)
    vals = []
    for s in range(3):
        sl = patch_ref[s * CELLS:(s + 1) * CELLS, :]
        row = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                idx = ((ly + dy) * D + (lx + dx)).astype(jnp.int32)
                m = (iota == idx).astype(jnp.float32)
                row.append(jnp.sum(sl * m, axis=0, keepdims=True))
        vals.append(row)
    return vals


def _grad_hess(v):
    """Lowe-mode gradient/Hessian from the 27 taps (component order
    (x, y, s) — same formulas as kernels/derivatives.py, cross_div=4)."""
    def p(s, dy, dx):
        return v[s][(dy + 1) * 3 + (dx + 1)]

    c = p(1, 0, 0)
    dx = (p(1, 0, 1) - p(1, 0, -1)) / 2.0
    dy = (p(1, 1, 0) - p(1, -1, 0)) / 2.0
    ds = (p(2, 0, 0) - p(0, 0, 0)) / 2.0
    dxx = p(1, 0, 1) + p(1, 0, -1) - 2.0 * c
    dyy = p(1, 1, 0) + p(1, -1, 0) - 2.0 * c
    dss = p(2, 0, 0) + p(0, 0, 0) - 2.0 * c
    dxy = (p(1, 1, 1) - p(1, 1, -1) - p(1, -1, 1) + p(1, -1, -1)) / 4.0
    dxs = (p(2, 0, 1) - p(2, 0, -1) - p(0, 0, 1) + p(0, 0, -1)) / 4.0
    dys = (p(2, 1, 0) - p(2, -1, 0) - p(0, 1, 0) + p(0, -1, 0)) / 4.0
    return (dx, dy, ds), (dxx, dyy, dss, dxy, dxs, dys)


def _solve_step(g, h, eps=1e-12):
    """off = H^{-1} (-g) via the adjugate — same formula order as
    `refine.solve3x3` so results match bitwise."""
    gx, gy, gs = g
    dxx, dyy, dss, dxy, dxs, dys = h
    # det of [[dxx,dxy,dxs],[dxy,dyy,dys],[dxs,dys,dss]]
    det = (dxx * (dyy * dss - dys * dys)
           - dxy * (dxy * dss - dys * dxs)
           + dxs * (dxy * dys - dyy * dxs))
    b0, b1, b2 = -gx, -gy, -gs
    adj00 = dyy * dss - dys * dys
    adj01 = dxs * dys - dxy * dss
    adj02 = dxy * dys - dxs * dyy
    adj10 = dys * dxs - dxy * dss
    adj11 = dxx * dss - dxs * dxs
    adj12 = dxs * dxy - dxx * dys
    adj20 = dxy * dys - dyy * dxs
    adj21 = dxy * dxs - dxx * dys
    adj22 = dxx * dyy - dxy * dxy
    ok = jnp.abs(det) > eps
    sd = jnp.where(ok, det, 1.0)
    off0 = (adj00 * b0 + adj01 * b1 + adj02 * b2) / sd
    off1 = (adj10 * b0 + adj11 * b1 + adj12 * b2) / sd
    off2 = (adj20 * b0 + adj21 * b1 + adj22 * b2) / sd
    return (off0, off1, off2), ok


def _refine_kernel(scal_ref, patch_ref, out_ref):
    """One keypoint tile: run the full 5-iteration walk in VMEM.

    scal_ref: (8, LANES) — rows lx0, ly0, lxmin, lxmax, lymin, lymax.
    patch_ref: (3*CELLS, LANES) — per-level flattened patches, transposed.
    out_ref: (N_OUT, LANES) — rows 0..26 = final cube (s, dy, dx order),
    27 = lx, 28 = ly, 29 = converged.
    """
    lx = scal_ref[0:1, :]
    ly = scal_ref[1:2, :]
    lxmin = scal_ref[2:3, :]
    lxmax = scal_ref[3:4, :]
    lymin = scal_ref[4:5, :]
    lymax = scal_ref[5:6, :]
    converged = jnp.zeros_like(lx)

    for _ in range(N_ITERS):
        v = _taps(patch_ref, lx, ly)
        g, h = _grad_hess(v)
        off, ok = _solve_step(g, h)
        off = tuple(jnp.where(ok, o, 0.0) for o in off)
        small = ((jnp.abs(off[0]) < 0.5) & (jnp.abs(off[1]) < 0.5)
                 & (jnp.abs(off[2]) < 0.5))
        move = (converged < 0.5) & jnp.logical_not(small)
        stepx = jnp.where(move, jnp.clip(jnp.round(off[0]), -1, 1), 0.0)
        stepy = jnp.where(move, jnp.clip(jnp.round(off[1]), -1, 1), 0.0)
        # level step exists but L==3 pins li to 1; x/y still walk.
        lx = jnp.clip(lx + stepx, lxmin, lxmax)
        ly = jnp.clip(ly + stepy, lymin, lymax)
        converged = jnp.maximum(converged, small.astype(jnp.float32))

    v = _taps(patch_ref, lx, ly)
    for s in range(3):
        for t in range(9):
            out_ref[s * 9 + t:s * 9 + t + 1, :] = v[s][t]
    out_ref[27:28, :] = lx
    out_ref[28:29, :] = ly
    out_ref[29:30, :] = converged
    out_ref[30:32, :] = jnp.zeros((2, LANES), jnp.float32)


@functools.partial(jax.jit, static_argnums=(2,))
def refine_walk_pallas(patchT: jnp.ndarray, scal: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """patchT: (3*CELLS, Kp) f32 transposed patches; scal: (8, Kp).
    Returns (N_OUT, Kp) — see `_refine_kernel`."""
    S, Kp = patchT.shape
    assert S == 3 * CELLS and Kp % LANES == 0, (S, Kp)
    grid = (Kp // LANES,)
    return pl.pallas_call(
        _refine_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * CELLS, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_OUT, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_OUT, Kp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=Kp * (N_ITERS + 1) * 27 * 2 * CELLS,
            bytes_accessed=(3 * CELLS + 8 + N_OUT) * Kp * 4,
            transcendentals=0),
        interpret=interpret,
    )(scal, patchT)
