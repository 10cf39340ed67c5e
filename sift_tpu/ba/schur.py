"""Matrix-free Schur complement and preconditioned CG.

The bundle-adjustment normal equations have the classic 2x2 block structure

    [ U   W ] [dc]   [ -g_c ]
    [ W^T V ] [dl] = [ -g_l ]

with U block-diagonal over cameras (6x6), V block-diagonal over landmarks
(3x3), and W the camera-landmark coupling. Landmarks are eliminated:

    S dc = b,   S = U - W V^-1 W^T,   b = -(g_c - W V^-1 g_l)

S is never materialized. Its matvec is two sweeps over the observation list
(gather camera block -> scatter landmark block -> apply V^-1 -> gather
landmark -> scatter camera) — each sweep a vmapped einsum plus a
`segment_sum`. On a device mesh the observations are sharded and every
`segment_sum` is followed by a `psum` over the mesh axis (`axis_name`),
which is the entire distributed-BA communication pattern (SURVEY.md §5:
ring-style reduction of J^T J blocks across hosts).

All segment reductions use the *sorted-ready* `jax.ops.segment_sum`; indices
of masked observations point at slot 0 with zero weights, so no special
cases exist anywhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from flax import struct

from sift_tpu.ba.residuals import linearize


def _seg_sum(x: jnp.ndarray, idx: jnp.ndarray, num: int,
             axis_name: Optional[str] = None) -> jnp.ndarray:
    out = jax.ops.segment_sum(x, idx, num_segments=num)
    if axis_name is not None:
        out = lax.psum(out, axis_name)
    return out


@struct.dataclass
class SchurSystem:
    """Linearized, damped BA system (fixed shapes; O may be device-local)."""

    r: jnp.ndarray        # (O, 2) sqrt-weighted residuals
    Jc: jnp.ndarray       # (O, 2, 6)
    Jl: jnp.ndarray       # (O, 2, 3)
    obs_cam: jnp.ndarray  # (O,)
    obs_lm: jnp.ndarray   # (O,)
    U: jnp.ndarray        # (C, 6, 6) damped camera blocks (replicated)
    V_inv: jnp.ndarray    # (L, 3, 3) inverted damped landmark blocks
    g_cam: jnp.ndarray    # (C, 6) J_c^T r
    g_lm: jnp.ndarray     # (L, 3) J_l^T r
    axis_name: Optional[str] = struct.field(pytree_node=False, default=None)


def _sharded_inv3(V: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Batched 3x3 inverse of (L, 3, 3) with rows split over a mesh axis.

    The landmark-block stage is the BA analog of tensor parallelism
    (SURVEY.md §5 "by-landmark layout"): each device inverts its L/m slice of
    the (replicated) damped V and an `all_gather` over ICI reassembles the
    full inverse. L must be a multiple of the axis size.
    """
    m = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    L = V.shape[0]
    chunk = L // m
    local = lax.dynamic_slice_in_dim(V, i * chunk, chunk)
    return lax.all_gather(jnp.linalg.inv(local), axis_name, axis=0,
                          tiled=True)


def build_system(poses, intrinsics, landmarks, obs_cam, obs_lm, obs_uv,
                 obs_valid, huber_delta: float, damping,
                 fixed_cam_mask: jnp.ndarray,
                 axis_name: Optional[str] = None,
                 loss: str = "huber",
                 landmark_axis: Optional[str] = None,
                 v_mode: str = "psum") -> SchurSystem:
    """Linearize and assemble the damped block system.

    `fixed_cam_mask` (C,) bool: gauge-fixed cameras get zeroed Jacobian
    columns, so their blocks become pure damping and their updates vanish.
    Under `shard_map` the observation arrays are the device-local shard and
    `axis_name` names the mesh axis to `psum` block sums over.
    """
    C = poses.shape[0]
    L = landmarks.shape[0]

    r, Jc, Jl, w = linearize(poses, intrinsics, landmarks,
                             obs_cam, obs_lm, obs_uv, obs_valid, huber_delta,
                             loss)
    free = 1.0 - fixed_cam_mask[obs_cam].astype(Jc.dtype)
    Jc = Jc * free[:, None, None]

    U = _seg_sum(jnp.einsum("oik,oil->okl", Jc, Jc), obs_cam, C, axis_name)
    g_cam = _seg_sum(jnp.einsum("oik,oi->ok", Jc, r), obs_cam, C, axis_name)
    g_lm = _seg_sum(jnp.einsum("oik,oi->ok", Jl, r), obs_lm, L, axis_name)

    # Marquardt-style relative damping plus a small absolute floor: pure
    # lambda*I leaves tiny-Jacobian blocks with condition ~|J^T J|/lambda,
    # which overwhelms float32 3x3 inversion and emits NaN updates.
    eye6 = jnp.eye(6, dtype=U.dtype)
    eye3 = jnp.eye(3, dtype=jnp.float32)

    def damp3(V):
        dv = jnp.einsum("lii->l", V)[:, None, None] / 3.0
        return V + (damping * (1.0 + dv) + 1e-6 * dv) * eye3

    du = jnp.einsum("cii->c", U)[:, None, None] / 6.0
    U = U + (damping * (1.0 + du) + 1e-6 * du) * eye6

    v_contrib = jnp.einsum("oik,oil->okl", Jl, Jl)
    if v_mode == "reduce_scatter" and axis_name is not None:
        # Ulysses-style by-landmark reshard (SURVEY §5): instead of
        # replicating V with a psum and then inverting, reduce_scatter the
        # local partial sums so each device owns (and inverts) L/n fully
        # summed landmark blocks, then all_gather the inverses. Same total
        # bytes on the wire as psum, but the batched 3x3 inversion is
        # perfectly distributed without a separate model axis.
        V_local = jax.ops.segment_sum(v_contrib, obs_lm, num_segments=L)
        V_own = lax.psum_scatter(V_local, axis_name, scatter_dimension=0,
                                 tiled=True)
        V_inv = lax.all_gather(jnp.linalg.inv(damp3(V_own)), axis_name,
                               axis=0, tiled=True)
    else:
        V = damp3(_seg_sum(v_contrib, obs_lm, L, axis_name))
        if landmark_axis is not None:
            V_inv = _sharded_inv3(V, landmark_axis)
        else:
            V_inv = jnp.linalg.inv(V)

    return SchurSystem(r=r, Jc=Jc, Jl=Jl, obs_cam=obs_cam, obs_lm=obs_lm,
                       U=U, V_inv=V_inv, g_cam=g_cam, g_lm=g_lm,
                       axis_name=axis_name)


def _w_apply_t(sys: SchurSystem, x_cam: jnp.ndarray) -> jnp.ndarray:
    """W^T x: (C, 6) camera vector -> (L, 3) landmark vector."""
    xc = x_cam[sys.obs_cam]                                   # (O, 6)
    t = jnp.einsum("oij,oj->oi", sys.Jc, xc)                  # (O, 2)
    y = jnp.einsum("oij,oi->oj", sys.Jl, t)                   # (O, 3)
    return _seg_sum(y, sys.obs_lm, sys.V_inv.shape[0], sys.axis_name)


def _w_apply(sys: SchurSystem, z_lm: jnp.ndarray) -> jnp.ndarray:
    """W z: (L, 3) landmark vector -> (C, 6) camera vector."""
    zl = z_lm[sys.obs_lm]                                     # (O, 3)
    t = jnp.einsum("oij,oj->oi", sys.Jl, zl)                  # (O, 2)
    y = jnp.einsum("oij,oi->oj", sys.Jc, t)                   # (O, 6)
    return _seg_sum(y, sys.obs_cam, sys.U.shape[0], sys.axis_name)


def schur_matvec(sys: SchurSystem, x: jnp.ndarray) -> jnp.ndarray:
    """S x = (U - W V^-1 W^T) x, matrix-free. x: (C, 6)."""
    u = jnp.einsum("cij,cj->ci", sys.U, x)
    z = _w_apply_t(sys, x)
    z = jnp.einsum("lij,lj->li", sys.V_inv, z)
    return u - _w_apply(sys, z)


def schur_rhs(sys: SchurSystem) -> jnp.ndarray:
    """b = -(g_c - W V^-1 g_l)."""
    z = jnp.einsum("lij,lj->li", sys.V_inv, sys.g_lm)
    return -(sys.g_cam - _w_apply(sys, z))


def back_substitute(sys: SchurSystem, dc: jnp.ndarray) -> jnp.ndarray:
    """dl = V^-1 (-g_l - W^T dc). dc: (C, 6) -> (L, 3)."""
    wt_dc = _w_apply_t(sys, dc)
    return jnp.einsum("lij,lj->li", sys.V_inv, -sys.g_lm - wt_dc)


def dense_schur_solve(sys: SchurSystem, b: jnp.ndarray) -> jnp.ndarray:
    """Direct solve of the reduced camera system (window-BA fast path).

    The roofline table (BENCH.md r2) shows window BA is LATENCY-bound:
    each PCG iteration is a chain of small sequential kernels (gather ->
    einsum -> segment_sum -> psum), and 20+ iterations serialize ~ms of
    launch latency for microseconds of math. For window-sized camera
    counts (C <= ~16) the 6C x 6C Schur complement fits comfortably in
    registers/VMEM, so we materialize it with three batched einsum/
    segment-sum passes and solve by Cholesky — one shot, no iteration.

    W is assembled block-dense: per-observation coupling blocks
    Jc_o^T Jl_o (6, 3) segment-summed into (C*L, 6, 3) keyed by
    cam * L + lm. Under shard_map the segment sum carries the usual psum,
    so the distributed path works unchanged.
    """
    C = sys.U.shape[0]
    L = sys.V_inv.shape[0]

    # (O, 6, 3) coupling blocks -> dense (C, L, 6, 3)
    Wb = jnp.einsum("oij,oik->ojk", sys.Jc, sys.Jl)
    key = sys.obs_cam * L + sys.obs_lm
    W = _seg_sum(Wb, key, C * L, sys.axis_name).reshape(C, L, 6, 3)

    # S = U - W V^-1 W^T, assembled blockwise.
    T = jnp.einsum("clij,ljk->clik", W, sys.V_inv)          # (C, L, 6, 3)
    S_off = jnp.einsum("alik,bljk->abij", T, W)             # (C, C, 6, 6)
    S = -S_off
    diag = jnp.arange(C)
    S = S.at[diag, diag].add(sys.U)
    S = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)

    x = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S, lower=True), b.reshape(-1))
    return x.reshape(C, 6)


def pcg(sys: SchurSystem, b: jnp.ndarray, iters: int, tol: float,
        jacobi: bool = True):
    """Block-Jacobi preconditioned CG on the reduced camera system.

    Fixed iteration bound (`lax.while_loop` with tolerance early-exit on the
    *scalar* residual only — shapes stay static). Preconditioner: inv(U_c),
    a batched 6x6 inverse; `jacobi=False` runs plain CG (identity
    preconditioner — mainly a diagnostic/ablation switch,
    `BAConfig.jacobi_precond`).
    """
    if jacobi:
        M_inv = jnp.linalg.inv(sys.U)
        precond = lambda v: jnp.einsum("cij,cj->ci", M_inv, v)
    else:
        precond = lambda v: v
    dot = lambda a, bb: jnp.sum(a * bb)

    x0 = jnp.zeros_like(b)
    r0 = b                      # since x0 = 0
    z0 = precond(r0)
    p0 = z0
    rz0 = dot(r0, z0)
    b_norm2 = jnp.maximum(dot(b, b), 1e-30)

    def cond(carry):
        _, r, _, _, k = carry
        return (k < iters) & (dot(r, r) > tol * tol * b_norm2)

    def body(carry):
        x, r, p, rz, k = carry
        Ap = schur_matvec(sys, p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    x, r, _, _, k = lax.while_loop(cond, body, (x0, r0, p0, rz0, 0))
    return x, k
