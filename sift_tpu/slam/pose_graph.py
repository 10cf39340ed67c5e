"""Pose-graph optimization: Gauss-Newton on SE(3) with matrix-free CG.

Nodes are keyframe poses (world-from-keyframe, se(3) tangent coordinates);
edges carry relative-pose measurements ``z_e ~ log(T_i^-1 T_j)`` with
per-edge scalar information weights. The residual of edge e is

    r_e = log( exp(z_e)^-1 · exp(xi_i)^-1 · exp(xi_j) )   in R^6

and the normal equations H dx = -g are solved matrix-free: per-edge 6x6
Jacobian blocks (one vmapped `jacfwd`), H x assembled as two segment
reductions over edges — the same sharded-reduction pattern as BA, so the
same code runs per-device inside `shard_map` with `psum` over the edge
shards (SURVEY.md §5).

Everything is fixed-shape: edge lists are capacity buffers with validity
masks; fixed (gauge) nodes get zeroed Jacobians.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from flax import struct

from sift_tpu.geometry import lie


def _seg_sum(x, idx, num, axis_name=None):
    out = jax.ops.segment_sum(x, idx, num_segments=num)
    if axis_name is not None:
        out = lax.psum(out, axis_name)
    return out


@struct.dataclass
class PoseGraph:
    """Fixed-capacity pose graph.

    poses:     (N, 6) se(3) world-from-keyframe.
    edge_i/j:  (E,) int32 node indices.
    edge_z:    (E, 6) measured relative pose log(T_i^-1 T_j).
    edge_w:    (E,) scalar information weights (0 = invalid edge).
    fixed:     (N,) bool gauge mask.
    """

    poses: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_z: jnp.ndarray
    edge_w: jnp.ndarray
    fixed: jnp.ndarray


def edge_residual(xi_i: jnp.ndarray, xi_j: jnp.ndarray,
                  z: jnp.ndarray) -> jnp.ndarray:
    """r = log(exp(z)^-1 exp(xi_i)^-1 exp(xi_j)) (6,)."""
    Ri, ti = lie.se3_exp(xi_i)
    Rj, tj = lie.se3_exp(xi_j)
    Rz, tz = lie.se3_exp(z)
    Rii, tii = lie.se3_inverse(Ri, ti)
    Rij, tij = lie.se3_compose(Rii, tii, Rj, tj)      # T_i^-1 T_j
    Rzi, tzi = lie.se3_inverse(Rz, tz)
    Rr, tr = lie.se3_compose(Rzi, tzi, Rij, tij)
    return lie.se3_log(Rr, tr)


def _linearize(graph: PoseGraph):
    """Per-edge residuals (E, 6) and Jacobians (E, 6, 6) wrt *local*
    right-perturbations of nodes i and j (manifold linearization — immune to
    the global tangent chart's singularity at rotation angle pi, which real
    loops traverse)."""
    def one(i, j, z, w):
        xi_i, xi_j = graph.poses[i], graph.poses[j]
        Ri, ti = lie.se3_exp(xi_i)
        Rj, tj = lie.se3_exp(xi_j)
        Rz, tz = lie.se3_exp(z)
        Rzi, tzi = lie.se3_inverse(Rz, tz)

        def f(di, dj):
            Ria, tia = lie.se3_compose(Ri, ti, *lie.se3_exp(di))
            Rja, tja = lie.se3_compose(Rj, tj, *lie.se3_exp(dj))
            Rii, tii = lie.se3_inverse(Ria, tia)
            Rij, tij = lie.se3_compose(Rii, tii, Rja, tja)
            Rr, tr = lie.se3_compose(Rzi, tzi, Rij, tij)
            return lie.se3_log(Rr, tr)

        zero = jnp.zeros((6,), graph.poses.dtype)
        r = f(zero, zero)
        Ji, Jj = jax.jacfwd(f, argnums=(0, 1))(zero, zero)
        sw = jnp.sqrt(jnp.maximum(w, 0.0))
        return r * sw, Ji * sw, Jj * sw

    r, Ji, Jj = jax.vmap(one)(graph.edge_i, graph.edge_j,
                              graph.edge_z, graph.edge_w)
    # Gauge: zero out Jacobians of fixed nodes.
    free_i = 1.0 - graph.fixed[graph.edge_i].astype(Ji.dtype)
    free_j = 1.0 - graph.fixed[graph.edge_j].astype(Jj.dtype)
    return r, Ji * free_i[:, None, None], Jj * free_j[:, None, None]


def _h_matvec(Ji, Jj, ei, ej, n, x, damping, axis_name=None):
    """(J^T J + damping I) x via two edge sweeps. x: (N, 6)."""
    t = (jnp.einsum("eij,ej->ei", Ji, x[ei]) +
         jnp.einsum("eij,ej->ei", Jj, x[ej]))            # (E, 6) = J_e x
    gi = jnp.einsum("eij,ei->ej", Ji, t)
    gj = jnp.einsum("eij,ei->ej", Jj, t)
    out = _seg_sum(gi, ei, n, axis_name) + _seg_sum(gj, ej, n, axis_name)
    return out + damping * x


# --------------------------------------------------------------- Sim(3)
#
# Monocular loop closure needs the 7-dof similarity group: the loop edge
# carries the accumulated SCALE drift as well as the pose drift (Strasdat
# RSS 2010). Same GN/LM + matrix-free CG machinery as SE(3), with 7x7
# blocks; odometry edges have sigma_z = 0, the loop edge's sigma comes
# from Umeyama on duplicate-landmark pairs (sim3.umeyama_alignment).


@struct.dataclass
class Sim3Graph:
    """Fixed-capacity Sim(3) pose graph (layout mirrors PoseGraph).

    poses:     (N, 7) sim(3) tangents (omega, v, sigma).
    edge_z:    (E, 7) measured relative similarity log(S_i^-1 S_j).
    """

    poses: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_z: jnp.ndarray
    edge_w: jnp.ndarray
    fixed: jnp.ndarray


def sim3_edge_residual(xi_i, xi_j, z):
    """r = log(exp(z)^-1 exp(xi_i)^-1 exp(xi_j)) in R^7."""
    from sift_tpu.geometry import sim3
    Si = sim3.sim3_exp(xi_i)
    Sj = sim3.sim3_exp(xi_j)
    Sz = sim3.sim3_exp(z)
    Sij = sim3.sim3_compose(*sim3.sim3_inverse(*Si), *Sj)
    Sr = sim3.sim3_compose(*sim3.sim3_inverse(*Sz), *Sij)
    return sim3.sim3_log(*Sr)


def _linearize_sim3(graph: Sim3Graph):
    from sift_tpu.geometry import sim3

    def one(i, j, z, w):
        xi_i, xi_j = graph.poses[i], graph.poses[j]
        Si = sim3.sim3_exp(xi_i)
        Sj = sim3.sim3_exp(xi_j)
        Szi = sim3.sim3_inverse(*sim3.sim3_exp(z))

        def f(di, dj):
            Sia = sim3.sim3_compose(*Si, *sim3.sim3_exp(di))
            Sja = sim3.sim3_compose(*Sj, *sim3.sim3_exp(dj))
            Sij = sim3.sim3_compose(*sim3.sim3_inverse(*Sia), *Sja)
            return sim3.sim3_log(*sim3.sim3_compose(*Szi, *Sij))

        zero = jnp.zeros((7,), graph.poses.dtype)
        r = f(zero, zero)
        Ji, Jj = jax.jacfwd(f, argnums=(0, 1))(zero, zero)
        sw = jnp.sqrt(jnp.maximum(w, 0.0))
        return r * sw, Ji * sw, Jj * sw

    r, Ji, Jj = jax.vmap(one)(graph.edge_i, graph.edge_j,
                              graph.edge_z, graph.edge_w)
    free_i = 1.0 - graph.fixed[graph.edge_i].astype(Ji.dtype)
    free_j = 1.0 - graph.fixed[graph.edge_j].astype(Jj.dtype)
    return r, Ji * free_i[:, None, None], Jj * free_j[:, None, None]


def optimize_pose_graph_sim3(graph: Sim3Graph,
                             iterations: int = 20,
                             cg_iterations: int = 64,
                             cg_tol: float = 1e-6,
                             damping_init: float = 1e-4,
                             axis_name: Optional[str] = None) -> Sim3Graph:
    """Levenberg-Marquardt on the Sim(3) graph (one jitted while_loop)."""
    from sift_tpu.geometry import sim3
    n = graph.poses.shape[0]
    D = 7

    def total_cost(poses):
        r, _, _ = _linearize_sim3(graph.replace(poses=poses))
        c = jnp.sum(r * r)
        if axis_name is not None:
            c = lax.psum(c, axis_name)
        return c

    def cg_solve(Ji, Jj, b, damping):
        di = jnp.einsum("eij,eik->ejk", Ji, Ji)
        dj = jnp.einsum("eij,eik->ejk", Jj, Jj)
        Dm = _seg_sum(di, graph.edge_i, n, axis_name) + \
            _seg_sum(dj, graph.edge_j, n, axis_name) + \
            damping * jnp.eye(D, dtype=b.dtype)
        M_inv = jnp.linalg.inv(Dm)
        precond = lambda v: jnp.einsum("nij,nj->ni", M_inv, v)

        def matvec(x):
            t = (jnp.einsum("eij,ej->ei", Ji, x[graph.edge_i]) +
                 jnp.einsum("eij,ej->ei", Jj, x[graph.edge_j]))
            gi = jnp.einsum("eij,ei->ej", Ji, t)
            gj = jnp.einsum("eij,ei->ej", Jj, t)
            return _seg_sum(gi, graph.edge_i, n, axis_name) + \
                _seg_sum(gj, graph.edge_j, n, axis_name) + damping * x

        dot = lambda a, bb: jnp.sum(a * bb)
        b_norm2 = jnp.maximum(dot(b, b), 1e-30)

        def cond(carry):
            _, r, _, _, k = carry
            return (k < cg_iterations) & (dot(r, r) > cg_tol ** 2 * b_norm2)

        def body(carry):
            x, r, p, rz, k = carry
            Ap = matvec(p)
            alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = dot(r, z)
            p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
            return x, r, p, rz_new, k + 1

        z0 = precond(b)
        x, *_ = lax.while_loop(cond, body,
                               (jnp.zeros_like(b), b, z0, dot(b, z0), 0))
        return x

    def body(carry):
        poses, cost_prev, damping, it = carry
        r, Ji, Jj = _linearize_sim3(graph.replace(poses=poses))
        gi = jnp.einsum("eij,ei->ej", Ji, r)
        gj = jnp.einsum("eij,ei->ej", Jj, r)
        grad = _seg_sum(gi, graph.edge_i, n, axis_name) + \
            _seg_sum(gj, graph.edge_j, n, axis_name)
        dx = cg_solve(Ji, Jj, -grad, damping)
        dx = jnp.where(graph.fixed[:, None], 0.0, dx)
        poses_new = sim3.boxplus(poses, dx)
        cost_new = total_cost(poses_new)
        accept = cost_new < cost_prev
        poses = jnp.where(accept, poses_new, poses)
        cost_next = jnp.where(accept, cost_new, cost_prev)
        damping = jnp.where(accept, jnp.maximum(damping / 3.0, 1e-9),
                            damping * 4.0)
        return poses, cost_next, damping, it + 1

    def cond(carry):
        _, _, damping, it = carry
        return (it < iterations) & (damping < 1e8)

    c0 = total_cost(graph.poses)
    poses, _, _, _ = lax.while_loop(
        cond, body,
        (graph.poses, c0, jnp.asarray(damping_init, jnp.float32),
         jnp.asarray(0, jnp.int32)))
    return graph.replace(poses=poses)


def optimize_pose_graph(graph: PoseGraph,
                        iterations: int = 20,
                        cg_iterations: int = 64,
                        cg_tol: float = 1e-6,
                        damping_init: float = 1e-4,
                        axis_name: Optional[str] = None) -> PoseGraph:
    """Levenberg-Marquardt on the pose graph (one jitted while_loop)."""
    n = graph.poses.shape[0]

    def total_cost(poses):
        g = graph.replace(poses=poses)
        r, _, _ = _linearize(g)
        c = jnp.sum(r * r)
        if axis_name is not None:
            c = lax.psum(c, axis_name)
        return c

    def cg_solve(Ji, Jj, b, damping):
        # Block-Jacobi preconditioner from the diagonal blocks.
        di = jnp.einsum("eij,eik->ejk", Ji, Ji)
        dj = jnp.einsum("eij,eik->ejk", Jj, Jj)
        D = _seg_sum(di, graph.edge_i, n, axis_name) + \
            _seg_sum(dj, graph.edge_j, n, axis_name) + \
            damping * jnp.eye(6, dtype=b.dtype)
        M_inv = jnp.linalg.inv(D)
        precond = lambda v: jnp.einsum("nij,nj->ni", M_inv, v)
        matvec = lambda v: _h_matvec(Ji, Jj, graph.edge_i, graph.edge_j,
                                     n, v, damping, axis_name)
        dot = lambda a, bb: jnp.sum(a * bb)
        b_norm2 = jnp.maximum(dot(b, b), 1e-30)

        def cond(carry):
            _, r, _, _, k = carry
            return (k < cg_iterations) & (dot(r, r) > cg_tol ** 2 * b_norm2)

        def body(carry):
            x, r, p, rz, k = carry
            Ap = matvec(p)
            alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = dot(r, z)
            p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
            return x, r, p, rz_new, k + 1

        z0 = precond(b)
        x, *_ = lax.while_loop(cond, body,
                               (jnp.zeros_like(b), b, z0, dot(b, z0), 0))
        return x

    def body(carry):
        poses, cost_prev, damping, it = carry
        g = graph.replace(poses=poses)
        r, Ji, Jj = _linearize(g)
        gi = jnp.einsum("eij,ei->ej", Ji, r)
        gj = jnp.einsum("eij,ei->ej", Jj, r)
        grad = _seg_sum(gi, graph.edge_i, n, axis_name) + \
            _seg_sum(gj, graph.edge_j, n, axis_name)
        dx = cg_solve(Ji, Jj, -grad, damping)
        dx = jnp.where(graph.fixed[:, None], 0.0, dx)
        poses_new = lie.boxplus(poses, dx)        # manifold retraction
        cost_new = total_cost(poses_new)
        accept = cost_new < cost_prev
        poses = jnp.where(accept, poses_new, poses)
        cost_next = jnp.where(accept, cost_new, cost_prev)
        damping = jnp.where(accept, jnp.maximum(damping / 3.0, 1e-9),
                            damping * 4.0)
        return poses, cost_next, damping, it + 1

    def cond(carry):
        _, _, damping, it = carry
        return (it < iterations) & (damping < 1e8)

    c0 = total_cost(graph.poses)
    poses, _, _, _ = lax.while_loop(
        cond, body,
        (graph.poses, c0, jnp.asarray(damping_init, jnp.float32),
         jnp.asarray(0, jnp.int32)))
    return graph.replace(poses=poses)
