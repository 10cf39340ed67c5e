"""Pose-graph optimization property tests: odometry drift + loop closure."""

import numpy as np
import jax.numpy as jnp

from sift_tpu.geometry import lie
from sift_tpu.slam.pose_graph import PoseGraph, optimize_pose_graph, edge_residual


def _compose_np(xi_a, xi_b):
    Ra, ta = lie.se3_exp(jnp.asarray(xi_a))
    Rb, tb = lie.se3_exp(jnp.asarray(xi_b))
    Rc, tc = lie.se3_compose(Ra, ta, Rb, tb)
    return np.asarray(lie.se3_log(Rc, tc))


def _rel(xi_i, xi_j):
    Ri, ti = lie.se3_exp(jnp.asarray(xi_i))
    Rj, tj = lie.se3_exp(jnp.asarray(xi_j))
    Rii, tii = lie.se3_inverse(Ri, ti)
    R, t = lie.se3_compose(Rii, tii, Rj, tj)
    return np.asarray(lie.se3_log(R, t))


def _make_loop(n=12, drift=0.03, seed=0):
    """Ground-truth square loop; odometry edges corrupted by drift; one exact
    loop-closure edge."""
    rng = np.random.default_rng(seed)
    gt = [np.zeros(6, np.float32)]
    step = np.array([0.0, 0.1, 0.0, 1.0, 0.0, 0.0], np.float32)  # turn+move
    step[:3] = [0.0, 0.0, 2 * np.pi / n]
    for _ in range(n - 1):
        gt.append(_compose_np(gt[-1], step).astype(np.float32))
    gt = np.stack(gt)

    edges_i, edges_j, z, w = [], [], [], []
    for i in range(n - 1):
        noise = rng.normal(0, drift, 6).astype(np.float32)
        edges_i.append(i)
        edges_j.append(i + 1)
        z.append(_rel(gt[i], gt[i + 1]) + noise)
        w.append(1.0)
    # Loop closure + two chords: exact measurements, high weight.
    for a, b in ((n - 1, 0), (0, n // 2), (n // 4, 3 * n // 4)):
        edges_i.append(a)
        edges_j.append(b)
        z.append(_rel(gt[a], gt[b]))
        w.append(100.0)
    return gt, (np.asarray(edges_i, np.int32), np.asarray(edges_j, np.int32),
                np.stack(z).astype(np.float32), np.asarray(w, np.float32))


def test_edge_residual_zero_for_exact():
    gt, (ei, ej, z, w) = _make_loop(drift=0.0)
    r = edge_residual(jnp.asarray(gt[0]), jnp.asarray(gt[1]),
                      jnp.asarray(z[0]))
    assert float(jnp.abs(r).max()) < 1e-5


def _positions(poses):
    """Camera centers: the translation part of exp(xi) (chart-independent)."""
    _, t = lie.se3_exp(jnp.asarray(poses))
    return np.asarray(t)


def test_loop_closure_corrects_drift():
    gt, (ei, ej, z, w) = _make_loop(n=12, drift=0.03)
    n = gt.shape[0]

    # Initialize by chaining the noisy odometry -> drifted trajectory.
    init = [gt[0]]
    for k in range(n - 1):
        init.append(_compose_np(init[-1], z[k]).astype(np.float32))
    init = np.stack(init)
    # Compare positions, not tangent coords (the chart wraps at angle pi).
    drift_err = np.linalg.norm(_positions(init) - _positions(gt), axis=-1).max()

    fixed = np.zeros(n, bool)
    fixed[0] = True
    graph = PoseGraph(poses=jnp.asarray(init),
                      edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
                      edge_z=jnp.asarray(z), edge_w=jnp.asarray(w),
                      fixed=jnp.asarray(fixed))
    out = optimize_pose_graph(graph, iterations=25)
    opt_err = np.linalg.norm(_positions(np.asarray(out.poses)) -
                             _positions(gt), axis=-1).max()
    assert opt_err < 0.5 * drift_err, (drift_err, opt_err)
    # Loop closure satisfied (z[-3] is the (n-1, 0) closure edge).
    r_close = edge_residual(out.poses[n - 1], out.poses[0],
                            jnp.asarray(z[-3]))
    assert float(jnp.abs(r_close).max()) < 0.02


def test_masked_edges_inert():
    gt, (ei, ej, z, w) = _make_loop(n=8, drift=0.02)
    n = gt.shape[0]
    fixed = np.zeros(n, bool)
    fixed[0] = True

    # Pad with garbage edges at weight 0.
    pad = 5
    ei_p = np.concatenate([ei, np.zeros(pad, np.int32)])
    ej_p = np.concatenate([ej, np.full(pad, n - 1, np.int32)])
    z_p = np.concatenate([z, np.full((pad, 6), 7.7, np.float32)])
    w_p = np.concatenate([w, np.zeros(pad, np.float32)])

    g1 = PoseGraph(poses=jnp.asarray(gt), edge_i=jnp.asarray(ei),
                   edge_j=jnp.asarray(ej), edge_z=jnp.asarray(z),
                   edge_w=jnp.asarray(w), fixed=jnp.asarray(fixed))
    g2 = PoseGraph(poses=jnp.asarray(gt), edge_i=jnp.asarray(ei_p),
                   edge_j=jnp.asarray(ej_p), edge_z=jnp.asarray(z_p),
                   edge_w=jnp.asarray(w_p), fixed=jnp.asarray(fixed))
    o1 = optimize_pose_graph(g1, iterations=10)
    o2 = optimize_pose_graph(g2, iterations=10)
    np.testing.assert_allclose(np.asarray(o1.poses), np.asarray(o2.poses),
                               atol=1e-5)
