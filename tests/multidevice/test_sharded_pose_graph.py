"""Sharded pose-graph optimization == single-device (mesh-shape invariance)."""

import numpy as np
import jax.numpy as jnp

from sift_tpu.config import MeshConfig
from sift_tpu.dist.mesh import make_mesh
from sift_tpu.dist.pose_graph_dist import optimize_pose_graph_sharded
from sift_tpu.slam.pose_graph import PoseGraph, optimize_pose_graph
from tests.unit.test_pose_graph import _make_loop, _compose_np


def _graph():
    gt, (ei, ej, z, w) = _make_loop(n=12, drift=0.03)
    n = gt.shape[0]
    init = [gt[0]]
    for k in range(n - 1):
        init.append(_compose_np(init[-1], z[k]).astype(np.float32))
    fixed = np.zeros(n, bool)
    fixed[0] = True
    return PoseGraph(poses=jnp.asarray(np.stack(init)),
                     edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
                     edge_z=jnp.asarray(z), edge_w=jnp.asarray(w),
                     fixed=jnp.asarray(fixed))


def test_sharded_pose_graph_matches_single(eight_devices):
    g = _graph()
    ref = optimize_pose_graph(g, iterations=15)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    got = optimize_pose_graph_sharded(mesh, g, iterations=15)
    np.testing.assert_allclose(np.asarray(got.poses), np.asarray(ref.poses),
                               atol=1e-4)


def test_sharded_sim3_pose_graph_matches_single(eight_devices):
    """Sim(3) edge sharding: 8-device result == single-device (the 7-dof
    blocks reduce through the same psum'd segment sums)."""
    from sift_tpu.slam.pose_graph import Sim3Graph, optimize_pose_graph_sim3
    from sift_tpu.dist.pose_graph_dist import optimize_pose_graph_sim3_sharded
    from sift_tpu.geometry import sim3

    g6 = _graph()
    n = np.asarray(g6.poses).shape[0]
    rng = np.random.default_rng(5)
    # Lift to Sim(3): sigma drift on the init, sigma measurements on edges.
    poses7 = np.concatenate(
        [np.asarray(g6.poses),
         (rng.standard_normal((n, 1)) * 0.05).astype(np.float32)], -1)
    E = np.asarray(g6.edge_i).shape[0]
    ez6 = np.asarray(g6.edge_z)
    Rz, tz = __import__("sift_tpu.geometry.lie", fromlist=["lie"]).se3_exp(
        jnp.asarray(ez6))
    ez7 = np.asarray(sim3.sim3_log(jnp.ones((E,), jnp.float32), Rz, tz))
    g = Sim3Graph(poses=jnp.asarray(poses7), edge_i=g6.edge_i,
                  edge_j=g6.edge_j, edge_z=jnp.asarray(ez7),
                  edge_w=g6.edge_w, fixed=g6.fixed)

    ref = optimize_pose_graph_sim3(g, iterations=12)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    got = optimize_pose_graph_sim3_sharded(mesh, g, iterations=12)
    np.testing.assert_allclose(np.asarray(got.poses), np.asarray(ref.poses),
                               atol=1e-4)
