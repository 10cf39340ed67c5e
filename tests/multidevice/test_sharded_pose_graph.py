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
