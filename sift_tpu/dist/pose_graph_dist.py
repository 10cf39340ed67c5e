"""Distributed pose-graph optimization: edges sharded over the mesh.

Same pattern as distributed BA (`ba_dist.py`): poses replicate, the edge
list shards over the `data` axis, and every per-node block reduction inside
the Gauss-Newton/CG solver gains one `psum`. Typical SLAM pose graphs are
edge-heavy (odometry + loop closures + co-visibility), so edge sharding is
the right decomposition.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sift_tpu.slam.pose_graph import (PoseGraph, Sim3Graph,
                                      optimize_pose_graph,
                                      optimize_pose_graph_sim3)
from sift_tpu.dist.mesh import pad_to_multiple


def optimize_pose_graph_sharded(mesh: Mesh, graph: PoseGraph,
                                iterations: int = 20,
                                cg_iterations: int = 64,
                                data_axis: str = "data") -> PoseGraph:
    """Run distributed pose-graph LM; returns a graph with optimized poses
    (replicated, identical across devices)."""
    n_data = mesh.shape[data_axis]
    ei = pad_to_multiple(np.asarray(graph.edge_i), n_data)
    ej = pad_to_multiple(np.asarray(graph.edge_j), n_data)
    ez = pad_to_multiple(np.asarray(graph.edge_z), n_data)
    ew = pad_to_multiple(np.asarray(graph.edge_w), n_data)  # pads weight 0

    espec = P(data_axis)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, espec, espec, espec, espec, rep),
        out_specs=rep, check_vma=False)
    def step(poses, i, j, z, w, fixed):
        g = PoseGraph(poses=poses, edge_i=i, edge_j=j, edge_z=z, edge_w=w,
                      fixed=fixed)
        out = optimize_pose_graph(g, iterations=iterations,
                                  cg_iterations=cg_iterations,
                                  axis_name=data_axis)
        return out.poses

    poses = jax.jit(step)(graph.poses, ei, ej, ez, ew, graph.fixed)
    return graph.replace(poses=poses)


def optimize_pose_graph_sim3_sharded(mesh: Mesh, graph: Sim3Graph,
                                     iterations: int = 20,
                                     cg_iterations: int = 64,
                                     data_axis: str = "data") -> Sim3Graph:
    """Distributed Sim(3) pose-graph LM (monocular scale-drift graphs):
    identical edge-sharding decomposition as the SE(3) version — 7-dof
    blocks, psum'd per-node reductions."""
    n_data = mesh.shape[data_axis]
    ei = pad_to_multiple(np.asarray(graph.edge_i), n_data)
    ej = pad_to_multiple(np.asarray(graph.edge_j), n_data)
    ez = pad_to_multiple(np.asarray(graph.edge_z), n_data)
    ew = pad_to_multiple(np.asarray(graph.edge_w), n_data)  # pads weight 0

    espec = P(data_axis)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, espec, espec, espec, espec, rep),
        out_specs=rep, check_vma=False)
    def step(poses, i, j, z, w, fixed):
        g = Sim3Graph(poses=poses, edge_i=i, edge_j=j, edge_z=z, edge_w=w,
                      fixed=fixed)
        out = optimize_pose_graph_sim3(g, iterations=iterations,
                                       cg_iterations=cg_iterations,
                                       axis_name=data_axis)
        return out.poses

    poses = jax.jit(step)(graph.poses, ei, ej, ez, ew, graph.fixed)
    return graph.replace(poses=poses)
