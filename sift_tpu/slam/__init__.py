"""SLAM layer: pose-graph optimization and the incremental SfM pipeline
(capabilities absent from the reference — SURVEY.md §2.2)."""

from sift_tpu.slam.pose_graph import PoseGraph, optimize_pose_graph

__all__ = ["PoseGraph", "optimize_pose_graph"]
