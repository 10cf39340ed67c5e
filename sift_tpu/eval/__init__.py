"""Trajectory evaluation (SURVEY.md §2.2: ATE on TUM-RGBD/KITTI)."""

from sift_tpu.eval.ate import umeyama_alignment, ate_rmse, rpe_rmse

__all__ = ["umeyama_alignment", "ate_rmse", "rpe_rmse"]
