"""Descriptor matching (a capability absent from the reference — SURVEY.md §2.2)."""

from sift_tpu.matching.matcher import (
    pairwise_sqdist,
    match_descriptors,
    match_descriptors_jit,
    match_keypoints,
)

__all__ = [
    "pairwise_sqdist",
    "match_descriptors",
    "match_descriptors_jit",
    "match_keypoints",
]
