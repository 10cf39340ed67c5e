"""Descriptor matching (a capability absent from the reference — SURVEY.md §2.2)."""

from sift_tpu.matching.matcher import (
    pairwise_sqdist,
    match_descriptors,
    match_descriptors_jit,
    match_keypoints,
)
from sift_tpu.matching.ann import (
    IvfIndex,
    build_ivf,
    match_descriptors_ann,
    search_ivf,
)

__all__ = [
    "pairwise_sqdist",
    "match_descriptors",
    "match_descriptors_jit",
    "match_keypoints",
    "IvfIndex",
    "build_ivf",
    "match_descriptors_ann",
    "search_ivf",
]
