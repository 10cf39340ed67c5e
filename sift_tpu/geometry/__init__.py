"""Multi-view geometry (absent from the reference — SURVEY.md §2.2).

Batched, fixed-shape, jit-compatible: minimal solvers are vmapped linear
algebra; RANSAC is a fixed hypothesis batch + masked scoring + argmax
(no data-dependent loops, per SURVEY.md §7 "RANSAC on accelerator").
"""

from sift_tpu.geometry import lie
from sift_tpu.geometry.camera import project, backproject
from sift_tpu.geometry.homography import fit_homography, ransac_homography
from sift_tpu.geometry.epipolar import (
    fit_fundamental_8pt,
    ransac_essential,
    decompose_essential,
)
from sift_tpu.geometry.triangulation import triangulate_dlt

__all__ = [
    "lie",
    "project",
    "backproject",
    "fit_homography",
    "ransac_homography",
    "fit_fundamental_8pt",
    "ransac_essential",
    "decompose_essential",
    "triangulate_dlt",
]
