"""sift_tpu — a TPU-native SLAM/SfM engine built from scratch in JAX/XLA/Pallas.

The frontend re-implements the full SIFT pipeline of the C++ reference
(snowiow/SIFT, see /root/reference) as batched, jit-compiled TPU programs with
two modes:

* ``mode="lowe"``   — a correct Lowe-2004 SIFT (the production path), and
* ``mode="parity"`` — a bit-faithful replication of the reference's behaviour,
  including its documented quirks (see SURVEY.md §2), for golden-output parity.

On top of the frontend sits everything the reference lacks: MXU-tiled
descriptor matching, batched RANSAC two-view geometry, triangulation,
Schur-complement bundle adjustment, pose-graph optimization, and multi-host
sharding of the optimizer over `jax.sharding` meshes.
"""

from sift_tpu.config import (
    SiftConfig,
    MatchConfig,
    RansacConfig,
    BAConfig,
    MeshConfig,
    PipelineConfig,
)
from sift_tpu.types import Keypoints, Matches, TwoViewEstimate, MapState

__version__ = "0.1.0"

__all__ = [
    "SiftConfig",
    "MatchConfig",
    "RansacConfig",
    "BAConfig",
    "MeshConfig",
    "PipelineConfig",
    "Keypoints",
    "Matches",
    "TwoViewEstimate",
    "MapState",
    "__version__",
]
