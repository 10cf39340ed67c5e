"""Distribution layer: device meshes, sharded frontend, distributed BA.

The reference has no parallelism of any kind (SURVEY.md §2.2); this layer is
the TPU-native replacement for what a CUDA framework would do with
NCCL/MPI — XLA collectives compiled into the program, reached through
`jax.sharding.Mesh` + `NamedSharding` (compiler-partitioned data parallel)
and `shard_map` (explicit per-device BA with `psum` reductions over ICI).
"""

from sift_tpu.dist.mesh import make_mesh, pad_to_multiple
from sift_tpu.dist.ba_dist import run_ba_sharded
from sift_tpu.dist.frontend_dist import extract_batch_sharded
from sift_tpu.dist.matching_dist import (match_large_sharded,
                                          match_pairs_sharded)
from sift_tpu.dist.pose_graph_dist import (optimize_pose_graph_sharded,
                                            optimize_pose_graph_sim3_sharded)

__all__ = [
    "make_mesh",
    "pad_to_multiple",
    "run_ba_sharded",
    "extract_batch_sharded",
    "match_large_sharded",
    "match_pairs_sharded",
    "optimize_pose_graph_sharded",
    "optimize_pose_graph_sim3_sharded",
]
