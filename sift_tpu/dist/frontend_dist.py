"""Data-parallel SIFT extraction over a device mesh.

Pure DP is the compiler-partitioned path: images are sharded on the batch
axis with a `NamedSharding`, the per-image extractor is vmapped, and XLA
partitions the whole computation with zero communication (keypoint outputs
stay sharded with their images). No `shard_map` needed — this is exactly
what `pjit` is for.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sift_tpu.config import SiftConfig
from sift_tpu.frontend.sift import extract
from sift_tpu.types import Keypoints


def extract_batch_sharded(mesh: Mesh, imgs, cfg: SiftConfig,
                          with_descriptors: bool = True) -> Keypoints:
    """Extract over (B, H, W) with B sharded across every mesh axis.

    B must be divisible by the total device count (pad with zero images and
    ignore their outputs, or choose B accordingly).
    """
    axes = mesh.axis_names
    img_sharding = NamedSharding(mesh, P(axes))       # batch over all axes
    imgs = jax.device_put(imgs, img_sharding)

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P(axes)))
    def run(x):
        return jax.vmap(lambda im: extract(im, cfg, with_descriptors))(x)

    return run(imgs)
