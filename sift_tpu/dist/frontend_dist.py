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
    ignore their outputs, or choose B accordingly). uint8 frames are cast
    on device (1-byte host->device transfer, like the pipeline's chunk
    upload path).
    """
    img_sharding = NamedSharding(mesh, P(mesh.axis_names))
    imgs = jax.device_put(imgs, img_sharding)
    return _extract_sharded_jit(mesh, cfg, with_descriptors)(imgs)


@functools.lru_cache(maxsize=16)
def _extract_sharded_jit(mesh: Mesh, cfg: SiftConfig,
                         with_descriptors: bool):
    """Compiled sharded extractor, cached per (mesh, cfg) — a fresh jit
    closure per call would re-trace every invocation (the SLAM loop calls
    this once per chunk)."""
    axes = mesh.axis_names

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P(axes)))
    def run(x):
        x = x.astype(jax.numpy.float32)
        return jax.vmap(lambda im: extract(im, cfg, with_descriptors))(x)

    return run
