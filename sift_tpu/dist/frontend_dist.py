"""Data-parallel SIFT extraction over a device mesh.

Pure DP with explicit per-shard programs: images are sharded on the batch
axis and each device runs the batch-flattened extractor
(`extract_lowe_batched`) on its local shard via `shard_map` — zero
communication, keypoint outputs stay sharded with their images. `shard_map`
(not `pjit`-of-the-global-program) matters here: the flattened extractor
fuses (image, level) indices into a (B*L, H, W) gradient-stack gather, and
the SPMD partitioner cannot prove those gathers stay shard-local — per-shard
tracing keeps them local by construction AND keeps the mesh path running the
exact program the single-device chunk path runs (bit-identical outputs).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sift_tpu.config import SiftConfig
from sift_tpu.frontend.sift import extract_batch
from sift_tpu.types import Keypoints


def extract_batch_sharded(mesh: Mesh, imgs, cfg: SiftConfig,
                          with_descriptors: bool = True,
                          replicate: bool = False) -> Keypoints:
    """Extract over (B, H, W) with B sharded across every mesh axis.

    B must be divisible by the total device count (pad with zero images and
    ignore their outputs, or choose B accordingly). uint8 frames are cast
    on device (1-byte host->device transfer, like the pipeline's chunk
    upload path).

    `replicate`: all_gather the keypoint outputs inside the program so
    every device (hence every PROCESS) holds the full batch. Required for
    multi-process SLAM, where the host tracking logic reads keypoint
    buffers that would otherwise span non-addressable devices; the
    gathered buffers are small next to the images (the loopback test
    drives this path).
    """
    img_sharding = NamedSharding(mesh, P(mesh.axis_names))
    if jax.process_count() > 1:
        # device_put onto a non-fully-addressable sharding runs a hidden
        # cross-process assert_equal COLLECTIVE inside jax — measured
        # deadlock when per-process dispatch timing diverges (r5,
        # faulthandler stack in the loopback test). Building the global
        # array from process-local data skips the value-check collective.
        import numpy as _np
        imgs = jax.make_array_from_process_local_data(
            img_sharding, _np.asarray(imgs))
    else:
        imgs = jax.device_put(imgs, img_sharding)
    return _extract_sharded_jit(mesh, cfg, with_descriptors, replicate)(imgs)


@functools.lru_cache(maxsize=16)
def _extract_sharded_jit(mesh: Mesh, cfg: SiftConfig,
                         with_descriptors: bool, replicate: bool = False):
    """Compiled sharded extractor, cached per (mesh, cfg) — a fresh jit
    closure per call would re-trace every invocation (the SLAM loop calls
    this once per chunk)."""
    axes = mesh.axis_names
    spec = P(axes)

    def per_shard(x):
        x = x.astype(jax.numpy.float32)
        kp = extract_batch(x, cfg, with_descriptors)
        if replicate:
            kp = jax.tree.map(
                lambda a: jax.lax.all_gather(a, axes, axis=0, tiled=True),
                kp)
        return kp

    sharded = shard_map(per_shard, mesh=mesh, in_specs=spec,
                        out_specs=P() if replicate else spec,
                        check_vma=False)
    return jax.jit(sharded)
