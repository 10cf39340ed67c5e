"""Distributed bundle adjustment over a (data, model) mesh.

Layout (the SURVEY.md §5 sharding plan):
  * observations shard over the `data` axis — residual/Jacobian computation
    and every J^T J block accumulation run on local shards, combined by one
    `psum` per segment reduction (ICI collective inside the compiled step);
  * landmark-block inversion shards over the `model` axis (the BA analog of
    tensor parallelism): each device inverts L/model_size damped 3x3 blocks,
    reassembled with a tiled `all_gather`;
  * poses, intrinsics, landmarks are replicated — they are the small state.

The whole LM optimizer (`run_ba`) runs unchanged inside `shard_map`; the
result is replicated and bitwise identical across devices because every
cross-device reduction is a deterministic `psum`.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sift_tpu.config import BAConfig
from sift_tpu.ba.solver import run_ba, BAState
from sift_tpu.dist.mesh import pad_to_multiple


def run_ba_sharded(mesh: Mesh,
                   poses, intrinsics, landmarks,
                   obs_cam, obs_lm, obs_uv, obs_valid,
                   cfg: BAConfig, fixed_cam_mask,
                   data_axis: str = "data",
                   model_axis: Optional[str] = "model",
                   v_mode: str = "psum") -> BAState:
    """Run distributed LM bundle adjustment on a mesh.

    Host-side entry: pads the observation buffers to a multiple of the data
    axis size and the landmark count to a multiple of the model axis size
    is the caller's job (landmark capacity is static config; choose it
    divisible by the mesh). Returns a replicated `BAState`.
    """
    n_data = mesh.shape[data_axis]
    if model_axis is not None and mesh.shape.get(model_axis, 1) == 1:
        model_axis = None
    if model_axis is not None:
        assert landmarks.shape[0] % mesh.shape[model_axis] == 0, (
            f"landmark capacity {landmarks.shape[0]} must divide by "
            f"model axis {mesh.shape[model_axis]}")
    if v_mode == "reduce_scatter":
        # psum_scatter(tiled=True) over the data axis splits the landmark
        # dimension across it; a non-divisible capacity otherwise surfaces
        # as an opaque trace-time shape error.
        assert landmarks.shape[0] % n_data == 0, (
            f"v_mode='reduce_scatter' requires landmark capacity "
            f"{landmarks.shape[0]} divisible by data axis {n_data}")

    # Pad observations to a multiple of the data axis (masked slots).
    obs_cam = pad_to_multiple(np.asarray(obs_cam), n_data)
    obs_lm = pad_to_multiple(np.asarray(obs_lm), n_data)
    obs_uv = pad_to_multiple(np.asarray(obs_uv), n_data)
    obs_valid = pad_to_multiple(np.asarray(obs_valid), n_data)

    step = _sharded_step(mesh, cfg, data_axis, model_axis, v_mode)
    return step(poses, intrinsics, landmarks,
                obs_cam, obs_lm, obs_uv, obs_valid, fixed_cam_mask)


@functools.lru_cache(maxsize=32)
def _sharded_step(mesh: Mesh, cfg: BAConfig, data_axis: str,
                  model_axis: Optional[str], v_mode: str):
    """Compiled sharded LM step, cached per (mesh, cfg, axes, v_mode).

    A fresh `jax.jit(step)` per call re-traced the WHOLE optimizer on
    every invocation — measured 2.7x on the map-scale solve even with a
    warm XLA compilation cache (r5 scaling report; tracing + cache lookup
    dominate). Same pattern as the other dist modules."""
    obs_spec = P(data_axis)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rep, rep, obs_spec, obs_spec, obs_spec, obs_spec, rep),
        out_specs=rep, check_vma=False)
    def step(p, k, l, oc, ol, ouv, ov, fm):
        return run_ba(p, k, l, oc, ol, ouv, ov, cfg, fm,
                      axis_name=data_axis, landmark_axis=model_axis,
                      v_mode=v_mode)

    return jax.jit(step)
