"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

from sift_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh.

    With no config, all available devices go on the `data` axis (pure DP —
    the right default for frontend extraction). `jax.make_mesh` lays devices
    out so the trailing axis rides the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = MeshConfig(data=len(devices), model=1)
    assert cfg.num_devices <= len(devices), \
        f"mesh {cfg} needs {cfg.num_devices} devices, have {len(devices)}"
    devs = np.asarray(devices[:cfg.num_devices]).reshape(cfg.data, cfg.model)
    return Mesh(devs, axis_names=cfg.axis_names)


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0,
                    fill=0) -> np.ndarray:
    """Pad an array so shape[axis] is a multiple of `multiple` (host-side)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad, constant_values=fill)
