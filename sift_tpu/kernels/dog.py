"""Difference-of-Gaussians.

Reference (`alg::dog`, algorithms.cpp:52-64): ``128 + (higher - lower)``
elementwise — the +128 keeps values positive in the reference's [0,255] world.
Lowe mode drops the offset (a pure difference); both are trivially fused by
XLA into the surrounding pyramid computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def dog(lower: jnp.ndarray, higher: jnp.ndarray, parity_offset: bool = False) -> jnp.ndarray:
    d = higher - lower
    if parity_offset:
        d = d + jnp.asarray(128.0, d.dtype)
    return d
