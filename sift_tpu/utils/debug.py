"""Debugging and numerical-safety utilities (SURVEY.md §5 "race detection /
sanitizers"): JAX's functional purity removes data races by construction;
what remains worth guarding is numerical poison (NaN/Inf) and cross-run
nondeterminism."""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped `jax_debug_nans`: computations that produce NaNs raise
    immediately with the offending primitive (expensive; tests/debug only)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(tree: Any, name: str = "pytree") -> None:
    """Host-side assertion that every array in a pytree is finite."""
    leaves, _ = jax.tree.flatten(tree)
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}: leaf {i} has {bad} non-finite values "
                f"(shape {arr.shape}, dtype {arr.dtype})")


def assert_trees_equal(a: Any, b: Any, atol: float = 0.0,
                       name: str = "trees") -> None:
    """Determinism assertion: two pytrees (e.g. results from different
    shardings or reruns) must match to `atol`."""
    la, sa = jax.tree.flatten(a)
    lb, sb = jax.tree.flatten(b)
    assert sa == sb, f"{name}: structure mismatch"
    for i, (x, y) in enumerate(zip(la, lb)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   err_msg=f"{name}: leaf {i}")
