"""Pallas refinement-walk kernel vs the XLA one-hot lookup walk.

The kernel executes the same IEEE f32 op sequence as the XLA path
(stencil taps are exact single-product selections in both), so the walk
takes identical steps and the outputs must be BIT-identical. CPU CI runs
the interpreter; on TPU the compiled Mosaic kernel satisfies the same
assertions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sift_tpu.config import SiftConfig
from sift_tpu.frontend.refine import refine_octave_lowe, PATCH_D

INTERPRET = jax.devices()[0].platform != "tpu"


def _case(seed, K=53, L=3, H=96, W=128):
    rng = np.random.default_rng(seed)
    import scipy.ndimage as ndi
    base = ndi.gaussian_filter(rng.standard_normal((L, H, W)), 1.2)
    dogs = (base * 40).astype(np.float32)
    x = rng.integers(1, W - 2, K).astype(np.float32)
    y = rng.integers(1, H - 2, K).astype(np.float32)
    cand = dict(
        x=jnp.asarray(x), y=jnp.asarray(y),
        level=jnp.full((K,), 1, jnp.int32),
        score=jnp.asarray(rng.standard_normal(K).astype(np.float32)),
        valid=jnp.asarray(rng.random(K) > 0.2))
    return jnp.asarray(dogs), cand


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_walk_bitexact_vs_xla(seed):
    cfg_off = SiftConfig(mode="lowe", pallas="off")
    cfg_on = SiftConfig(mode="lowe", pallas="on")
    dogs, cand = _case(seed)
    sig = [np.array([1.6, 2.0, 2.5, 3.2], np.float32)] * 4
    ref = refine_octave_lowe(dogs, dict(cand), cfg_off, sig, 0, 2.0)
    got = refine_octave_lowe(dogs, dict(cand), cfg_on, sig, 0, 2.0)
    for f in ("x", "y", "level", "scale", "valid"):
        np.testing.assert_array_equal(np.asarray(got[f]),
                                      np.asarray(ref[f]), err_msg=f)


def test_kernel_small_octave_falls_back():
    """H or W below the patch size must route to the XLA path (no crash,
    same outputs by construction)."""
    cfg_on = SiftConfig(mode="lowe", pallas="on")
    dogs, cand = _case(3, K=7, H=12, W=12)
    sig = [np.array([1.6, 2.0, 2.5, 3.2], np.float32)] * 4
    out = refine_octave_lowe(dogs, dict(cand), cfg_on, sig, 0, 2.0)
    assert np.asarray(out["x"]).shape == (7,)
