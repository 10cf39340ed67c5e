"""Pallas window-gather kernel vs the XLA dynamic_slice formulation.

CPU CI runs the kernel through the Pallas interpreter; on a real TPU the
same assertions hold for the compiled Mosaic kernel (verified on v5e:
bit-exact, 0.147 ms vs 0.869 ms for 512 keypoints at 600x488 — BENCH.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sift_tpu.kernels.pallas.windows import gather_windows_pallas

INTERPRET = jax.devices()[0].platform != "tpu"


def _case(seed, L=4, H=123, W=150, K=29, r=24):
    rng = np.random.default_rng(seed)
    d = 2 * r
    maps = rng.standard_normal((2, L, H, W)).astype(np.float32)
    gl = rng.integers(0, L, K).astype(np.int32)
    y0 = rng.integers(0, H - d, K).astype(np.int32)
    x0 = rng.integers(0, W - d, K).astype(np.int32)
    return maps, gl, y0, x0, r, d


@pytest.mark.parametrize("seed,shape", [(0, (123, 150)), (1, (600, 488)),
                                        (2, (75, 61))])
def test_matches_numpy_gather_bitexact(seed, shape):
    H, W = shape
    r = 24 if min(shape) >= 48 else 12
    maps, gl, y0, x0, r, d = _case(seed, H=H, W=W, r=r)
    got = np.asarray(gather_windows_pallas(
        jnp.asarray(maps), jnp.asarray(gl), jnp.asarray(y0),
        jnp.asarray(x0), r, INTERPRET))
    want = np.stack([maps[:, gl[k], y0[k]:y0[k] + d, x0[k]:x0[k] + d]
                     for k in range(gl.shape[0])])
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_boundary_corners():
    """Windows flush against every image border."""
    rng = np.random.default_rng(3)
    L, H, W, r = 2, 80, 96, 24
    d = 2 * r
    maps = rng.standard_normal((2, L, H, W)).astype(np.float32)
    y0 = np.array([0, 0, H - d, H - d, (H - d) // 2], np.int32)
    x0 = np.array([0, W - d, 0, W - d, (W - d) // 2], np.int32)
    gl = np.array([0, 1, 0, 1, 1], np.int32)
    got = np.asarray(gather_windows_pallas(
        jnp.asarray(maps), jnp.asarray(gl), jnp.asarray(y0),
        jnp.asarray(x0), r, INTERPRET))
    want = np.stack([maps[:, gl[k], y0[k]:y0[k] + d, x0[k]:x0[k] + d]
                     for k in range(5)])
    np.testing.assert_array_equal(got, want)


def test_frontend_pallas_flag_equivalence():
    """extract() with pallas="on" (interpreter off-TPU) vs pallas="off":
    keypoint selection and orientations must be exact — the window-fetch
    kernel is a bit-exact drop-in for the XLA gather. Descriptors agree to
    bf16 tolerance only, BY DESIGN since r5: the flag also selects the
    VMEM-resident descriptor kernel, which accumulates in f32 where the
    XLA einsum rounds its operands to bf16 (the kernel is the MORE
    accurate path — tests/unit/test_pallas_descriptor.py pins both the
    tolerance and the accuracy ordering against a float64 oracle)."""
    from sift_tpu.config import SiftConfig
    from sift_tpu.frontend.sift import extract
    import scipy.ndimage as ndi

    rng = np.random.RandomState(5)
    img = ndi.gaussian_filter(rng.rand(96, 128), 2.0)
    img = ((img - img.min()) / np.ptp(img) * 255).astype(np.float32)

    kp_off = extract(jnp.asarray(img), SiftConfig(mode="lowe", pallas="off"))
    kp_on = extract(jnp.asarray(img), SiftConfig(mode="lowe", pallas="on"))
    np.testing.assert_array_equal(np.asarray(kp_off.valid),
                                  np.asarray(kp_on.valid))
    v = np.asarray(kp_off.valid)
    np.testing.assert_allclose(np.asarray(kp_off.desc)[v],
                               np.asarray(kp_on.desc)[v], atol=6e-3)
    np.testing.assert_array_equal(np.asarray(kp_off.orientation)[v],
                                  np.asarray(kp_on.orientation)[v])


def test_bf16_maps_kernel_matches_slice_path():
    """bf16 maps: the (16, 128)-tiled kernel path must select exactly the
    same bf16 values as a plain numpy slice of the cast maps (the
    quantization happens once at the map cast; the fetch is exact)."""
    rng = np.random.default_rng(11)
    L, H, W, r = 3, 123, 150, 24
    d = 2 * r
    K = 37
    maps = rng.standard_normal((2, L, H, W)).astype(np.float32)
    maps_bf = jnp.asarray(maps).astype(jnp.bfloat16)
    gl = rng.integers(0, L, K).astype(np.int32)
    y0 = rng.integers(0, H - d, K).astype(np.int32)
    x0 = rng.integers(0, W - d, K).astype(np.int32)
    got = np.asarray(gather_windows_pallas(
        maps_bf, jnp.asarray(gl), jnp.asarray(y0), jnp.asarray(x0), r,
        INTERPRET).astype(jnp.float32))
    ref = np.asarray(maps_bf.astype(jnp.float32))
    want = np.stack([ref[:, gl[k], y0[k]:y0[k] + d, x0[k]:x0[k] + d]
                     for k in range(K)])
    np.testing.assert_array_equal(got, want)


def test_window_dtype_bf16_extraction_quality():
    """cfg.window_dtype='bfloat16' must keep the keypoint set identical
    and descriptors within the measured quantization envelope (the r5
    groundwork numbers: 0 flips, desc delta ~1e-2 max)."""
    from sift_tpu.config import SiftConfig
    from sift_tpu.frontend.sift import extract_batch
    import scipy.ndimage as ndi

    rng = np.random.RandomState(5)
    img = ndi.gaussian_filter(rng.rand(96, 128), 2.0)
    img = ((img - img.min()) / np.ptp(img) * 255).astype(np.float32)
    imgs = jnp.asarray(np.stack([img, np.roll(img, 3, axis=1)]))

    a = extract_batch(imgs, SiftConfig(mode="lowe"), True)
    b = extract_batch(imgs, SiftConfig(mode="lowe",
                                       window_dtype="bfloat16"), True)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    v = np.asarray(a.valid)
    dd = np.abs(np.asarray(a.desc)[v] - np.asarray(b.desc)[v])
    # Weak-gradient keypoints on this smooth synthetic image see larger
    # RELATIVE quantization on single components (max ~0.07); the
    # envelope that matters for matching is the aggregate drift.
    assert dd.mean() < 1e-3, dd.mean()
    assert np.percentile(dd, 99) < 2e-2, np.percentile(dd, 99)
    assert dd.max() < 0.1, dd.max()
    do = np.abs(np.asarray(a.orientation)[v]
                - np.asarray(b.orientation)[v])
    do = np.minimum(do, 360 - do)
    # Near-flat histograms amplify the quantization at the parabola peak
    # for a handful of weak keypoints (max ~5 deg); the bulk stays tight.
    assert np.percentile(do, 95) < 1.0, np.percentile(do, 95)
    assert do.max() < 10.0, do.max()
