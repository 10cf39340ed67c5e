"""Pallas descriptor-accumulation kernel vs the XLA einsum formulation.

CPU CI runs the kernel through the Pallas interpreter; on a real TPU the
same assertions hold for the compiled Mosaic kernel. The two paths are NOT
bitwise equal by design: the XLA einsum rounds its soft-assignment
operands to bf16 (f32 accumulation), the kernel stays f32 throughout — so
agreement is asserted to bf16-rounding tolerance on the normalized
descriptors, and the kernel must sit at least as close to a float64 NumPy
oracle as the XLA path does.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sift_tpu.config import SiftConfig
from sift_tpu.frontend.windows import (descriptors_from_windows,
                                       descriptors_from_windows_multi,
                                       _finalize_descriptor)

INTERPRET = jax.devices()[0].platform != "tpu"
PALLAS = "on"        # off-TPU: routes through the interpreter


def _case(seed, K=37, d=48):
    rng = np.random.default_rng(seed)
    gx = rng.standard_normal((K, d, d)).astype(np.float32)
    gy = rng.standard_normal((K, d, d)).astype(np.float32)
    oy0 = rng.uniform(-d / 2 - 0.5, -d / 2 + 0.5, K).astype(np.float32)
    ox0 = rng.uniform(-d / 2 - 0.5, -d / 2 + 0.5, K).astype(np.float32)
    oris = rng.uniform(0.0, 360.0, (K, 2)).astype(np.float32)
    sw = rng.uniform(1.6, 3.2, K).astype(np.float32)
    return gx, gy, oy0, ox0, oris, sw


def _numpy_oracle(gx, gy, oy0, ox0, ori_deg, sw, cfg):
    """Float64 reference of the raw trilinear histogram + finalize."""
    K, d, _ = gx.shape
    P = d * d
    fgx = gx.reshape(K, P).astype(np.float64)
    fgy = gy.reshape(K, P).astype(np.float64)
    mag = np.sqrt(fgx ** 2 + fgy ** 2)
    ang = np.degrees(np.arctan2(fgy, fgx))
    rows = np.arange(d, dtype=np.float64)
    oy = (oy0[:, None, None] + rows[None, :, None]
          + np.zeros((1, 1, d))).reshape(K, P)
    ox = (ox0[:, None, None] + rows[None, None, :]
          + np.zeros((1, d, 1))).reshape(K, P)
    theta = np.deg2rad(ori_deg.astype(np.float64))
    hw = np.maximum(3.0 * sw.astype(np.float64), 1e-3)[:, None]
    u = (ox * np.cos(theta)[:, None] + oy * np.sin(theta)[:, None]) / hw
    v = (-ox * np.sin(theta)[:, None] + oy * np.cos(theta)[:, None]) / hw
    w = mag * np.exp(-(u * u + v * v) / 8.0)
    cc = np.arange(4, dtype=np.float64) - 1.5
    tu = np.maximum(0.0, 1.0 - np.abs(u[..., None] - cc))
    tv = np.maximum(0.0, 1.0 - np.abs(v[..., None] - cc))
    rel = np.mod(ang - ori_deg[:, None], 360.0)
    ob = rel / 45.0 - 0.5
    b0 = np.floor(ob)
    frac = ob - b0
    b0i = np.mod(b0.astype(np.int64), 8)
    b1i = np.mod(b0i + 1, 8)
    ooh = np.zeros((K, P, 8))
    np.put_along_axis(ooh, b0i[..., None], (1.0 - frac)[..., None], axis=2)
    # += for b1 (may collide with b0 only if BINS were 1; safe here)
    tmp = np.zeros_like(ooh)
    np.put_along_axis(tmp, b1i[..., None], frac[..., None], axis=2)
    ooh += tmp
    ooh *= w[..., None]
    desc = np.einsum("kpa,kpb,kpo->kabo", tv, tu, ooh).reshape(K, 128)
    return np.asarray(_finalize_descriptor(jnp.asarray(desc, jnp.float32),
                                           cfg))


@pytest.mark.parametrize("seed,d", [(0, 48), (1, 48), (2, 16)])
def test_matches_xla_path_to_bf16_tolerance(seed, d):
    cfg = SiftConfig(mode="lowe")
    gx, gy, oy0, ox0, oris, sw = _case(seed, d=d)
    J = [jnp.asarray(a) for a in (gx, gy, oy0, ox0, oris, sw)]
    got = np.asarray(descriptors_from_windows_multi(*J, cfg, pallas=PALLAS))
    want = np.stack([np.asarray(descriptors_from_windows(
        J[0], J[1], J[2], J[3], J[4][:, p], J[5], cfg))
        for p in range(2)], axis=1)
    assert got.shape == want.shape == (gx.shape[0], 2, 128)
    # bf16 rounding of the XLA operands bounds the legitimate gap.
    np.testing.assert_allclose(got, want, atol=6e-3)


@pytest.mark.parametrize("seed", [0, 3])
def test_kernel_at_least_as_accurate_as_xla(seed):
    """Against a float64 oracle the f32 kernel must not be worse than the
    bf16-operand XLA einsum (it should be strictly better)."""
    cfg = SiftConfig(mode="lowe")
    gx, gy, oy0, ox0, oris, sw = _case(seed, K=23)
    J = [jnp.asarray(a) for a in (gx, gy, oy0, ox0, oris, sw)]
    got = np.asarray(descriptors_from_windows_multi(*J, cfg, pallas=PALLAS))
    for p in range(2):
        oracle = _numpy_oracle(gx, gy, oy0, ox0, oris[:, p], sw, cfg)
        xla = np.asarray(descriptors_from_windows(
            J[0], J[1], J[2], J[3], J[4][:, p], J[5], cfg))
        err_pallas = np.abs(got[:, p] - oracle).max()
        err_xla = np.abs(xla - oracle).max()
        assert err_pallas <= err_xla * 1.05 + 1e-6, (err_pallas, err_xla)
        assert err_pallas < 2e-3, err_pallas


def test_fallback_matches_per_peak_loop():
    """pallas='off' must reduce to the per-peak XLA loop bit-exactly."""
    cfg = SiftConfig(mode="lowe")
    gx, gy, oy0, ox0, oris, sw = _case(5, K=11)
    J = [jnp.asarray(a) for a in (gx, gy, oy0, ox0, oris, sw)]
    got = np.asarray(descriptors_from_windows_multi(*J, cfg, pallas="off"))
    want = np.stack([np.asarray(descriptors_from_windows(
        J[0], J[1], J[2], J[3], J[4][:, p], J[5], cfg))
        for p in range(2)], axis=1)
    np.testing.assert_array_equal(got, want)
