"""Kernel library vs NumPy/SciPy oracles (SURVEY.md §4 'kernel unit tests')."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from sift_tpu.kernels import (
    gaussian_blur,
    gaussian_kernel_1d,
    resize_nearest,
    downsample_half,
    upsample_double,
    dog,
    gradient_magnitude_orientation,
    weighted_histogram,
    parabola_vertex,
    scale_space_gradient_hessian,
)

RNG = np.random.RandomState(0)


class TestGaussianBlur:
    @pytest.mark.parametrize("sigma", [1.0, 1.6, 2.262742])
    def test_matches_scipy_mirror(self, sigma):
        img = RNG.rand(37, 53).astype(np.float32) * 255.0
        ours = np.asarray(gaussian_blur(jnp.asarray(img), sigma))
        ref = ndi.gaussian_filter(img.astype(np.float64), sigma,
                                  truncate=3.0, mode="mirror")
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)

    def test_kernel_normalized(self):
        k = gaussian_kernel_1d(1.6)
        assert abs(k.sum() - 1.0) < 1e-6
        assert len(k) == 2 * int(3 * 1.6 + 0.5) + 1  # Vigra radius rule

    def test_batched(self):
        imgs = RNG.rand(3, 16, 20).astype(np.float32)
        out = np.asarray(gaussian_blur(jnp.asarray(imgs), 1.6))
        for i in range(3):
            single = np.asarray(gaussian_blur(jnp.asarray(imgs[i]), 1.6))
            np.testing.assert_allclose(out[i], single, rtol=1e-6)

    def test_radius_larger_than_image(self):
        img = RNG.rand(5, 5).astype(np.float32)
        ours = np.asarray(gaussian_blur(jnp.asarray(img), 3.0))
        ref = ndi.gaussian_filter(img.astype(np.float64), 3.0,
                                  truncate=3.0, mode="mirror")
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TestResize:
    def test_downsample_shape_rule(self):
        img = jnp.arange(7 * 9, dtype=jnp.float32).reshape(7, 9)
        out = downsample_half(img)
        assert out.shape == (4, 5)  # (H+1)//2, (W+1)//2 (algorithms.cpp:28)

    def test_upsample_shape_rule(self):
        img = jnp.zeros((7, 9))
        assert upsample_double(img).shape == (14, 18)

    def test_vigra_rounding_rule(self):
        # dest i -> src int(i*(s-1)/(d-1)+0.5)
        src = jnp.arange(6, dtype=jnp.float32).reshape(1, 6)
        out = np.asarray(resize_nearest(src, 1, 3))
        # ratio (6-1)/(3-1)=2.5 -> indices int(0.5)=0, int(3.0)=3, int(5.5)=5
        np.testing.assert_array_equal(out[0], [0, 3, 5])

    def test_identity(self):
        img = RNG.rand(8, 8).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(resize_nearest(jnp.asarray(img), 8, 8)), img)


class TestDog:
    def test_parity_offset(self):
        a = jnp.full((4, 4), 10.0)
        b = jnp.full((4, 4), 14.0)
        np.testing.assert_allclose(np.asarray(dog(a, b, parity_offset=True)), 132.0)
        np.testing.assert_allclose(np.asarray(dog(a, b)), 4.0)


class TestGradients:
    def test_values_interior(self):
        img = RNG.rand(10, 12).astype(np.float32) * 255
        mag, ori = gradient_magnitude_orientation(jnp.asarray(img), parity=True)
        mag, ori = np.asarray(mag), np.asarray(ori)
        x, y = 5, 4  # x=col, y=row
        dx = img[y, x + 1 - 1 + 1] if False else img[y, x + 1] - img[y, x - 1]
        dy = img[y + 1, x] - img[y - 1, x]
        np.testing.assert_allclose(mag[y, x], np.hypot(dx, dy), rtol=1e-5)
        expected_ori = np.fmod(np.arctan2(dy, dx) + 360.0, 360.0)
        np.testing.assert_allclose(ori[y, x], expected_ori, rtol=1e-4)

    def test_border_zero(self):
        img = RNG.rand(6, 6).astype(np.float32)
        mag, ori = gradient_magnitude_orientation(jnp.asarray(img))
        assert np.all(np.asarray(mag)[0, :] == 0)
        assert np.all(np.asarray(mag)[:, -1] == 0)

    def test_lowe_mode_degrees(self):
        # gradient pointing +x -> 0 deg; pointing +y -> 90 deg
        img = np.tile(np.arange(8, dtype=np.float32), (8, 1))
        _, ori = gradient_magnitude_orientation(jnp.asarray(img))
        assert abs(float(ori[4, 4])) < 1e-4
        _, ori = gradient_magnitude_orientation(jnp.asarray(img.T))
        np.testing.assert_allclose(float(ori[4, 4]), 90.0, atol=1e-4)


class TestHistogram:
    def test_basic_36(self):
        vals = jnp.asarray([5.0, 15.0, 355.0, 125.0])
        w = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        h = np.asarray(weighted_histogram(vals, w, 36, 10.0))
        assert h[0] == 1.0 and h[1] == 2.0 and h[35] == 3.0 and h[12] == 4.0

    def test_parity_fold_35(self):
        vals = jnp.asarray([355.0])  # bin 35 -> %35 -> 0
        h = np.asarray(weighted_histogram(vals, jnp.asarray([2.0]), 36, 10.0,
                                          parity_fold=True))
        assert h[0] == 2.0 and h[35] == 0.0

    def test_nan_goes_to_bin0(self):
        vals = jnp.asarray([jnp.nan, 45.0])
        h = np.asarray(weighted_histogram(vals, jnp.asarray([1.0, 1.0]), 8, 45.0,
                                          parity_fold=True))
        assert h[0] == 1.0 and h[1] == 1.0

    def test_batched(self):
        vals = jnp.asarray(RNG.rand(5, 256) * 360, jnp.float32)
        w = jnp.asarray(RNG.rand(5, 256), jnp.float32)
        h = np.asarray(weighted_histogram(vals, w, 36, 10.0))
        assert h.shape == (5, 36)
        np.testing.assert_allclose(h.sum(-1), np.asarray(w).sum(-1), rtol=1e-4)


class TestParabola:
    def test_exact_vertex(self):
        # y = -(x-3)^2 + 7 through x = 1, 2, 4
        f = lambda x: -((x - 3.0) ** 2) + 7.0
        v = parabola_vertex(1.0, f(1.0), 2.0, f(2.0), 4.0, f(4.0))
        np.testing.assert_allclose(float(v), 3.0, rtol=1e-5)

    def test_parity_nan(self):
        v = parabola_vertex(1.0, 1.0, 2.0, 2.0, 3.0, 1.0, parity=True)
        assert np.isnan(float(v))

    def test_flat_fallback(self):
        v = parabola_vertex(1.0, 2.0, 2.0, 2.0, 3.0, 2.0)
        np.testing.assert_allclose(float(v), 2.0)


class TestScaleSpaceDerivatives:
    def _patch(self):
        return RNG.rand(3, 3, 3).astype(np.float32) * 255

    def test_lowe_gradient_sign(self):
        p = np.zeros((3, 3, 3), np.float32)
        p[1, 1, 2] = 2.0  # +x neighbour
        g, _ = scale_space_gradient_hessian(jnp.asarray(p))
        assert float(g[0]) == 1.0  # d/dx positive
        gp, _ = scale_space_gradient_hessian(jnp.asarray(p), parity=True)
        assert float(gp[0]) == -1.0  # reference sign flip

    def test_parity_dys_bug(self):
        p = self._patch()
        _, h = scale_space_gradient_hessian(jnp.asarray(p), parity=True)
        expected_dys = (p[0, 0, 1] - p[0, 2, 1]) / 2.0
        np.testing.assert_allclose(float(h[1, 2]), expected_dys, rtol=1e-5)

    def test_lowe_hessian_symmetric_and_correct(self):
        # quadratic f = x^2 + 2y^2 + 3s^2 + xy sampled on the 3x3x3 grid
        s, y, x = np.meshgrid(np.arange(-1, 2), np.arange(-1, 2),
                              np.arange(-1, 2), indexing="ij")
        f = (x ** 2 + 2 * y ** 2 + 3 * s ** 2 + x * y).astype(np.float32)
        g, h = scale_space_gradient_hessian(jnp.asarray(f))
        h = np.asarray(h)
        np.testing.assert_allclose(g, 0.0, atol=1e-6)
        np.testing.assert_allclose(np.diag(h), [2.0, 4.0, 6.0], rtol=1e-6)
        np.testing.assert_allclose(h[0, 1], 1.0, rtol=1e-6)
        np.testing.assert_allclose(h, h.T, rtol=1e-6)

    def test_batched_vmap(self):
        ps = jnp.asarray(RNG.rand(7, 3, 3, 3).astype(np.float32))
        g, h = jax.vmap(scale_space_gradient_hessian)(ps)
        assert g.shape == (7, 3) and h.shape == (7, 3, 3)
