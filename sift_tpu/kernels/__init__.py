"""Stateless image/math kernels (TPU-native equivalents of the reference's
`sift::alg` free functions, /root/reference/algorithms.cpp).

All kernels are pure, batched over arbitrary leading dims where meaningful,
and traceable under `jax.jit` / `jax.vmap`. Where measurement shows the
XLA formulation losing, a Pallas kernel lives under
`sift_tpu.kernels.pallas` (currently: the per-keypoint window gather,
5.9x vs vmapped dynamic_slice on v5e, and the streaming large-N top-2
matcher — see kernels/pallas/windows.py and match.py);
stages where XLA already wins (blur as banded MXU matmul, histogram
contractions) deliberately have no Pallas version — BENCH.md records the
measured comparisons both ways.
"""

from sift_tpu.kernels.gaussian import gaussian_kernel_1d, gaussian_blur
from sift_tpu.kernels.resize import resize_nearest, downsample_half, upsample_double
from sift_tpu.kernels.dog import dog
from sift_tpu.kernels.gradients import gradient_magnitude_orientation
from sift_tpu.kernels.histogram import weighted_histogram, parabola_vertex
from sift_tpu.kernels.derivatives import scale_space_gradient_hessian

__all__ = [
    "gaussian_kernel_1d",
    "gaussian_blur",
    "resize_nearest",
    "downsample_half",
    "upsample_double",
    "dog",
    "gradient_magnitude_orientation",
    "weighted_histogram",
    "parabola_vertex",
    "scale_space_gradient_hessian",
]
