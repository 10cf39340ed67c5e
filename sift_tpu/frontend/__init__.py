"""SIFT frontend: jit-compiled scale-space pipeline (reference L4,
sift.hpp/sift.cpp, rebuilt TPU-first on masked fixed-size buffers)."""

from sift_tpu.frontend.pyramid import build_pyramid, Pyramid
from sift_tpu.frontend.sift import extract, extract_batch

__all__ = ["build_pyramid", "Pyramid", "extract", "extract_batch"]
