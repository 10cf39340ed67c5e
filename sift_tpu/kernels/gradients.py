"""Dense gradient magnitude / orientation maps.

Reference (`alg::gradientMagnitude` / `gradientOrientation`,
algorithms.cpp:108-116, driven per-pixel by `Sift::_createMagnitudePyramid` /
`_createOrientationPyramid`, sift.cpp:130-160):

  dx = I(x+1, y) - I(x-1, y)          (no /2)
  dy = I(x, y+1) - I(x, y-1)
  magnitude   = sqrt(dx^2 + dy^2)
  orientation = fmod(atan2(dy, dx) + 360, 360)

The reference's orientation quirk (SURVEY §2 #19): atan2 returns *radians* in
[-pi, pi] but is then wrapped as if it were *degrees*, so values land only in
[0, pi] ∪ [360-pi, 360). Parity mode keeps this; lowe mode converts to real
degrees first.

Computed for interior pixels only; the 1-pixel border is 0 (sift.cpp:137-141).
Whole-map computation (not per-keypoint): one fused VPU pass per pyramid
level, shared by orientation assignment and descriptors.
"""

from __future__ import annotations

import jax.numpy as jnp


def gradient_magnitude_orientation(img: jnp.ndarray, parity: bool = False):
    """Returns (magnitude, orientation_degrees) maps, shape = img (..., H, W)."""
    # Central differences; x indexes width (axis -1), y height (axis -2).
    dx = jnp.zeros_like(img)
    dy = jnp.zeros_like(img)
    dx = dx.at[..., 1:-1].set(img[..., 2:] - img[..., :-2])
    dy = dy.at[..., 1:-1, :].set(img[..., 2:, :] - img[..., :-2, :])

    mag = jnp.sqrt(dx * dx + dy * dy)
    theta = jnp.arctan2(dy, dx)  # radians in [-pi, pi]
    if parity:
        # Radians-as-degrees wrap (reference quirk, algorithms.cpp:115).
        ori = jnp.mod(theta + 360.0, 360.0)
    else:
        ori = jnp.mod(jnp.degrees(theta) + 360.0, 360.0)

    # Zero the border (reference computes interior only, border stays 0).
    interior = jnp.zeros(img.shape[-2:], bool).at[1:-1, 1:-1].set(True)
    mag = jnp.where(interior, mag, 0.0)
    ori = jnp.where(interior, ori, 0.0)
    return mag, ori
