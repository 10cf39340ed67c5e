"""Scale-space 3-D gradient and Hessian stencils for keypoint refinement.

Operates on gathered (..., 3, 3, 3) DoG patches laid out [s, y, x] around a
candidate (level s=1, y=1, x=1 is the centre). Batched over keypoints with
vmap; the gathers happen once per keypoint, the stencils are pure VPU math.

Reference (`alg::foDerivative` / `soDerivative`, algorithms.cpp:66-106) has
three quirks reproduced by parity=True:
  * the gradient is sign-flipped: dx=(left-right)/2, dy=(up-down)/2,
    ds=(below-above)/2 (algorithms.cpp:69-71);
  * the Hessian's dys term's first difference cancels itself
    (img[2](x,y+1) - img[2](x,y+1) == 0, algorithms.cpp:91-92), leaving
    dys = (img[0](x,y-1) - img[0](x,y+1)) / 2;
  * note `soDerivative`'s matrix is written (col,row) but is symmetric in the
    entries actually used downstream, so layout doesn't matter for parity.

The refinement step itself (`Sift::_eliminateEdgeResponses`,
sift.cpp:288-346) computes extremum_offset = (-H)^-1 ... twice-inverted:
`inverse(-H)` then `linearSolve(inverse(-H), g, x)` solves
(-H)^-1 x = g, i.e. x = (-H) g. With the sign-flipped parity gradient
g = -g_true this yields x = H_parity @ g_true. `refine.py` owns that logic;
this module only supplies the stencils.
"""

from __future__ import annotations

import jax.numpy as jnp


def scale_space_gradient_hessian(patch: jnp.ndarray, parity: bool = False):
    """patch: (..., 3, 3, 3) laid out [s, y, x]. Returns (grad (...,3), hess (...,3,3)).

    Component order is (x, y, s) to match the reference's solve layout.
    """
    p = patch
    c = p[..., 1, 1, 1]

    if parity:
        dx = (p[..., 1, 1, 0] - p[..., 1, 1, 2]) / 2.0
        dy = (p[..., 1, 0, 1] - p[..., 1, 2, 1]) / 2.0
        ds = (p[..., 0, 1, 1] - p[..., 2, 1, 1]) / 2.0
    else:
        dx = (p[..., 1, 1, 2] - p[..., 1, 1, 0]) / 2.0
        dy = (p[..., 1, 2, 1] - p[..., 1, 0, 1]) / 2.0
        ds = (p[..., 2, 1, 1] - p[..., 0, 1, 1]) / 2.0
    grad = jnp.stack([dx, dy, ds], axis=-1)

    dxx = p[..., 1, 1, 2] + p[..., 1, 1, 0] - 2.0 * c
    dyy = p[..., 1, 2, 1] + p[..., 1, 0, 1] - 2.0 * c
    dss = p[..., 2, 1, 1] + p[..., 0, 1, 1] - 2.0 * c
    # Cross terms: the correct central-difference divisor is 4; the reference
    # divides by 2 (algorithms.cpp:85-92), doubling every off-diagonal entry —
    # kept only in parity mode.
    cross_div = 2.0 if parity else 4.0
    dxy = (p[..., 1, 2, 2] - p[..., 1, 2, 0] - p[..., 1, 0, 2] + p[..., 1, 0, 0]) / cross_div
    dxs = (p[..., 2, 1, 2] - p[..., 2, 1, 0] - p[..., 0, 1, 2] + p[..., 0, 1, 0]) / cross_div
    if parity:
        # dys bug: the img[2] pair cancels (algorithms.cpp:91-92).
        dys = (p[..., 0, 0, 1] - p[..., 0, 2, 1]) / 2.0
    else:
        dys = (p[..., 2, 2, 1] - p[..., 2, 0, 1] - p[..., 0, 2, 1] + p[..., 0, 0, 1]) / 4.0

    row0 = jnp.stack([dxx, dxy, dxs], axis=-1)
    row1 = jnp.stack([dxy, dyy, dys], axis=-1)
    row2 = jnp.stack([dxs, dys, dss], axis=-1)
    hess = jnp.stack([row0, row1, row2], axis=-2)
    return grad, hess
