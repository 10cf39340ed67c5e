"""Keypoint refinement and edge/contrast filtering.

Replaces the reference's per-keypoint Vigra solves
(`Sift::_eliminateEdgeResponses`, sift.cpp:288-346) with batched closed-form
3x3 linear algebra over the whole fixed-size candidate buffer — one vmapped
gather + pure VPU math, no per-keypoint host loop.

parity semantics (each line cites the reference):
  * gradient/Hessian from the parity stencils (see kernels/derivatives.py);
  * the reference inverts -H and then *solves against the inverse*
    (sift.cpp:303-314), so its "offset" is x = (-H) @ g_parity  — with
    g_parity = -g_true this is x = H_parity @ g_true;
  * inversion failure (singular -H) filters the keypoint (sift.cpp:306-309);
  * reject if any offset component > 127.5, NO abs (sift.cpp:317-320);
  * contrast: (g_parity . x) * (0.5 + D) < 7.65 rejects — the reference
    multiplies where the paper adds (sift.cpp:321-329);
  * edge: 2x2 spatial Hessian from the parity Hessian's (0,0),(1,1),(0,1)
    entries; reject det < 0 or tr^2/det > (10+1)^2/10 = 12.1, with IEEE
    semantics at det == 0 (inf -> reject, 0/0 NaN -> keep) (sift.cpp:331-344);
  * the keypoint is NEVER moved (the Taylor step only filters).

lowe semantics: standard Lowe-2004 refinement — iterate the quadratic fit up
to 5 times moving the candidate to the neighbouring sample when the offset
exceeds 0.5, then apply the sub-pixel offset, contrast test on the
interpolated |D|, and the (r+1)^2/r edge test. Runs as a fixed-trip
`lax.fori_loop` (static shapes; convergence tracked by mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sift_tpu.config import SiftConfig
from sift_tpu.kernels.derivatives import scale_space_gradient_hessian


def _det3(h):
    return (h[..., 0, 0] * (h[..., 1, 1] * h[..., 2, 2] - h[..., 1, 2] * h[..., 2, 1])
            - h[..., 0, 1] * (h[..., 1, 0] * h[..., 2, 2] - h[..., 1, 2] * h[..., 2, 0])
            + h[..., 0, 2] * (h[..., 1, 0] * h[..., 2, 1] - h[..., 1, 1] * h[..., 2, 0]))


def solve3x3(h: jnp.ndarray, g: jnp.ndarray, eps: float = 1e-12):
    """Batched 3x3 solve via adjugate: returns (x, solvable_mask)."""
    det = _det3(h)
    adj = jnp.stack([
        jnp.stack([h[..., 1, 1] * h[..., 2, 2] - h[..., 1, 2] * h[..., 2, 1],
                   h[..., 0, 2] * h[..., 2, 1] - h[..., 0, 1] * h[..., 2, 2],
                   h[..., 0, 1] * h[..., 1, 2] - h[..., 0, 2] * h[..., 1, 1]], axis=-1),
        jnp.stack([h[..., 1, 2] * h[..., 2, 0] - h[..., 1, 0] * h[..., 2, 2],
                   h[..., 0, 0] * h[..., 2, 2] - h[..., 0, 2] * h[..., 2, 0],
                   h[..., 0, 2] * h[..., 1, 0] - h[..., 0, 0] * h[..., 1, 2]], axis=-1),
        jnp.stack([h[..., 1, 0] * h[..., 2, 1] - h[..., 1, 1] * h[..., 2, 0],
                   h[..., 0, 1] * h[..., 2, 0] - h[..., 0, 0] * h[..., 2, 1],
                   h[..., 0, 0] * h[..., 1, 1] - h[..., 0, 1] * h[..., 1, 0]], axis=-1),
    ], axis=-2)
    ok = jnp.abs(det) > eps
    safe_det = jnp.where(ok, det, 1.0)
    x = jnp.einsum("...ij,...j->...i", adj, g) / safe_det[..., None]
    return x, ok


def _gather_patch(stack: jnp.ndarray, lvl, y, x) -> jnp.ndarray:
    """3x3x3 [s,y,x] patch around (lvl, y, x) from a (L, H, W) stack."""
    return lax.dynamic_slice(stack, (lvl - 1, y - 1, x - 1), (3, 3, 3))


def refine_octave_parity(dogs: jnp.ndarray, cand: dict, cfg: SiftConfig) -> dict:
    """Apply the reference's filter chain; positions/levels unchanged."""
    L, H, W = dogs.shape
    xi = cand["x"].astype(jnp.int32)
    yi = cand["y"].astype(jnp.int32)
    li = cand["level"]

    patches = jax.vmap(lambda l, y, x: _gather_patch(dogs, l, y, x))(li, yi, xi)
    grad, hess = scale_space_gradient_hessian(patches, parity=True)

    neg_h = -hess
    det_negh = _det3(neg_h)
    invertible = jnp.abs(det_negh) > 1e-12          # vigra inverse() failure
    # x = (-H) @ g  (double inversion, sift.cpp:303-314)
    extremum = jnp.einsum("kij,kj->ki", neg_h, grad)

    offset_ok = jnp.all(extremum <= 127.5, axis=-1)  # no abs (sift.cpp:317)
    d_center = patches[:, 1, 1, 1]
    fv = jnp.einsum("ki,ki->k", grad, extremum) * (0.5 + d_center)
    contrast_ok = fv >= 7.65                          # reject < 7.65 (sift.cpp:326-329)

    dxx = hess[:, 0, 0]
    dyy = hess[:, 1, 1]
    dxy = hess[:, 0, 1]
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    t = (10.0 + 1.0) ** 2 / 10.0
    ratio = tr * tr / det                             # IEEE: inf/NaN preserved
    edge_ok = (det >= 0) & jnp.logical_not(ratio > t)

    keep = invertible & offset_ok & contrast_ok & edge_ok
    out = dict(cand)
    out["valid"] = cand["valid"] & keep
    return out


def _stencil_maps(dogs: jnp.ndarray) -> jnp.ndarray:
    """(11, L*H*W) flat stencil maps: center, grad (3), hessian uniques (6),
    plus a padding row.

    Per-keypoint 3x3x3 patch slices cost ~2 us each on TPU; precomputing the
    stencils as whole-stack shifted adds (pure VPU, the DoG stack is ~1 MB)
    turns each refinement iteration into ONE small (11, K) gather. Border
    values wrap via roll — harmless because lookups are clipped interior.
    """
    def sh(ds_, dy, dx):
        return jnp.roll(dogs, (-ds_, -dy, -dx), axis=(0, 1, 2))

    c = dogs
    dx = (sh(0, 0, 1) - sh(0, 0, -1)) * 0.5
    dy = (sh(0, 1, 0) - sh(0, -1, 0)) * 0.5
    ds = (sh(1, 0, 0) - sh(-1, 0, 0)) * 0.5
    dxx = sh(0, 0, 1) + sh(0, 0, -1) - 2.0 * c
    dyy = sh(0, 1, 0) + sh(0, -1, 0) - 2.0 * c
    dss = sh(1, 0, 0) + sh(-1, 0, 0) - 2.0 * c
    dxy = (sh(0, 1, 1) - sh(0, 1, -1) - sh(0, -1, 1) + sh(0, -1, -1)) * 0.25
    dxs = (sh(1, 0, 1) - sh(1, 0, -1) - sh(-1, 0, 1) + sh(-1, 0, -1)) * 0.25
    dys = (sh(1, 1, 0) - sh(1, -1, 0) - sh(-1, 1, 0) + sh(-1, -1, 0)) * 0.25
    maps = jnp.stack([c, dx, dy, ds, dxx, dyy, dss, dxy, dxs, dys])
    return maps.reshape(10, -1)


def _lookup(maps_flat: jnp.ndarray, li, yi, xi, H: int, W: int):
    """Gather the 10 stencil values at (li, yi, xi): returns
    (d_center (K,), grad (K, 3), hess (K, 3, 3))."""
    idx = (li * H + yi) * W + xi
    vals = jnp.take(maps_flat, idx, axis=1)            # (10, K)
    c, dx, dy, ds, dxx, dyy, dss, dxy, dxs, dys = vals
    grad = jnp.stack([dx, dy, ds], axis=-1)
    row0 = jnp.stack([dxx, dxy, dxs], axis=-1)
    row1 = jnp.stack([dxy, dyy, dys], axis=-1)
    row2 = jnp.stack([dxs, dys, dss], axis=-1)
    hess = jnp.stack([row0, row1, row2], axis=-2)
    return c, grad, hess


def refine_octave_lowe(dogs: jnp.ndarray, cand: dict, cfg: SiftConfig,
                       dog_sigmas, octave: int, octave_factor: float) -> dict:
    """Iterative sub-pixel refinement + contrast/edge filtering."""
    L, H, W = dogs.shape
    K = cand["x"].shape[0]
    xi0 = cand["x"].astype(jnp.int32)
    yi0 = cand["y"].astype(jnp.int32)
    li0 = cand["level"]
    maps = _stencil_maps(dogs)

    def body(_, state):
        xi, yi, li, _, _, _, converged = state
        d_center, grad, hess = _lookup(maps, li, yi, xi, H, W)
        off, solvable = solve3x3(hess, -grad)
        off = jnp.where(solvable[:, None], off, 0.0)
        small = jnp.all(jnp.abs(off) < 0.5, axis=-1)
        newly = jnp.logical_not(converged)
        step = jnp.where(newly[:, None] & jnp.logical_not(small)[:, None],
                         jnp.round(off).astype(jnp.int32), 0)
        xi = jnp.clip(xi + step[:, 0], 1, W - 2)
        yi = jnp.clip(yi + step[:, 1], 1, H - 2)
        li = jnp.clip(li + step[:, 2], 1, L - 2)
        converged = converged | small
        return xi, yi, li, off, grad, d_center, converged

    init = (xi0, yi0, li0, jnp.zeros((K, 3)), jnp.zeros((K, 3)),
            jnp.zeros((K,)), jnp.zeros((K,), bool))
    xi, yi, li, off, grad, d_center, converged = lax.fori_loop(0, 5, body, init)

    # Final quantities at the converged location.
    d_center, grad, hess = _lookup(maps, li, yi, xi, H, W)
    off, solvable = solve3x3(hess, -grad)

    d_hat = d_center + 0.5 * jnp.einsum("ki,ki->k", grad, off)
    contrast_ok = jnp.abs(d_hat) >= cfg.contrast_threshold * cfg.image_max

    dxx = hess[:, 0, 0]
    dyy = hess[:, 1, 1]
    dxy = hess[:, 0, 1]
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = cfg.edge_r
    edge_ok = (det > 0) & (tr * tr / jnp.where(det > 0, det, 1.0) < (r + 1) ** 2 / r)

    in_range = jnp.all(jnp.abs(off) < 0.6, axis=-1) & converged & solvable

    x = xi.astype(jnp.float32) + off[:, 0]
    y = yi.astype(jnp.float32) + off[:, 1]
    # sigma interpolation: dog level centre sigma * k^(ds), absolute scale.
    sig_table = jnp.asarray(dog_sigmas[octave], jnp.float32)
    k = jnp.float32(cfg.k)
    scale = sig_table[li] * jnp.power(k, off[:, 2]) * jnp.float32(octave_factor ** octave)

    out = dict(cand)
    out["x"] = x
    out["y"] = y
    out["level"] = li
    out["scale"] = scale
    out["valid"] = cand["valid"] & contrast_ok & edge_ok & in_range
    return out
