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


PATCH_R = 8                # local-patch radius: 16x16 covers 5 +-1 steps
PATCH_D = 2 * PATCH_R


def _gather_local_patches(dogs: jnp.ndarray, y0, x0, pallas: str):
    """One (L, 16, 16) DoG patch per candidate, gathered ONCE.

    TPU gathers at data-dependent indices cost ~65 ns/element, so looking
    up 27 stencil values per candidate per refinement iteration (or
    pre-building 10 full-resolution stencil maps — 24 shifted copies of the
    DoG stack per octave, the r1 design) dominates the refine stage. This
    fetches a single local patch per candidate through the Pallas window
    kernel (the DoG levels ride the kernel's channel axis); every
    refinement iteration then reads the patch with bit-exact one-hot
    matmuls — pure MXU/VPU math, no further gathers. Measured v5e: the
    whole refine stage drops ~4x.
    """
    L, H, W = dogs.shape
    from sift_tpu.frontend.windows import _use_pallas
    if _use_pallas(pallas, PATCH_R):
        from sift_tpu.kernels.pallas.windows import gather_windows_pallas
        interp = jax.devices()[0].platform != "tpu"
        gl = jnp.zeros_like(y0)
        return gather_windows_pallas(dogs[:, None], gl, y0, x0,
                                     PATCH_R, interp)       # (K, L, 16, 16)
    dp = jnp.pad(dogs, ((0, 0), (0, max(PATCH_D - H, 0)),
                        (0, max(PATCH_D - W, 0))))
    return jax.vmap(lambda yy, xx: lax.dynamic_slice(
        dp, (0, yy, xx), (L, PATCH_D, PATCH_D)))(y0, x0)


def _sel(pos, n: int, dtype):
    """(K, 3, n) one-hot rows selecting pos-1, pos, pos+1 along an n-axis."""
    tri = jnp.arange(-1, 2, dtype=jnp.int32)
    return (pos[:, None, None] + tri[None, :, None]
            == jnp.arange(n, dtype=jnp.int32)[None, None, :]).astype(dtype)


def _local_lookup(flat_patch: jnp.ndarray, D: int, li, ly, lx):
    """Stencil quantities at patch-local (li, ly, lx), gather-free.

    flat_patch: (K, L, D*D) — the (K, L, D, D) patch with the spatial axes
    flattened ONCE by the caller so every selection runs on a 128-aligned
    lane axis (D*D = 256; separate 16-wide row/col selections waste 7/8 of
    the VPU lanes — measured 10.4 ms for the refine stage in r3, the
    extractor's biggest single term). The 3x3 spatial neighbourhood is one
    9-row one-hot contraction (HIGHEST precision: each output is exactly
    one product x * 1.0, bit-identical to a gather); the level axis is
    selected only when L > 3 (with the default dogs_per_epoch=3, li is
    clipped to the single interior level, so the whole L axis IS the
    3-level cube). Returns (d_center (K,), grad (K, 3), hess (K, 3, 3)).
    """
    K, L, _ = flat_patch.shape
    hp = lax.Precision.HIGHEST
    # 9-point flat spatial one-hot: rows ordered dy-major (dy, dx).
    dy = jnp.repeat(jnp.arange(-1, 2, dtype=jnp.int32), 3)
    dx = jnp.tile(jnp.arange(-1, 2, dtype=jnp.int32), 3)
    idx9 = ((ly[:, None] + dy[None]) * D
            + (lx[:, None] + dx[None]))                       # (K, 9)
    rc_sel = (idx9[..., None]
              == jnp.arange(D * D, dtype=jnp.int32)).astype(flat_patch.dtype)
    spatial = jnp.einsum("kif,klf->kli", rc_sel, flat_patch,
                         precision=hp)                         # (K, L, 9)
    if L == 3:
        cube = spatial
    else:
        lsel = _sel(li, L, flat_patch.dtype)                   # (K, 3, L)
        cube = jnp.einsum("ksl,kli->ksi", lsel, spatial, precision=hp)
    vals = cube.reshape(K, 3, 3, 3)                            # (s, y, x)
    grad, hess = scale_space_gradient_hessian(vals)
    return vals[:, 1, 1, 1], grad, hess


def refine_octave_lowe(dogs: jnp.ndarray, cand: dict, cfg: SiftConfig,
                       dog_sigmas, octave: int, octave_factor: float) -> dict:
    """Iterative sub-pixel refinement + contrast/edge filtering.

    Candidates move at most one sample per axis per iteration (VLFeat-style
    clamp; a rounded Taylor offset beyond +-1 signals an unstable fit, and
    bounding the walk lets the whole loop run on a pre-fetched 16x16 local
    patch with zero per-iteration gathers — see `_gather_local_patches`).
    """
    L, H, W = dogs.shape
    K = cand["x"].shape[0]
    xi0 = cand["x"].astype(jnp.int32)
    yi0 = cand["y"].astype(jnp.int32)
    li0 = cand["level"]
    y0 = jnp.clip(yi0 - PATCH_R, 0, max(H - PATCH_D, 0))
    x0 = jnp.clip(xi0 - PATCH_R, 0, max(W - PATCH_D, 0))
    patch = _gather_local_patches(dogs, y0, x0, cfg.pallas)
    Dp = patch.shape[-1]
    flat_patch = patch.reshape(K, patch.shape[1], Dp * Dp)

    from sift_tpu.frontend.windows import _use_pallas
    # Mosaic-compiled kernel validated bit-exact on v5e (r5, 3 seeds x
    # 5 fields vs the XLA walk) -> enabled under pallas="auto" like the
    # other kernels.
    import os as _os
    use_kernel = (L == 3 and Dp == PATCH_D and H >= PATCH_D
                  and W >= PATCH_D
                  and _os.environ.get("SIFT_REFINE_KERNEL", "1") != "0"
                  and _use_pallas(cfg.pallas, PATCH_R))
    if use_kernel:
        # VMEM-resident walk (kernels/pallas/refine.py): the six one-hot
        # lookup passes above ran 28.8x over the stage's bytes floor in
        # HBM (r5 roofline); the kernel keeps each patch on-chip for the
        # whole walk and returns only the final 27-value cube + state.
        # Same IEEE op sequence -> bit-identical to the XLA walk
        # (tests/unit/test_pallas_refine.py). L == 3 pins the interior
        # DoG level, so the scale axis never moves (matching the clip
        # below); other L take the XLA path.
        from sift_tpu.kernels.pallas.refine import refine_walk_pallas
        interp = jax.devices()[0].platform != "tpu"
        Kp = -(-K // 128) * 128
        padk = lambda a: jnp.pad(a, ((0, Kp - K),) + ((0, 0),) *
                                 (a.ndim - 1))
        patchT = padk(flat_patch.reshape(K, L * Dp * Dp)).T
        f32 = jnp.float32
        scal = jnp.stack([
            (xi0 - x0).astype(f32), (yi0 - y0).astype(f32),
            (1 - x0).astype(f32), ((W - 2) - x0).astype(f32),
            (1 - y0).astype(f32), ((H - 2) - y0).astype(f32),
            jnp.zeros((K,), f32), jnp.zeros((K,), f32)])
        outk = refine_walk_pallas(patchT, padk(scal.T).T, interp)
        cube = outk[:27, :K].T.reshape(K, 3, 3, 3)
        lx = outk[27, :K].astype(jnp.int32)
        ly = outk[28, :K].astype(jnp.int32)
        converged = outk[29, :K] > 0.5
        li = jnp.clip(li0, 1, L - 2)
        xi = x0 + lx
        yi = y0 + ly
        grad, hess = scale_space_gradient_hessian(cube)
        d_center = cube[:, 1, 1, 1]
        off, solvable = solve3x3(hess, -grad)
    else:
        def body(state):
            lx, ly, li, converged = state
            _, grad, hess = _local_lookup(flat_patch, Dp, li, ly, lx)
            off, solvable = solve3x3(hess, -grad)
            off = jnp.where(solvable[:, None], off, 0.0)
            small = jnp.all(jnp.abs(off) < 0.5, axis=-1)
            newly = jnp.logical_not(converged)
            step = jnp.where(
                newly[:, None] & jnp.logical_not(small)[:, None],
                jnp.clip(jnp.round(off), -1, 1).astype(jnp.int32),
                0)
            # clip in IMAGE coordinates (interior), expressed patch-locally
            lx = jnp.clip(lx + step[:, 0], 1 - x0, (W - 2) - x0)
            ly = jnp.clip(ly + step[:, 1], 1 - y0, (H - 2) - y0)
            li = jnp.clip(li + step[:, 2], 1, L - 2)
            converged = converged | small
            return lx, ly, li, converged

        # Unrolled (5 fixed trips): the rolled while-loop serialized five
        # tiny dependent programs; unrolling lets XLA fuse/pipeline
        # across trips.
        state = (xi0 - x0, yi0 - y0, li0, jnp.zeros((K,), bool))
        for _ in range(5):
            state = body(state)
        lx, ly, li, converged = state
        xi = x0 + lx
        yi = y0 + ly

        # Final quantities at the converged location.
        d_center, grad, hess = _local_lookup(flat_patch, Dp, li, ly, lx)
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
