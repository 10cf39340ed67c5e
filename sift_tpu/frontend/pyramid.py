"""Gaussian / DoG pyramid construction.

Two schedules, one structure (`octaves` octaves, `dogs_per_epoch+1` Gaussians
and `dogs_per_epoch` DoGs per octave — the reference's layout, sift.cpp:385).

parity (ref `Sift::_createDOGs`, sift.cpp:381-417):
  * every Gaussian is a *full re-blur of the previous Gaussian* with the new
    absolute sigma k^exp * sigma (sift.cpp:395-397) — not an incremental blur,
    so effective blur accumulates quadratically (quirk kept);
  * the recorded DoG "scale" is the *difference* of the two sigmas
    (sift.cpp:399);
  * the next octave is seeded from the second-last Gaussian (index d-1) via
    blur + nearest-resize to ((H+1)//2,(W+1)//2), with exp -= 2
    (sift.cpp:405-412);
  * DoG pixels carry the +128 offset (algorithms.cpp:60).

lowe (production): classic Lowe-2004 scale space — within-octave target
sigmas sigma*k^j reached by *incremental* blurs, next octave seeded by 2x
subsampling (stride-2 slice) of the Gaussian at index d-1 (exactly a factor-2
sigma when k^(d-1) == 2, e.g. the default k=sqrt(2), d=3).

All sigmas are static config-derived floats: the whole pyramid compiles to a
fixed chain of stencils that XLA fuses; there is no dynamic shape anywhere.
Batched over a leading image axis transparently (kernels accept (..., H, W)).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

from sift_tpu.config import SiftConfig
from sift_tpu.kernels.gaussian import gaussian_blur, incremental_sigma
from sift_tpu.kernels.resize import downsample_half, upsample_double
from sift_tpu.kernels.dog import dog


@struct.dataclass
class Pyramid:
    """Per-octave stacks. gauss[o]: (..., L+1, H_o, W_o); dogs[o]: (..., L, H_o, W_o).

    Sigma tables are static numpy metadata (pytree aux data):
      gauss_sigmas[o, j] — recorded sigma of Gaussian (o, j). In parity mode
        this is the reference's *recorded* scale (k^exp * sigma bookkeeping);
        in lowe mode the true within-octave sigma.
      dog_sigmas[o, j]   — recorded scale of DoG (o, j): parity = sigma
        difference (quirk); lowe = geometric-mean sigma of the pair's levels.
      abs_sigmas[o, j]   — lowe only: true absolute sigma (x 2^octave).
    """

    gauss: Tuple[jnp.ndarray, ...]
    dogs: Tuple[jnp.ndarray, ...]
    gauss_sigmas: np.ndarray = struct.field(pytree_node=False)
    dog_sigmas: np.ndarray = struct.field(pytree_node=False)
    abs_sigmas: np.ndarray = struct.field(pytree_node=False)

    @property
    def num_octaves(self) -> int:
        return len(self.gauss)

    @property
    def levels_per_octave(self) -> int:
        return self.gauss[0].shape[-3]


def parity_sigma_schedule(cfg: SiftConfig):
    """Recorded sigma bookkeeping of the reference (sift.cpp:388-412)."""
    o, d = cfg.octaves, cfg.dogs_per_epoch
    gs = np.zeros((o, d + 1), np.float64)
    ds = np.zeros((o, d), np.float64)
    gs[0, 0] = cfg.sigma
    exp = 0
    for i in range(o):
        for j in range(1, d + 1):
            gs[i, j] = (cfg.k ** exp) * cfg.sigma
            ds[i, j - 1] = gs[i, j] - gs[i, j - 1]
            exp += 1
        if i < o - 1:
            gs[i + 1, 0] = gs[i, d - 1]
            exp -= 2
    return gs, ds


def lowe_sigma_schedule(cfg: SiftConfig):
    """Within-octave sigmas sigma*k^j; octave o multiplies absolute sigma by 2^o
    (exact when k^(d-1)==2; otherwise by k^(d-1), which we track)."""
    o, d = cfg.octaves, cfg.dogs_per_epoch
    within = np.array([cfg.sigma * cfg.k ** j for j in range(d + 1)], np.float64)
    octave_factor = cfg.k ** (d - 1)
    gs = np.tile(within, (o, 1))
    abs_s = gs * (octave_factor ** np.arange(o))[:, None]
    # DoG level j sits between Gaussians j and j+1.
    ds = np.sqrt(gs[:, :-1] * gs[:, 1:])
    return gs, ds, abs_s


def build_pyramid(img: jnp.ndarray, cfg: SiftConfig) -> Pyramid:
    """img: (..., H, W) float32. Returns the full Gaussian+DoG pyramid."""
    parity = cfg.mode == "parity"
    d = cfg.dogs_per_epoch

    if cfg.subpixel:
        if parity:
            # ref: blur sigma=1.0 then nearest 2x (sift.cpp:20-21, algorithms.cpp:38-49)
            img = upsample_double(gaussian_blur(img, 1.0))
        else:
            import jax
            img = jax.image.resize(img, img.shape[:-2] + (img.shape[-2] * 2, img.shape[-1] * 2),
                                   method="bilinear")

    gauss_levels = []
    dog_levels = []

    if parity:
        gs, ds = parity_sigma_schedule(cfg)
        abs_s = gs.copy()
        base = gaussian_blur(img, cfg.sigma)
        for i in range(cfg.octaves):
            levels = [base]
            for j in range(1, d + 1):
                # Full re-blur with the recorded sigma (reference quirk).
                levels.append(gaussian_blur(levels[-1], float(gs[i, j])))
            gauss_levels.append(jnp.stack(levels, axis=-3))
            dog_levels.append(jnp.stack(
                [dog(levels[j - 1], levels[j], parity_offset=True) for j in range(1, d + 1)],
                axis=-3))
            if i < cfg.octaves - 1:
                # reduceToNextLevel(second-last, its recorded sigma) (sift.cpp:406-409)
                base = downsample_half(gaussian_blur(levels[d - 1], float(gs[i, d - 1])))
    else:
        gs, ds, abs_s = lowe_sigma_schedule(cfg)
        # Bring the input to base sigma. Assume the raw image has sigma_n=0.5
        # of nominal pre-blur (Lowe 2004 §3.3); doubled if upsampled.
        sigma_n = 1.0 if cfg.subpixel else 0.5
        base = gaussian_blur(img, incremental_sigma(sigma_n, cfg.sigma)) \
            if cfg.sigma > sigma_n else img
        for i in range(cfg.octaves):
            levels = [base]
            for j in range(1, d + 1):
                delta = incremental_sigma(float(gs[i, j - 1]), float(gs[i, j]))
                levels.append(gaussian_blur(levels[-1], delta))
            gauss_levels.append(jnp.stack(levels, axis=-3))
            dog_levels.append(jnp.stack(
                [dog(levels[j - 1], levels[j]) for j in range(1, d + 1)], axis=-3))
            if i < cfg.octaves - 1:
                # Stride-2 subsample of the level whose sigma is (about) 2x base.
                base = levels[d - 1][..., ::2, ::2]

    return Pyramid(gauss=tuple(gauss_levels), dogs=tuple(dog_levels),
                   gauss_sigmas=gs, dog_sigmas=ds, abs_sigmas=abs_s)
