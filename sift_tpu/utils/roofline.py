"""Roofline accounting for jitted stages (SURVEY.md §5 tracing bullet).

FLOP and byte counts come from XLA's own cost analysis of the *compiled*
program (`Compiled.cost_analysis()`), not hand formulas — they reflect
what the compiler actually emitted after fusion. Combined with a measured
chained time this yields achieved TFLOP/s / GB/s and the distance to the
hardware roofline, naming which wall (compute or HBM) each stage sits
against — the "what do we optimize next" table in BENCH.md.

Peaks are for TPU v5e (the bench target): 197 TFLOP/s bf16 MXU, ~819 GB/s
HBM. f32 matmuls pass through the MXU at roughly half rate; XLA reports
algorithmic flops, so percent-of-peak for f32-heavy stages is conservative.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax

V5E_PEAK_FLOPS_BF16 = 197e12
V5E_PEAK_FLOPS_F32 = 98.5e12
V5E_HBM_BYTES_S = 819e9


def compiled_costs(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis of `jit(fn)(*args)`: flops, bytes accessed."""
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):       # older jax: list per computation
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return {"flops": flops, "bytes": byts}


def roofline(name: str, seconds: float, flops: float, bytes_: float,
             peak_flops: float = V5E_PEAK_FLOPS_BF16,
             peak_bytes_s: float = V5E_HBM_BYTES_S) -> Dict:
    """Achieved rates and % of peak; names the binding wall."""
    tflops = flops / max(seconds, 1e-12) / 1e12
    gbs = bytes_ / max(seconds, 1e-12) / 1e9
    pct_compute = 100.0 * tflops * 1e12 / peak_flops
    pct_hbm = 100.0 * gbs * 1e9 / peak_bytes_s
    # Which peak would this stage hit first if sped up uniformly?
    bound = "compute" if pct_compute >= pct_hbm else "memory"
    # Arithmetic intensity vs machine balance point.
    intensity = flops / max(bytes_, 1.0)
    balance = peak_flops / peak_bytes_s
    return {
        "stage": name,
        "ms": round(seconds * 1e3, 3),
        "gflops": round(flops / 1e9, 2),
        "gbytes": round(bytes_ / 1e9, 3),
        "achieved_tflops": round(tflops, 3),
        "achieved_gbs": round(gbs, 1),
        "pct_peak_compute": round(pct_compute, 1),
        "pct_peak_hbm": round(pct_hbm, 1),
        "intensity_flop_per_byte": round(intensity, 2),
        "bound": bound if intensity < 10 * balance else "compute",
    }


def measure_roofline(name: str, fn: Callable, args,
                     seconds: Optional[float] = None,
                     **chain_kwargs) -> Dict:
    """Convenience: chained-time `fn` (unless `seconds` given) + cost
    analysis + roofline summary in one call."""
    from sift_tpu.utils.timing import chained_time
    costs = compiled_costs(fn, *args)
    if seconds is None:
        seconds = chained_time(fn, args, **chain_kwargs)
    return roofline(name, seconds, costs["flops"], costs["bytes"])
