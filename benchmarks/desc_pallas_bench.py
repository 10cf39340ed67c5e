"""Descriptor-stage A/B: Pallas VMEM-resident kernel vs XLA einsum path.

VERDICT r5 #1 acceptance: >=1.5x on the stage at K=4096 (2 peaks), plus a
bytes-floor budget. Prints JSON lines:
  {"desc_xla_ms": ..., "desc_pallas_ms": ..., "speedup": ...,
   "k": ..., "bytes_floor_mb": ..., "xla_bytes_mb": ...}

Run ON TPU:  python benchmarks/desc_pallas_bench.py
(first compile is slow; uses the XLA compilation cache).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KS = [int(x) for x in os.environ.get("DESC_KS", "512,4096,6144").split(",")]


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/sift_tpu_xla"))
    import jax
    import jax.numpy as jnp
    from sift_tpu.config import SiftConfig
    from sift_tpu.frontend.windows import (R_DESC,
                                           descriptors_from_windows_multi)
    from sift_tpu.utils.timing import chained_time

    cfg = SiftConfig(mode="lowe")
    d = 2 * R_DESC
    for K in KS:
        rng = np.random.default_rng(0)
        gx = jnp.asarray(rng.standard_normal((K, d, d)), jnp.float32)
        gy = jnp.asarray(rng.standard_normal((K, d, d)), jnp.float32)
        oy0 = jnp.asarray(rng.uniform(-24.5, -23.5, (K,)), jnp.float32)
        ox0 = jnp.asarray(rng.uniform(-24.5, -23.5, (K,)), jnp.float32)
        oris = jnp.asarray(rng.uniform(0, 360, (K, 2)), jnp.float32)
        sw = jnp.asarray(rng.uniform(1.6, 3.2, (K,)), jnp.float32)

        def fn(gx_, mode):
            out = descriptors_from_windows_multi(
                gx_, gy, oy0, ox0, oris, sw, cfg, pallas=mode)
            return jnp.sum(out.astype(jnp.float32))

        t_x = chained_time(lambda g: fn(g, "off"), (gx,))
        t_p = chained_time(lambda g: fn(g, "on"), (gx,))

        # Bytes floor: windows in (f32) + descriptors out, ONCE for both
        # peaks. XLA-path bytes: measured from cost_analysis of the jitted
        # fallback (operand materialization included by the compiler's own
        # accounting).
        floor_mb = (2 * K * d * d * 4 + K * 2 * 128 * 4) / 1e6
        xla_bytes = None
        try:
            lowered = jax.jit(lambda g: fn(g, "off")).lower(gx)
            ca = lowered.compile().cost_analysis()
            if ca:
                xla_bytes = float(ca.get("bytes accessed", 0.0)) / 1e6
        except Exception:
            pass
        print(json.dumps({
            "k": K, "desc_xla_ms": round(t_x * 1e3, 3),
            "desc_pallas_ms": round(t_p * 1e3, 3),
            "speedup": round(t_x / t_p, 2),
            "bytes_floor_mb": round(floor_mb, 1),
            "xla_bytes_mb": (round(xla_bytes, 1)
                             if xla_bytes is not None else None),
            "pallas_us_per_kp_peak": round(t_p / (K * 2) * 1e6, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
