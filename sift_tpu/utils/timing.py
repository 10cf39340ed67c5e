"""On-device timing that survives remote/tunneled backends.

On a tunneled TPU, `block_until_ready` can return before execution and a
single host read carries ~26 ms of RTT, so naive timing loops measure only
the tunnel. `chained_time` compiles the workload into a `lax.scan` whose
carry perturbs the input (defeats CSE/LICM) and whose body reduces the full
output (defeats dead-code elimination), then differences two repetition
counts to cancel fixed overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def chained_time(fn: Callable, args, reps_lo: int = 2, reps_hi: int = 12,
                 tries: int = 3) -> float:
    """Seconds per call of `fn(*args)`.

    `fn` must return a scalar that depends on its full computation (sum over
    all outputs). The first arg must be a float array; it is perturbed by
    the carry each iteration.

    Axon-backend caveat: this compiles TWO programs of the workload (one
    per rep count). For some large Pallas workloads the tunneled runtime
    can only re-execute the FIRST executable of a given kernel per
    process (the second trips INVALID_ARGUMENT on its second run); such
    benchmarks must run each rep count in its own subprocess and
    difference across processes instead (see
    benchmarks/components.py::bench_matching_large).
    """
    def chained(n):
        @jax.jit
        def run(*a):
            def body(c, _):
                s = fn(a[0] + c, *a[1:])
                return s * 1e-24, None
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return run

    times = {}
    for n in (reps_lo, reps_hi):
        f = chained(n)
        # The tunneled backend's remote_compile endpoint drops connections
        # transiently under load ("response body closed before all bytes
        # were read", observed r4) — retry the compile+warm call; the
        # compilation cache makes the retry cheap once the compile landed.
        # Deterministic failures (HTTP 413 oversized program, shape/type
        # errors) must surface immediately, not after 3 retries + sleeps.
        for attempt in range(3):
            try:
                float(f(*args))               # compile + warm
                break
            except (TypeError, ValueError):
                raise                          # deterministic: no retry
            except Exception as e:
                msg = str(e)
                if "413" in msg or "INVALID_ARGUMENT" in msg \
                        or "RESOURCE_EXHAUSTED" in msg:
                    raise                      # deterministic: no retry
                if attempt == 2:
                    raise
                import sys
                print(f"chained_time: transient compile/warm failure "
                      f"(attempt {attempt + 1}/3): {type(e).__name__}: "
                      f"{msg[:200]}", file=sys.stderr)
                time.sleep(2.0 * (attempt + 1))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[reps_hi] - times[reps_lo]) / (reps_hi - reps_lo), 1e-9)


def tree_scalar(out) -> jnp.ndarray:
    """Sum every float leaf of a pytree into one scalar (DCE-proof)."""
    leaves = [l for l in jax.tree.leaves(out)
              if hasattr(l, "dtype")]
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def tunnel_health(upload_mb: float = 4.6, reps: int = 5):
    """(rtt_ms, upload_mb_s) of the host<->device link, measured now.

    Wall-clock numbers on a tunneled backend are hostage to link weather:
    host->device bandwidth was measured anywhere from ~20 MB/s (congested)
    to ~210 MB/s on the same day, which moves the end-to-end SLAM loop
    3x with zero code change. System benchmarks embed this probe in
    their output so a captured number is self-explaining.

    The upload probe must use FRESH bytes per rep — re-uploading an
    identical buffer hits a content cache in the tunnel (>1 GB/s).
    """
    import numpy as np

    @jax.jit
    def _probe(x):
        return (x * 1.000001).sum()

    x = jnp.zeros((128, 128), jnp.float32)
    float(_probe(x))                          # compile + warm
    rtts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(_probe(x))                      # dispatch + blocking read
        rtts.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rtts) * 1e3)

    @jax.jit
    def _consume(b):                          # forces the upload to land
        return b[:: 65537].astype(jnp.float32).sum()

    n = int(upload_mb * 1e6)
    rng = np.random.default_rng(0)
    _ = float(_consume(jnp.zeros(n, jnp.uint8)))        # compile
    bws = []
    for _ in range(max(2, reps // 2)):
        buf = rng.integers(0, 255, n, dtype=np.uint8)   # fresh content
        t0 = time.perf_counter()
        d = jax.device_put(buf)
        float(_consume(d))
        dt = time.perf_counter() - t0
        dt = max(dt - rtt_ms / 1e3, dt / 2)   # discount the consume RTT
        bws.append(n / max(dt, 1e-9) / 1e6)
    return round(rtt_ms, 1), round(float(np.median(bws)), 1)
