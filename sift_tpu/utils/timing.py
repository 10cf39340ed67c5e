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
        float(f(*args))                       # compile + warm
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
