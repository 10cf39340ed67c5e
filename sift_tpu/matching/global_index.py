"""Global descriptor index: MXU brute-force place recognition.

SURVEY §2.2's matching row plans "brute-force/ANN". On TPU the honest
answer is that brute force on the MXU *subsumes* approximate indices for
any map this system can hold: at the measured ~125 Gpairs/s (BENCH.md), a
1024-descriptor query against a 256-keyframe x 1024-descriptor map is
~0.3 GFLOP of bf16 matmul — far below a millisecond of device time,
with none of an ANN structure's build cost, recall loss, or
host-side pointer chasing. (An LSH/IVF structure would start paying for
itself around ~10^7+ map descriptors — beyond the fixed-capacity design
here.)

The index keeps every keyframe's descriptors in ONE stacked device
buffer (bf16). A query is a `lax.map` over keyframes of
(N, 128) @ (128, Nk) similarity matmuls reduced to per-keyframe VOTE
counts (queries whose best cosine similarity in that keyframe clears a
threshold) — a (C,) vector, one host read. The SLAM layer uses the top
voted keyframes as loop-closure / relocalization candidates instead of
blind uniform probing (matching/pipeline wiring in slam/pipeline.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _bank_update(bank, bank_valid, k, desc, valid):
    """Install one keyframe's (normalized) descriptors: ONE jitted,
    buffer-donating dispatch — eager .at[].set would copy the whole
    (C, Nk, D) bank and pay per-op round trips on remote backends."""
    n = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    row = (desc / n).astype(bank.dtype)
    bank = jax.lax.dynamic_update_index_in_dim(bank, row, k, 0)
    bank_valid = jax.lax.dynamic_update_index_in_dim(
        bank_valid, valid, k, 0)
    return bank, bank_valid


@functools.partial(jax.jit, static_argnames=("sim_threshold",))
def _query_votes(bank: jnp.ndarray, bank_valid: jnp.ndarray,
                 desc_q: jnp.ndarray, valid_q: jnp.ndarray,
                 sim_threshold: float = 0.85) -> jnp.ndarray:
    """bank: (C, Nk, D) bf16 normalized; bank_valid: (C, Nk) bool;
    desc_q: (N, D); valid_q: (N,). Returns (C,) int32 vote counts."""
    qn = desc_q / jnp.maximum(
        jnp.linalg.norm(desc_q, axis=-1, keepdims=True), 1e-12)
    qn = qn.astype(jnp.bfloat16)

    def one(args):
        kf_desc, kf_valid = args
        sims = jnp.dot(qn, kf_desc.T,
                       preferred_element_type=jnp.float32)   # (N, Nk)
        sims = jnp.where(kf_valid[None, :], sims, -1.0)
        best = jnp.max(sims, axis=-1)                        # (N,)
        return jnp.sum((best > sim_threshold) & valid_q)

    return lax.map(one, (bank, bank_valid)).astype(jnp.int32)


class GlobalDescriptorIndex:
    """Fixed-capacity per-keyframe descriptor bank on device."""

    def __init__(self, capacity_kf: int, n_per_kf: int, dim: int = 128):
        self.capacity_kf = capacity_kf
        self.n_per_kf = n_per_kf
        self._bank = jnp.zeros((capacity_kf, n_per_kf, dim), jnp.bfloat16)
        self._bank_valid = jnp.zeros((capacity_kf, n_per_kf), bool)
        self._used = np.zeros((capacity_kf,), bool)

    def add(self, kf_index: int, desc, valid) -> None:
        """Install keyframe `kf_index`'s descriptors (device arrays ok).
        Descriptors are L2-normalized into the bank (cosine scoring)."""
        if kf_index >= self.capacity_kf:
            return                       # over capacity: index degrades
        self._bank, self._bank_valid = _bank_update(
            self._bank, self._bank_valid, jnp.asarray(kf_index, jnp.int32),
            jnp.asarray(desc), jnp.asarray(valid))
        self._used[kf_index] = True

    def query(self, desc_q, valid_q,
              sim_threshold: float = 0.85) -> np.ndarray:
        """(C,) per-keyframe vote counts for the query descriptor set
        (one device dispatch, one small read). Unused slots vote 0."""
        votes = np.array(_query_votes(
            self._bank, self._bank_valid, jnp.asarray(desc_q),
            jnp.asarray(valid_q), sim_threshold=sim_threshold))
        votes[~self._used] = 0
        return votes

    def top_candidates(self, desc_q, valid_q, k: int,
                       exclude_from: Optional[int] = None,
                       min_votes: int = 1) -> np.ndarray:
        """Indices of the top-k voted keyframes (descending), optionally
        excluding indices >= `exclude_from` (the covisible tail)."""
        votes = self.query(desc_q, valid_q)
        if exclude_from is not None:
            votes[exclude_from:] = 0
        order = np.argsort(-votes)
        order = order[votes[order] >= min_votes]
        return order[:k]
