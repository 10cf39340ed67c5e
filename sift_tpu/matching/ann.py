"""Approximate nearest-neighbour matching: TPU-native IVF-Flat.

SURVEY §2.2's matching row plans "brute-force/ANN + ratio test". The
brute-force MXU matcher (`matcher.py`, `global_index.py`) genuinely
subsumes an index up to ~10^7 database descriptors; this module covers
the regime beyond that — city-scale place recognition / offline
structure-from-motion where the database no longer fits a single
all-pairs pass. It is an inverted-file (IVF-Flat) index re-designed for
the TPU rather than a port of a CPU ANN library.

**Measured caveat (v5e, BENCH.md round-2 addendum): on-chip, brute
force beats this index by ~68x at 4096 x 131072 (2.2 ms vs 150 ms) —
TPU gathers cost far more than the MXU FLOPs the probing saves, at any
HBM-resident size. Use the brute-force / streaming-Pallas matcher on
TPU; this module is the host/offline fallback for databases that
cannot ride the MXU path at all. Nothing in `MatchConfig.impl="auto"`
routes here.**

Design (kept TPU-idiomatic so the build/search remain single jitted
programs even in the fallback role):

- **Build** = k-means where BOTH steps are MXU matmuls: assignment is an
  (N, D) x (D, C) distance matmul + argmin, and the centroid update is a
  one-hot (C, N) x (N, D) segment-sum matmul — no scatter, no
  host-side loops, one jitted program (`lax.fori_loop`).
- **Bucketing** uses a sort-based rank (argsort + searchsorted) instead
  of data-dependent list growth: every cluster owns a fixed-capacity row
  of the (C, cap) bucket table with a validity mask; overflow is counted
  and reported, never silently mis-sized (CLAUDE.md static-shape rule).
- **Search** probes the `nprobe` nearest centroids per query (top-k over
  one (Q, C) matmul), gathers those buckets' candidates, and runs the
  same masked top-2 + Lowe ratio as the exact matcher over the
  (Q, nprobe*cap) candidate set. Each database point lives in exactly
  one bucket, so no dedup pass is needed.
- **Mutual check** is exact-on-candidates: the accepted matches' (M,)
  database vectors are re-scored against ALL queries — an (M, Q) matmul,
  tiny next to the search — so `cfg.mutual` keeps its brute-force
  semantics restricted to the probed candidate universe.

Approximation contract: a query's true nearest neighbour is found iff it
lives in one of the query's `nprobe` nearest clusters (standard IVF
recall semantics); `nprobe == n_clusters` degenerates to exact brute
force, which the tests assert. Compute drops by ~C/nprobe versus brute
force; memory by N*D -> Q*nprobe*cap*D per search tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from flax import struct

from sift_tpu.config import AnnConfig, MatchConfig
from sift_tpu.matching.matcher import _BIG, _compact, pairwise_sqdist
from sift_tpu.types import Matches


@struct.dataclass
class IvfIndex:
    """Inverted-file index over one database descriptor set (a pytree).

    centroids:    (C, D) float32 k-means centroids.
    bucket_ids:   (C, cap) int32 database row ids per cluster (padded 0).
    bucket_valid: (C, cap) bool.
    bucket_desc:  (C, cap, D) float32 descriptors REPLICATED into bucket
                  layout. This trades ~(C*cap/N)x extra memory for
                  first-axis-only gathers in the search hot loop — on TPU
                  a leading-dim index is a contiguous DMA while the
                  equivalent `desc[ids]` advanced-indexing gather lowers
                  to a scalar-expensive general gather (the same finding
                  as the window-fetch kernel, CLAUDE.md perf notes).
    desc:         (N, D) float32 the caller's database buffer (shared
                  reference, no copy) — used by the exact-on-candidate
                  mutual check.
    n_overflow:   () int32 — database points dropped because their
                  cluster's fixed-capacity bucket was full. Size
                  `bucket_capacity` above N/C with headroom to keep this 0.
    """

    centroids: jnp.ndarray
    bucket_ids: jnp.ndarray
    bucket_valid: jnp.ndarray
    bucket_desc: jnp.ndarray
    desc: jnp.ndarray
    n_overflow: jnp.ndarray


def _kmeans(desc: jnp.ndarray, valid: jnp.ndarray, c: int,
            iters: int, key) -> jnp.ndarray:
    """Masked k-means on the MXU; returns (C, D) centroids.

    Init = a random valid subset (without replacement via masked top-k of
    uniform keys). Empty clusters keep their previous centroid.
    """
    n, d = desc.shape
    gumbel = jax.random.uniform(key, (n,)) + jnp.where(valid, 0.0, -2.0)
    _, init_idx = lax.top_k(gumbel, c)
    # Padding inertness: when n_valid < c the surplus init slots would
    # otherwise seed from invalid rows' garbage contents — substitute the
    # first valid descriptor (duplicate centroids are benign; invalid
    # rows never assign to them thanks to the `big` mask below).
    first_valid = desc[jnp.argmax(valid)]
    desc_init = jnp.where(valid[:, None], desc, first_valid[None, :])
    cent0 = desc_init[init_idx]

    big = jnp.where(valid, 0.0, _BIG)[:, None]     # mask rows out of both steps

    def body(_, cent):
        dist = pairwise_sqdist(desc, cent) + big          # (N, C)
        assign = jnp.argmin(dist, axis=-1)                # (N,)
        one_hot = jax.nn.one_hot(assign, c, dtype=jnp.float32)
        one_hot = one_hot * valid[:, None].astype(jnp.float32)
        sums = jnp.dot(one_hot.T, desc,
                       preferred_element_type=jnp.float32)    # (C, D) MXU
        counts = jnp.sum(one_hot, axis=0)                     # (C,)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        return jnp.where(counts[:, None] > 0, new, cent)

    return lax.fori_loop(0, iters, body, cent0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_ivf(desc: jnp.ndarray, valid: jnp.ndarray, cfg: AnnConfig,
              key=None) -> IvfIndex:
    """Build an IVF-Flat index over a masked (N, D) descriptor buffer.

    One jitted program: k-means, assignment, and the sort-based inversion
    into fixed-capacity buckets. `key` seeds the k-means init (default
    PRNGKey(0) — index builds are deterministic by default, matching the
    repo-wide determinism invariant).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = desc.shape[0]
    c, cap = cfg.n_clusters, cfg.bucket_capacity
    cent = _kmeans(desc, valid, c, cfg.kmeans_iters, key)

    dist = pairwise_sqdist(desc, cent)
    assign = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    assign = jnp.where(valid, assign, c)        # invalid rows -> ghost bucket

    # Sort-based inversion: stable sort by cluster; each row's slot within
    # its cluster = sorted position - cluster start (searchsorted on the
    # sorted keys). No scatter conflicts: (row, slot) pairs are unique.
    order = jnp.argsort(assign, stable=True)
    sorted_assign = assign[order]
    starts = jnp.searchsorted(sorted_assign, jnp.arange(c + 1))
    slot = jnp.arange(n) - starts[sorted_assign]

    in_cap = (slot < cap) & (sorted_assign < c)
    n_overflow = jnp.sum((~in_cap) & (sorted_assign < c))
    # Out-of-capacity / ghost rows are parked on a scratch row (index c)
    # that is sliced off, keeping the scatter fully in-bounds.
    row = jnp.where(in_cap, sorted_assign, c)
    col = jnp.where(in_cap, slot, 0)

    bucket_ids = jnp.zeros((c + 1, cap), jnp.int32)
    bucket_valid = jnp.zeros((c + 1, cap), bool)
    bucket_ids = bucket_ids.at[row, col].set(order.astype(jnp.int32),
                                             mode="drop")
    bucket_valid = bucket_valid.at[row, col].set(in_cap, mode="drop")

    bucket_ids = bucket_ids[:c]
    bucket_valid = bucket_valid[:c]
    # One build-time gather into bucket layout buys first-axis-only
    # gathers at every search (see IvfIndex.bucket_desc).
    bucket_desc = desc[bucket_ids]
    return IvfIndex(centroids=cent, bucket_ids=bucket_ids,
                    bucket_valid=bucket_valid, bucket_desc=bucket_desc,
                    desc=desc, n_overflow=n_overflow.astype(jnp.int32))


def _merge_top2(a, b):
    """Merge two per-row (best, second, idx) triples into one.

    Candidate universes are disjoint (each database point lives in one
    bucket), so the merged second-best is the true second smallest of
    the union: min(s_a, s_b, max(b_a, b_b)).
    """
    ba, sa, ia = a
    bb, sb, ib = b
    best = jnp.minimum(ba, bb)
    second = jnp.minimum(jnp.minimum(sa, sb), jnp.maximum(ba, bb))
    idx = jnp.where(ba <= bb, ia, ib)
    return best, second, idx


def search_ivf(index: IvfIndex, desc_q: jnp.ndarray, valid_q: jnp.ndarray,
               cfg: AnnConfig):
    """Per-query (best, second, best_idx) over the probed candidate set.

    desc_q: (Q, D); valid_q: (Q,). Distances are squared L2 (the exact
    matcher's "l2" metric). Returns the same contract as
    `matcher.top2_masked`: invalid queries / empty candidate sets
    saturate to ~1e30.

    Working-set discipline: never materializes the (Q, nprobe*cap, D)
    candidate tensor. Queries run in `query_tile`-row tiles (`lax.map`)
    and probes in a `lax.scan` whose carry merges per-probe top-2
    results — peak memory is one (tile, cap, D) gather regardless of Q,
    nprobe, or database size.
    """
    nprobe = min(cfg.nprobe, index.centroids.shape[0])
    q, d = desc_q.shape
    tile = min(cfg.query_tile, q)

    def tile_body(args):
        dq, vq = args                                        # (T, D), (T,)
        cdist = pairwise_sqdist(dq, index.centroids)         # (T, C)
        _, probe = lax.top_k(-cdist, nprobe)                 # (T, nprobe)
        q2 = jnp.sum(dq * dq, axis=-1)[:, None]              # (T, 1)

        def one_probe(carry, p):
            ids = index.bucket_ids[p]                        # (T, cap)
            ok = index.bucket_valid[p]
            cand = index.bucket_desc[p]                      # (T, cap, D)
            c2 = jnp.sum(cand * cand, axis=-1)               # (T, cap)
            qc = jnp.einsum("td,tkd->tk", dq, cand,
                            preferred_element_type=jnp.float32)
            dist = jnp.maximum(q2 + c2 - 2.0 * qc, 0.0)
            dist = jnp.where(ok, dist, _BIG)
            best = jnp.min(dist, axis=-1)
            pos = jnp.argmin(dist, axis=-1)
            second = jnp.min(
                dist + jax.nn.one_hot(pos, dist.shape[-1],
                                      dtype=dist.dtype) * _BIG, axis=-1)
            idx = jnp.take_along_axis(ids, pos[:, None], axis=-1)[:, 0]
            return _merge_top2(carry, (best, second, idx)), None

        t = dq.shape[0]
        init = (jnp.full((t,), _BIG), jnp.full((t,), _BIG),
                jnp.zeros((t,), jnp.int32))
        (best, second, idx), _ = lax.scan(one_probe, init, probe.T)
        best = jnp.where(vq, best, _BIG)
        second = jnp.where(vq, second, _BIG)
        return best, second, idx

    if q <= tile:
        return tile_body((desc_q, valid_q))

    pad = (-q) % tile
    dq = jnp.pad(desc_q, ((0, pad), (0, 0)))
    vq = jnp.pad(valid_q, (0, pad))
    nt = dq.shape[0] // tile
    best, second, idx = lax.map(
        tile_body, (dq.reshape(nt, tile, d), vq.reshape(nt, tile)))
    return (best.reshape(-1)[:q], second.reshape(-1)[:q],
            idx.reshape(-1)[:q])


@functools.partial(jax.jit, static_argnames=("cfg", "ann"))
def match_descriptors_ann(desc_q: jnp.ndarray, valid_q: jnp.ndarray,
                          index: IvfIndex, cfg: MatchConfig,
                          ann: AnnConfig) -> Matches:
    """ANN counterpart of `match_descriptors`: ratio + (exact-on-candidate)
    mutual + capacity-M compaction over the IVF-probed candidate set.

    idx_a indexes the query buffer, idx_b the index's database buffer —
    the same orientation as `match_descriptors(desc_q, ..., desc_db, ...)`.
    """
    assert cfg.metric == "l2", \
        f"IVF search computes squared-L2 only, got metric={cfg.metric!r}" \
        " (normalize descriptors upstream for cosine semantics)"
    best, second, best_idx = search_ivf(index, desc_q, valid_q, ann)
    ok = best < (cfg.ratio * cfg.ratio) * second
    ok &= valid_q & (best < _BIG)

    if cfg.mutual:
        # Exact reverse check on the matched database rows only: (Q, Q')
        # would be the brute-force cost; (Q, D) x (D, Q) over the matched
        # set is one small matmul. A db row matched by several queries
        # keeps only its true nearest.
        matched = index.desc[best_idx]                       # (Q, D)
        back = pairwise_sqdist(matched, desc_q)              # (Q, Q)
        back = jnp.where(valid_q[None, :], back, _BIG)
        ok &= jnp.argmin(back, axis=-1) == jnp.arange(desc_q.shape[0])

    return _compact(ok, best, best_idx, cfg.max_matches)
