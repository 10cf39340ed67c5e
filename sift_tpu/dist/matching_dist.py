"""Data-parallel descriptor matching over a device mesh.

Two regimes:

- `match_pairs_sharded`: matching image PAIRS is embarrassingly parallel —
  shard the pair axis with a `NamedSharding` and let the compiler
  partition the vmapped matcher (zero communication, the same pjit
  pattern as `frontend_dist`).
- `match_large_sharded`: ONE huge problem (place recognition / offline
  matching) scaled across the mesh — query rows sharded, database
  replicated, each shard runs the impl-dispatched local top-2
  (`matcher.top2_masked`, i.e. the streaming Pallas kernel on TPU), and
  the mutual-nearest check crosses shards with a min/argmin `pmin`
  reduction. Per-device memory and FLOPs drop n-fold; the only
  collectives are over (Nb,)- and (Na,)-vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sift_tpu.config import MatchConfig
from sift_tpu.matching.matcher import _BIG, _compact, match_descriptors, \
    top2_masked
from sift_tpu.types import Matches


def match_pairs_sharded(mesh: Mesh, desc_a, valid_a, desc_b, valid_b,
                        cfg: MatchConfig) -> Matches:
    """Match P descriptor-set pairs across the mesh.

    desc_a/desc_b: (P, N, D); valid_a/valid_b: (P, N). P must divide by the
    total device count. Returns a `Matches` pytree with leading axis P.
    """
    axes = mesh.axis_names
    shard = NamedSharding(mesh, P(axes))
    args = [jax.device_put(x, shard)
            for x in (desc_a, valid_a, desc_b, valid_b)]

    @functools.partial(jax.jit, out_shardings=shard)
    def run(da, va, db, vb):
        return jax.vmap(
            lambda a, av, b, bv: match_descriptors(a, av, b, bv, cfg)
        )(da, va, db, vb)

    return run(*args)


def match_large_sharded(mesh: Mesh, desc_a, valid_a, desc_b, valid_b,
                        cfg: MatchConfig) -> Matches:
    """One (Na, D) x (Nb, D) matching problem sharded across the mesh.

    Query rows are split over every mesh axis (Na must divide the device
    count); the database is replicated. Semantically identical to
    `match_descriptors` (ratio + mutual + capacity-M compaction) — the
    multidevice tests assert mesh-shape invariance against the
    single-device matcher. Returns a replicated `Matches`.
    """
    assert cfg.metric != "l2q8", \
        "l2q8's per-tensor quantization scale is shard-local here, which " \
        "breaks mesh-shape invariance — use metric='l2' for the " \
        "distributed matcher"
    Na = desc_a.shape[0]
    assert Na % mesh.size == 0, \
        f"Na={Na} must divide device count {mesh.size}"
    row_shard = NamedSharding(mesh, P(mesh.axis_names))
    rep = NamedSharding(mesh, P())
    desc_a = jax.device_put(desc_a, row_shard)
    valid_a = jax.device_put(valid_a, row_shard)
    desc_b = jax.device_put(desc_b, rep)
    valid_b = jax.device_put(valid_b, rep)
    return _match_large_jit(mesh, cfg)(desc_a, valid_a, desc_b, valid_b)


@functools.lru_cache(maxsize=32)
def _match_large_jit(mesh: Mesh, cfg: MatchConfig):
    """Compiled shard_map matcher, cached per (mesh, cfg).

    Building a fresh jit(shard_map(...)) closure per call would re-trace
    and re-compile EVERY invocation (~seconds each on remote backends);
    the lru_cache returns the same callable so jax's own compilation
    cache applies across calls.
    """
    axes = mesh.axis_names

    def shard_fn(da, va, db, vb):
        local_na = da.shape[0]
        # Flattened shard index, row-major in mesh-axis order — matches
        # the concatenation order of tiled all_gather over `axes`.
        idx = jnp.int32(0)
        for ax in axes:
            idx = idx * mesh.shape[ax] + lax.axis_index(ax)
        offset = idx * local_na

        # Local rows vs the full database: independent per shard.
        best, second, arg_b = top2_masked(da, va, db, vb, cfg)
        ok = best < (cfg.ratio * cfg.ratio) * second
        ok &= va & (best < _BIG)

        if cfg.mutual:
            # Reverse direction: per-database-row best over LOCAL query
            # rows, then a cross-shard (min, argmin) combine. Ties pick
            # the lowest global row — jnp.argmin's first-occurrence
            # semantics.
            bb, _, bb_arg = top2_masked(db, vb, da, va, cfg)
            bb_garg = bb_arg.astype(jnp.int32) + offset
            gmin = lax.pmin(bb, axes)
            cand = jnp.where(bb <= gmin, bb_garg, jnp.int32(2**31 - 1))
            garg = lax.pmin(cand, axes)
            grow = offset + jnp.arange(local_na, dtype=jnp.int32)
            ok &= garg[arg_b] == grow

        # Small (Na,) gathers; compaction is identical on every device.
        ok_f = lax.all_gather(ok, axes, axis=0, tiled=True)
        best_f = lax.all_gather(best, axes, axis=0, tiled=True)
        arg_f = lax.all_gather(arg_b, axes, axis=0, tiled=True)
        return _compact(ok_f, best_f, arg_f, cfg.max_matches)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(axes), P(axes), P(), P()),
                   out_specs=P(), check_vma=False)
    return jax.jit(fn)
