"""Data-parallel descriptor matching over a device mesh.

Matching image pairs is embarrassingly parallel: shard the pair axis with a
`NamedSharding` and let the compiler partition the vmapped matcher — zero
communication, results stay sharded with their pairs (the same pjit pattern
as `frontend_dist`).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sift_tpu.config import MatchConfig
from sift_tpu.matching.matcher import match_descriptors
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
