"""Sharded pairwise matching == per-pair single-device matching."""

import numpy as np
import jax.numpy as jnp

from sift_tpu.config import MatchConfig, MeshConfig
from sift_tpu.dist.mesh import make_mesh
from sift_tpu.dist.matching_dist import match_pairs_sharded
from sift_tpu.matching.matcher import match_descriptors


def test_sharded_matching_matches_single(eight_devices):
    rng = np.random.default_rng(0)
    pairs, n = 16, 128
    b = rng.standard_normal((pairs, n, 128)).astype(np.float32)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    perm = np.stack([rng.permutation(n) for _ in range(pairs)])
    a = np.take_along_axis(b, perm[..., None], axis=1) + \
        1e-4 * rng.standard_normal((pairs, n, 128)).astype(np.float32)
    valid = np.ones((pairs, n), bool)

    cfg = MatchConfig(max_matches=n)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    got = match_pairs_sharded(mesh, jnp.asarray(a), jnp.asarray(valid),
                              jnp.asarray(b), jnp.asarray(valid), cfg)

    for p in range(pairs):
        ref = match_descriptors(jnp.asarray(a[p]), jnp.asarray(valid[p]),
                                jnp.asarray(b[p]), jnp.asarray(valid[p]), cfg)
        np.testing.assert_array_equal(np.asarray(got.idx_a[p]),
                                      np.asarray(ref.idx_a))
        np.testing.assert_array_equal(np.asarray(got.idx_b[p]),
                                      np.asarray(ref.idx_b))
        # planted permutation recovered
        valid_m = np.asarray(ref.valid)
        ia = np.asarray(ref.idx_a)[valid_m]
        ib = np.asarray(ref.idx_b)[valid_m]
        assert (perm[p][ia] == ib).all()
