"""Sharded matching == single-device matching (pairwise and large-N)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sift_tpu.config import MatchConfig, MeshConfig
from sift_tpu.dist.mesh import make_mesh
from sift_tpu.dist.matching_dist import (match_large_sharded,
                                         match_pairs_sharded)
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


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
@pytest.mark.parametrize("mutual", [True, False])
def test_large_sharded_mesh_invariant(eight_devices, shape, mutual):
    """One big row-sharded problem: identical Matches to the single-device
    matcher on every mesh shape (incl. the cross-shard mutual check)."""
    rng = np.random.default_rng(3)
    na, nb = 512, 384
    b = rng.standard_normal((nb, 128)).astype(np.float32) * 4.0
    sel = rng.permutation(nb)[: na // 2]
    a = np.concatenate([
        b[sel] + 0.02 * rng.standard_normal((sel.shape[0], 128)),
        rng.standard_normal((na - sel.shape[0], 128)) * 4.0,
    ]).astype(np.float32)
    va = rng.random(na) > 0.15
    vb = rng.random(nb) > 0.15

    cfg = MatchConfig(max_matches=256, mutual=mutual)
    ref = match_descriptors(jnp.asarray(a), jnp.asarray(va),
                            jnp.asarray(b), jnp.asarray(vb), cfg)

    mesh = make_mesh(MeshConfig(data=shape[0], model=shape[1]))
    got = match_large_sharded(mesh, jnp.asarray(a), jnp.asarray(va),
                              jnp.asarray(b), jnp.asarray(vb), cfg)

    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    assert m.sum() > 50                      # the comparison has power
    np.testing.assert_array_equal(np.asarray(got.idx_a)[m],
                                  np.asarray(ref.idx_a)[m])
    np.testing.assert_array_equal(np.asarray(got.idx_b)[m],
                                  np.asarray(ref.idx_b)[m])
    np.testing.assert_allclose(np.asarray(got.distance)[m],
                               np.asarray(ref.distance)[m],
                               rtol=1e-5, atol=1e-3)
