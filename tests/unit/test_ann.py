"""IVF-Flat ANN matcher (matching/ann.py) vs the exact brute-force matcher."""

import numpy as np
import jax
import jax.numpy as jnp

from sift_tpu.config import AnnConfig, MatchConfig
from sift_tpu.matching.ann import build_ivf, match_descriptors_ann, search_ivf
from sift_tpu.matching.matcher import match_descriptors


def _clustered_db(rng, n, d=128, n_centers=32, spread=0.15):
    """Descriptors with cluster structure (what IVF assumes of SIFT space)."""
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    which = rng.integers(0, n_centers, n)
    return (centers[which] +
            spread * rng.standard_normal((n, d))).astype(np.float32)


def test_exact_when_probing_everything():
    """nprobe == n_clusters degenerates to exact brute force."""
    rng = np.random.default_rng(0)
    db = _clustered_db(rng, 512)
    q = _clustered_db(rng, 128)
    vdb = rng.random(512) > 0.1
    vq = rng.random(128) > 0.1
    ann = AnnConfig(n_clusters=16, nprobe=16, bucket_capacity=512,
                    kmeans_iters=5)
    idx = build_ivf(jnp.asarray(db), jnp.asarray(vdb), ann)
    assert int(idx.n_overflow) == 0
    best, second, arg = search_ivf(idx, jnp.asarray(q), jnp.asarray(vq), ann)

    # Exact reference top-2.
    d2 = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    d2[:, ~vdb] = np.inf
    ref_arg = d2.argmin(-1)
    ref_best = d2.min(-1)

    m = vq
    np.testing.assert_array_equal(np.asarray(arg)[m], ref_arg[m])
    np.testing.assert_allclose(np.asarray(best)[m], ref_best[m],
                               rtol=1e-4, atol=1e-3)
    assert (np.asarray(best)[~m] > 1e29).all()


def test_recall_with_partial_probing():
    """Clustered data, nprobe << n_clusters: high recall@1, big FLOP cut."""
    rng = np.random.default_rng(1)
    db = _clustered_db(rng, 2048, n_centers=24)
    # Queries = perturbed database points (true NN is the source point).
    src = rng.permutation(2048)[:256]
    q = db[src] + 0.01 * rng.standard_normal((256, 128)).astype(np.float32)
    ann = AnnConfig(n_clusters=24, nprobe=4, bucket_capacity=512,
                    kmeans_iters=10)
    idx = build_ivf(jnp.asarray(db), jnp.ones(2048, bool), ann)
    assert int(idx.n_overflow) == 0
    _, _, arg = search_ivf(idx, jnp.asarray(q), jnp.ones(256, bool), ann)
    recall = (np.asarray(arg) == src).mean()
    assert recall >= 0.95, recall


def test_overflow_counted_not_silent():
    """A bucket capacity below the largest cluster reports the drop."""
    rng = np.random.default_rng(2)
    db = rng.standard_normal((256, 128)).astype(np.float32)
    ann = AnnConfig(n_clusters=2, nprobe=2, bucket_capacity=64,
                    kmeans_iters=3)
    idx = build_ivf(jnp.asarray(db), jnp.ones(256, bool), ann)
    n_in = int(np.asarray(idx.bucket_valid).sum())
    assert n_in <= 128
    assert int(idx.n_overflow) == 256 - n_in > 0


def test_match_ann_agrees_with_exact_on_easy_pairs():
    """Full Matches path: planted correspondences recovered, ratio+mutual
    semantics consistent with the exact matcher on the easy subset."""
    rng = np.random.default_rng(3)
    db = _clustered_db(rng, 1024, n_centers=20)
    sel = rng.permutation(1024)[:128]
    q = np.concatenate([
        db[sel] + 0.005 * rng.standard_normal((128, 128)),
        rng.standard_normal((128, 128)) * 3.0,     # distractors
    ]).astype(np.float32)
    vq = np.ones(256, bool)
    cfg = MatchConfig(ratio=0.8, mutual=True, max_matches=256)
    ann = AnnConfig(n_clusters=20, nprobe=5, bucket_capacity=256,
                    kmeans_iters=10)
    idx = build_ivf(jnp.asarray(db), jnp.ones(1024, bool), ann)
    got = match_descriptors_ann(jnp.asarray(q), jnp.asarray(vq), idx,
                                cfg, ann)
    ref = match_descriptors(jnp.asarray(q), jnp.asarray(vq),
                            jnp.asarray(db), jnp.ones(1024, bool), cfg)

    gv = np.asarray(got.valid)
    ref_pairs = {(int(a), int(b)) for a, b in
                 zip(np.asarray(ref.idx_a)[np.asarray(ref.valid)],
                     np.asarray(ref.idx_b)[np.asarray(ref.valid)])}
    got_pairs = {(int(a), int(b)) for a, b in
                 zip(np.asarray(got.idx_a)[gv], np.asarray(got.idx_b)[gv])}
    # Planted matches dominate both sets; ANN recovers >=90% of exact.
    assert len(ref_pairs) >= 100
    assert len(got_pairs & ref_pairs) / len(ref_pairs) >= 0.9
    # Every ANN pair maps a query to ITS planted source when the query is
    # one of the planted ones (no cross-wiring).
    planted = {i: s for i, s in enumerate(sel)}
    for a, b in got_pairs:
        if a < 128:
            assert b == planted[a]


def test_jit_and_determinism():
    """build/search jit cleanly and are deterministic run-to-run."""
    rng = np.random.default_rng(4)
    db = _clustered_db(rng, 512)
    q = _clustered_db(rng, 64)
    ann = AnnConfig(n_clusters=8, nprobe=3, bucket_capacity=256,
                    kmeans_iters=4)
    i1 = build_ivf(jnp.asarray(db), jnp.ones(512, bool), ann)
    i2 = build_ivf(jnp.asarray(db), jnp.ones(512, bool), ann)
    np.testing.assert_array_equal(np.asarray(i1.centroids),
                                  np.asarray(i2.centroids))
    b1, _, a1 = search_ivf(i1, jnp.asarray(q), jnp.ones(64, bool), ann)
    b2, _, a2 = search_ivf(i2, jnp.asarray(q), jnp.ones(64, bool), ann)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_query_tiling_invariant():
    """Q > query_tile exercises the lax.map tiling + padding path; results
    must equal the single-tile formulation."""
    rng = np.random.default_rng(5)
    db = _clustered_db(rng, 1024, n_centers=16)
    q = _clustered_db(rng, 300)          # deliberately not a tile multiple
    vq = rng.random(300) > 0.1
    idx = None
    outs = []
    for tile in (512, 64):               # single-tile vs 5-tile (padded)
        ann = AnnConfig(n_clusters=16, nprobe=16, bucket_capacity=512,
                        kmeans_iters=5, query_tile=tile)
        if idx is None:
            idx = build_ivf(jnp.asarray(db), jnp.ones(1024, bool), ann)
        outs.append(search_ivf(idx, jnp.asarray(q), jnp.asarray(vq), ann))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_build_padding_inert_even_when_clusters_exceed_valid():
    """Index build with n_valid < n_clusters: flipping the contents of
    invalid rows must not change centroids, buckets, or search results."""
    rng = np.random.default_rng(6)
    db = rng.standard_normal((64, 128)).astype(np.float32)
    valid = np.arange(64) < 12           # fewer valid rows than clusters
    q = rng.standard_normal((16, 128)).astype(np.float32)
    ann = AnnConfig(n_clusters=16, nprobe=16, bucket_capacity=64,
                    kmeans_iters=4)

    outs = []
    for poison in (0.0, 1e3):
        db2 = db.copy()
        db2[~valid] = poison
        idx = build_ivf(jnp.asarray(db2), jnp.asarray(valid), ann)
        best, second, arg = search_ivf(idx, jnp.asarray(q),
                                       jnp.ones(16, bool), ann)
        outs.append((np.asarray(idx.centroids), np.asarray(best),
                     np.asarray(arg)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_array_equal(outs[0][2], outs[1][2])
