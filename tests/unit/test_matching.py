"""Matcher unit tests (numpy oracle for distances; synthetic correspondences)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sift_tpu.config import MatchConfig
from sift_tpu.matching.matcher import (
    pairwise_sqdist,
    match_descriptors,
)


def _rand_desc(rng, n, d=128):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_pairwise_sqdist_matches_numpy():
    rng = np.random.default_rng(0)
    a = _rand_desc(rng, 37)
    b = _rand_desc(rng, 53)
    got = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_planted_matches_recovered():
    """A is a permuted copy of B (plus tiny noise): every valid row matches."""
    rng = np.random.default_rng(1)
    n = 64
    b = _rand_desc(rng, n)
    perm = rng.permutation(n)
    a = b[perm] + 1e-4 * rng.standard_normal((n, 128)).astype(np.float32)

    cfg = MatchConfig(ratio=0.8, mutual=True, max_matches=128)
    m = match_descriptors(jnp.asarray(a), jnp.ones(n, bool),
                          jnp.asarray(b), jnp.ones(n, bool), cfg)
    valid = np.asarray(m.valid)
    ia, ib = np.asarray(m.idx_a)[valid], np.asarray(m.idx_b)[valid]
    assert valid.sum() == n
    assert (perm[ia] == ib).all()


def test_ratio_test_rejects_ambiguous():
    """Two identical rows in B make the best/second ratio 1 -> rejected."""
    rng = np.random.default_rng(2)
    b = _rand_desc(rng, 8)
    b[1] = b[0]                      # descriptor 0 is ambiguous
    a = b[:1].copy()

    cfg = MatchConfig(ratio=0.8, mutual=False, max_matches=8)
    m = match_descriptors(jnp.asarray(a), jnp.ones(1, bool),
                          jnp.asarray(b), jnp.ones(8, bool), cfg)
    assert int(np.asarray(m.valid).sum()) == 0


def test_invalid_masks_respected():
    rng = np.random.default_rng(3)
    b = _rand_desc(rng, 16)
    a = b.copy()
    valid_a = np.zeros(16, bool)
    valid_a[:4] = True
    valid_b = np.ones(16, bool)
    valid_b[0] = False               # a[0]'s true partner masked out

    cfg = MatchConfig(ratio=0.9, mutual=True, max_matches=16)
    m = match_descriptors(jnp.asarray(a), jnp.asarray(valid_a),
                          jnp.asarray(b), jnp.asarray(valid_b), cfg)
    valid = np.asarray(m.valid)
    ia = np.asarray(m.idx_a)[valid]
    assert set(ia).issubset({1, 2, 3})          # a[0] lost its partner
    assert not np.isin(0, np.asarray(m.idx_b)[valid])


def test_guided_matching_disambiguates_repetitive_texture():
    """Identical descriptors at different positions: unguided ratio test
    kills them all; a position prior recovers the right associations."""
    from sift_tpu.matching.matcher import match_descriptors_guided

    rng = np.random.default_rng(7)
    code = _rand_desc(rng, 1)[0]
    n = 8
    # Two independently-noised observations of the SAME texture patch at n
    # distinct positions: every pair looks alike, so no ratio test can pick.
    desc_a = np.tile(code, (n, 1)) + \
        1e-3 * rng.standard_normal((n, 128)).astype(np.float32)
    desc_b = np.tile(code, (n, 1)) + \
        1e-3 * rng.standard_normal((n, 128)).astype(np.float32)
    uv = np.stack([np.arange(n) * 100.0, np.zeros(n)], -1).astype(np.float32)

    cfg = MatchConfig(ratio=0.8, mutual=True, max_matches=n)
    valid = jnp.ones(n, bool)

    un = match_descriptors(jnp.asarray(desc_a), valid, jnp.asarray(desc_b),
                           valid, cfg)
    assert int(np.asarray(un.valid).sum()) == 0     # all ambiguous

    g = match_descriptors_guided(
        jnp.asarray(desc_a), valid, jnp.asarray(desc_b), valid,
        jnp.asarray(uv), jnp.ones(n, bool), jnp.asarray(uv),
        radius=40.0, cfg=cfg)
    gv = np.asarray(g.valid)
    assert gv.sum() == n
    ia, ib = np.asarray(g.idx_a)[gv], np.asarray(g.idx_b)[gv]
    assert (ia == ib).all()                          # position decides


def test_guided_rows_without_prior_unrestricted():
    from sift_tpu.matching.matcher import match_descriptors_guided

    rng = np.random.default_rng(8)
    desc = _rand_desc(rng, 6)
    uv = rng.uniform(0, 500, (6, 2)).astype(np.float32)
    cfg = MatchConfig(ratio=0.9, mutual=True, max_matches=6)
    valid = jnp.ones(6, bool)
    # Prior points far away for rows 0-2, but has_pred only on row 0.
    pred = uv + 400.0
    has = np.zeros(6, bool)
    has[0] = True
    g = match_descriptors_guided(
        jnp.asarray(desc), valid, jnp.asarray(desc), valid,
        jnp.asarray(pred), jnp.asarray(has), jnp.asarray(uv),
        radius=10.0, cfg=cfg)
    gv = np.asarray(g.valid)
    ia = set(np.asarray(g.idx_a)[gv])
    assert 0 not in ia                 # prior excluded its true match
    assert {1, 2, 3, 4, 5}.issubset(ia)


def test_output_sorted_and_fixed_capacity():
    rng = np.random.default_rng(4)
    b = _rand_desc(rng, 32)
    a = b + 1e-4 * rng.standard_normal((32, 128)).astype(np.float32)
    cfg = MatchConfig(ratio=0.8, mutual=True, max_matches=8)
    m = match_descriptors(jnp.asarray(a), jnp.ones(32, bool),
                          jnp.asarray(b), jnp.ones(32, bool), cfg)
    assert m.idx_a.shape == (8,)
    d = np.asarray(m.distance)[np.asarray(m.valid)]
    assert (np.diff(d) >= -1e-7).all()           # ascending distance


def test_dot_metric_equals_l2_on_unit_descriptors():
    """metric="dot" (cosine distance) reproduces the L2 matching exactly for
    L2-normalized descriptors: 2 - 2 a.b == |a - b|^2 on the unit sphere."""
    rng = np.random.default_rng(7)
    n = 48
    b = _rand_desc(rng, n)
    perm = rng.permutation(n)
    a = b[perm] + 1e-4 * rng.standard_normal((n, 128)).astype(np.float32)

    m_l2 = match_descriptors(jnp.asarray(a), jnp.ones(n, bool),
                             jnp.asarray(b), jnp.ones(n, bool),
                             MatchConfig(metric="l2", max_matches=64))
    m_dot = match_descriptors(jnp.asarray(a), jnp.ones(n, bool),
                              jnp.asarray(b), jnp.ones(n, bool),
                              MatchConfig(metric="dot", max_matches=64))
    # Same match COUNT and same (a, b) pair SET; the output order may
    # differ (matches sort by distance, and cosine vs squared-L2 round
    # differently in f32, permuting near-ties).
    assert int(np.asarray(m_l2.valid).sum()) == \
        int(np.asarray(m_dot.valid).sum())
    v2, vd = np.asarray(m_l2.valid), np.asarray(m_dot.valid)
    pairs_l2 = set(zip(np.asarray(m_l2.idx_a)[v2].tolist(),
                       np.asarray(m_l2.idx_b)[v2].tolist()))
    pairs_dot = set(zip(np.asarray(m_dot.idx_a)[vd].tolist(),
                        np.asarray(m_dot.idx_b)[vd].tolist()))
    assert pairs_l2 == pairs_dot


def test_l2q8_quantized_matches_agree_with_f32():
    """int8-quantized distances: same match set as f32 away from ratio
    decision boundaries (planted correspondences on real-ish codes)."""
    rng = np.random.default_rng(11)
    nb = 512
    b = rng.standard_normal((nb, 128)).astype(np.float32) * 2.0
    sel = rng.permutation(nb)[:128]
    a = np.concatenate([
        b[sel] + 0.02 * rng.standard_normal((128, 128)),
        rng.standard_normal((128, 128)) * 2.0,
    ]).astype(np.float32)
    va = np.ones(256, bool)
    vb = np.ones(nb, bool)

    ref = match_descriptors(jnp.asarray(a), jnp.asarray(va), jnp.asarray(b),
                            jnp.asarray(vb), MatchConfig(max_matches=256))
    q8 = match_descriptors(jnp.asarray(a), jnp.asarray(va), jnp.asarray(b),
                           jnp.asarray(vb),
                           MatchConfig(max_matches=256, metric="l2q8"))

    rp = {(int(x), int(y)) for x, y in
          zip(np.asarray(ref.idx_a)[np.asarray(ref.valid)],
              np.asarray(ref.idx_b)[np.asarray(ref.valid)])}
    qp = {(int(x), int(y)) for x, y in
          zip(np.asarray(q8.idx_a)[np.asarray(q8.valid)],
              np.asarray(q8.idx_b)[np.asarray(q8.valid)])}
    assert len(rp) >= 100
    # Quantization only flips decisions near the ratio boundary.
    assert len(qp & rp) / len(rp) >= 0.97, (len(qp & rp), len(rp))
    # Planted pairs are never cross-wired.
    planted = dict(enumerate(sel))
    for x, y in qp:
        if x < 128:
            assert y == planted[x]


def test_l2q8_padding_inert():
    """Garbage in invalid descriptor slots must not change l2q8 results
    (the per-tensor quantization scale is the hazard — CLAUDE.md padding
    invariant)."""
    rng = np.random.default_rng(12)
    a = rng.standard_normal((128, 128)).astype(np.float32)
    b = rng.standard_normal((128, 128)).astype(np.float32)
    va = np.arange(128) < 64
    vb = np.arange(128) < 64
    cfg = MatchConfig(max_matches=128, metric="l2q8")

    ref = match_descriptors(jnp.asarray(a), jnp.asarray(va),
                            jnp.asarray(b), jnp.asarray(vb), cfg)
    a2, b2 = a.copy(), b.copy()
    a2[64:] = 50.0                       # poison the padding rows
    b2[64:] = -75.0
    got = match_descriptors(jnp.asarray(a2), jnp.asarray(va),
                            jnp.asarray(b2), jnp.asarray(vb), cfg)
    np.testing.assert_array_equal(np.asarray(ref.valid),
                                  np.asarray(got.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(ref.idx_a)[m],
                                  np.asarray(got.idx_a)[m])
    np.testing.assert_array_equal(np.asarray(ref.idx_b)[m],
                                  np.asarray(got.idx_b)[m])
