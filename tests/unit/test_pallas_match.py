"""Streaming Pallas top-2 matcher vs the XLA formulation.

CPU CI runs the kernel through the Pallas interpreter; on a real TPU the
same assertions hold for the compiled Mosaic kernel (BENCH.md records the
measured large-N speedup).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sift_tpu.config import MatchConfig
from sift_tpu.kernels.pallas.match import streaming_top2
from sift_tpu.matching.matcher import (_BIG, _top2_min, match_descriptors,
                                       pairwise_sqdist)

INTERPRET = jax.devices()[0].platform != "tpu"


def _case(seed, na, nb, d=128, invalid_frac=0.2):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((na, d)).astype(np.float32) * 10.0
    b = rng.standard_normal((nb, d)).astype(np.float32) * 10.0
    va = rng.random(na) > invalid_frac
    vb = rng.random(nb) > invalid_frac
    va[0] = vb[0] = True
    return a, va, b, vb


def _xla_top2(a, va, b, vb):
    d = pairwise_sqdist(jnp.asarray(a), jnp.asarray(b))
    d = jnp.where(jnp.asarray(vb)[None, :], d, _BIG)
    d = jnp.where(jnp.asarray(va)[:, None], d, _BIG)
    return _top2_min(d)


@pytest.mark.parametrize("seed,na,nb", [
    (0, 1024, 1024),       # exactly one tile each way
    (1, 2048, 1536),       # multiple tiles
    (2, 700, 900),         # non-multiples: padding path
    (3, 100, 60),          # smaller than one tile
])
def test_top2_matches_xla(seed, na, nb):
    a, va, b, vb = _case(seed, na, nb)
    best, second, arg = streaming_top2(
        jnp.asarray(a), jnp.asarray(va), jnp.asarray(b), jnp.asarray(vb),
        INTERPRET)
    xb, xs, xa = _xla_top2(a, va, b, vb)

    has = np.asarray(va) & (np.asarray(xb) < 1e29)
    np.testing.assert_array_equal(np.asarray(arg)[has],
                                  np.asarray(xa)[has])
    np.testing.assert_allclose(np.asarray(best)[has],
                               np.asarray(xb)[has], rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(second)[has],
                               np.asarray(xs)[has], rtol=1e-5, atol=1e-2)
    # Rows without a valid candidate saturate in both formulations.
    assert (np.asarray(best)[~has] >= 1e29).all()


def test_all_invalid_columns():
    a, va, b, _ = _case(4, 256, 256)
    vb = np.zeros(256, bool)
    best, _, arg = streaming_top2(
        jnp.asarray(a), jnp.asarray(va), jnp.asarray(b), jnp.asarray(vb),
        INTERPRET)
    assert (np.asarray(best) >= 1e29).all()
    assert ((np.asarray(arg) >= 0) & (np.asarray(arg) < 256)).all()


def test_padding_slots_inert():
    a, va, b, vb = _case(5, 300, 450)
    out1 = streaming_top2(jnp.asarray(a), jnp.asarray(va),
                          jnp.asarray(b), jnp.asarray(vb), INTERPRET)
    a2, b2 = a.copy(), b.copy()
    a2[~va] = 1e6
    b2[~vb] = -1e6
    out2 = streaming_top2(jnp.asarray(a2), jnp.asarray(va),
                          jnp.asarray(b2), jnp.asarray(vb), INTERPRET)
    has = np.asarray(va) & (np.asarray(out1[0]) < 1e29)
    for x, y in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(x)[has],
                                      np.asarray(y)[has])


@pytest.mark.parametrize("mutual", [False, True])
@pytest.mark.parametrize("metric", ["l2", "dot"])
def test_full_matcher_agrees(mutual, metric):
    """`impl="pallas"` produces the same Matches as `impl="xla"` end to
    end (ratio + mutual + compaction)."""
    a, va, b, vb = _case(6, 640, 512)
    cfg_x = MatchConfig(ratio=0.95, mutual=mutual, max_matches=256,
                        metric=metric, impl="xla")
    _assert_matchers_agree(a, va, b, vb, cfg_x)


def test_full_matcher_agrees_true_matches():
    """Same end-to-end agreement on data where the ratio test PASSES:
    b is a noisy permutation of a, so most rows produce a real match and
    the idx_b / distance comparisons aren't vacuous."""
    rng = np.random.default_rng(11)
    n = 512
    a = rng.standard_normal((n, 128)).astype(np.float32) * 5.0
    perm = rng.permutation(n)
    b = a[perm] + rng.standard_normal((n, 128)).astype(np.float32) * 0.05
    va = rng.random(n) > 0.1
    vb = rng.random(n) > 0.1
    cfg_x = MatchConfig(ratio=0.8, mutual=True, max_matches=n, impl="xla")
    mx = _assert_matchers_agree(a, va, b, vb, cfg_x)
    sel = np.asarray(mx.valid)
    assert sel.sum() > n // 2          # the comparison has real power
    ia = np.asarray(mx.idx_a)[sel]
    ib = np.asarray(mx.idx_b)[sel]
    # b[i] = a[perm[i]] + noise, so a-row j matches b-row inv_perm[j].
    inv = np.argsort(perm)
    assert (inv[ia] == ib).mean() > 0.99


def _assert_matchers_agree(a, va, b, vb, cfg_x):
    cfg_p = cfg_x.replace(impl="pallas")
    mx = match_descriptors(jnp.asarray(a), jnp.asarray(va),
                           jnp.asarray(b), jnp.asarray(vb), cfg_x)
    mp = match_descriptors(jnp.asarray(a), jnp.asarray(va),
                           jnp.asarray(b), jnp.asarray(vb), cfg_p)
    np.testing.assert_array_equal(np.asarray(mx.valid), np.asarray(mp.valid))
    sel = np.asarray(mx.valid)
    np.testing.assert_array_equal(np.asarray(mx.idx_a)[sel],
                                  np.asarray(mp.idx_a)[sel])
    np.testing.assert_array_equal(np.asarray(mx.idx_b)[sel],
                                  np.asarray(mp.idx_b)[sel])
    np.testing.assert_allclose(np.asarray(mx.distance)[sel],
                               np.asarray(mp.distance)[sel],
                               rtol=1e-5, atol=1e-2)
    return mx
