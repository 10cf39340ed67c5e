"""Global descriptor index: MXU brute-force place recognition."""

import numpy as np
import jax.numpy as jnp

from sift_tpu.matching.global_index import GlobalDescriptorIndex


def _desc(rng, n=64, d=128):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_query_ranks_matching_keyframe_first():
    rng = np.random.default_rng(0)
    idx = GlobalDescriptorIndex(capacity_kf=8, n_per_kf=64)
    banks = [_desc(rng) for _ in range(5)]
    for k, b in enumerate(banks):
        idx.add(k, jnp.asarray(b), jnp.ones(64, bool))

    # Query = noisy copy of keyframe 3's descriptors.
    q = banks[3] + 0.02 * rng.standard_normal((64, 128)).astype(np.float32)
    votes = idx.query(jnp.asarray(q), jnp.ones(64, bool))
    assert votes.shape == (8,)
    assert votes.argmax() == 3
    assert votes[3] > 50                  # almost all queries vote
    assert (votes[5:] == 0).all()         # unused slots

    top = idx.top_candidates(jnp.asarray(q), jnp.ones(64, bool), k=2)
    assert top[0] == 3


def test_exclusion_and_invalid_rows():
    rng = np.random.default_rng(1)
    idx = GlobalDescriptorIndex(capacity_kf=6, n_per_kf=32)
    b = _desc(rng, 32)
    for k in range(4):
        idx.add(k, jnp.asarray(b), jnp.ones(32, bool))   # all identical
    top = idx.top_candidates(jnp.asarray(b), jnp.ones(32, bool), k=4,
                             exclude_from=2)
    assert set(top.tolist()) <= {0, 1}

    # Invalid bank rows never vote.
    idx2 = GlobalDescriptorIndex(capacity_kf=2, n_per_kf=32)
    idx2.add(0, jnp.asarray(b), jnp.zeros(32, bool))
    votes = idx2.query(jnp.asarray(b), jnp.ones(32, bool))
    assert votes[0] == 0

    # Invalid query rows never vote either.
    idx2.add(0, jnp.asarray(b), jnp.ones(32, bool))
    votes = idx2.query(jnp.asarray(b), jnp.zeros(32, bool))
    assert votes[0] == 0
