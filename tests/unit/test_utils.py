"""Metrics logger, profiling contexts, and debug guard tests."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from sift_tpu.utils.metrics import MetricsLogger, stage
from sift_tpu.utils.debug import check_finite, assert_trees_equal, debug_nans


def test_metrics_jsonl_roundtrip(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with MetricsLogger(p) as log:
        log.log("frame", idx=3, kps=120)
        with stage("extract", log, frame=3):
            pass
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["event"] == "frame" and lines[0]["kps"] == 120
    assert lines[1]["event"] == "stage" and lines[1]["name"] == "extract"
    assert lines[1]["wall_s"] >= 0


def test_check_finite_raises():
    check_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        check_finite({"a": jnp.asarray([1.0, np.nan])}, "bad")


def test_assert_trees_equal():
    a = {"x": jnp.arange(4.0), "y": (jnp.zeros(2),)}
    assert_trees_equal(a, a)
    b = {"x": jnp.arange(4.0) + 1e-3, "y": (jnp.zeros(2),)}
    with pytest.raises(AssertionError):
        assert_trees_equal(a, b, atol=1e-6)
    assert_trees_equal(a, b, atol=1e-2)


def test_debug_nans_scope():
    import jax

    with debug_nans(True):
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.asarray(-1.0)).block_until_ready()
    # Restored outside the scope.
    assert not jax.config.jax_debug_nans
    assert bool(jnp.isnan(jnp.log(jnp.asarray(-1.0))))
