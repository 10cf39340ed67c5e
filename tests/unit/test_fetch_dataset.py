"""Dry-run of the dataset-ingestion tool against the checked-in fixtures.

The fetch path needs network (none in CI); the verification path — the
part that gates "data is loadable for the BASELINE ATE row" — is fully
testable against tests/fixtures/{tum_mini,kitti_mini}.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

sys.path.insert(0, os.path.join(REPO, "tools"))

import fetch_dataset  # noqa: E402


def test_verify_tum_fixture():
    p = os.path.join(REPO, "tests/fixtures/tum_mini",
                     "rgbd_dataset_freiburg1_mini")
    assert fetch_dataset.verify_layout(p, "tum") == []


def test_verify_kitti_fixture():
    p = os.path.join(REPO, "tests/fixtures/kitti_mini")
    assert fetch_dataset.verify_layout(p, "kitti") == []


def test_verify_detects_missing_pieces(tmp_path):
    assert fetch_dataset.verify_layout(str(tmp_path), "tum")
    assert fetch_dataset.verify_layout(str(tmp_path), "kitti")


def test_cli_verify_only():
    p = os.path.join(REPO, "tests/fixtures/kitti_mini")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/fetch_dataset.py"),
         "--verify-only", p],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": "", "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr
    assert "OK (kitti)" in out.stdout


def test_fetch_attempt_records_no_egress(tmp_path):
    """In this environment the fetch must fail CLEANLY (no egress)."""
    rc = fetch_dataset.fetch("tum_fr1_xyz", str(tmp_path))
    assert rc in (0, 2)        # 0 if egress ever appears, 2 = clean fail
