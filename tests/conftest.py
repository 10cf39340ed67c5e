"""Test configuration: force JAX onto 8 virtual CPU devices.

The test suite must run identically on a dev box with one real TPU chip and in
CI with no accelerator at all, and the multi-device (sharding) tests need more
than one device.  JAX may already have been imported by the interpreter's
sitecustomize before pytest starts, so environment variables are too late —
we use `jax.config.update`, which works until the backend is first used.
"""

import os
import sys

# Keep both paths working: config update for already-imported jax, env vars for
# subprocesses spawned by tests (e.g. distributed loopback tests).
os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Make the repo root importable when tests run from a different cwd.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
