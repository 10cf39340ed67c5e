"""Checkpoint/resume tests, including kill-mid-run fault injection
(SURVEY.md §5: restart-from-checkpoint recovery; the reference has none)."""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from sift_tpu.io.checkpoint import (
    save_checkpoint, restore_checkpoint, CheckpointManager)


def test_roundtrip_pytree(tmp_path):
    state = {
        "poses": jnp.arange(12, dtype=jnp.float32).reshape(2, 6),
        "landmarks": jnp.ones((5, 3)),
        "meta": {"step": jnp.asarray(7)},
    }
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, state)
    got = restore_checkpoint(p, target=state)
    np.testing.assert_array_equal(np.asarray(got["poses"]),
                                  np.asarray(state["poses"]))
    assert int(got["meta"]["step"]) == 7


def test_manager_rotation(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "mgr"), max_to_keep=2)
    for step in range(4):
        mgr.save(step, {"x": jnp.full((3,), float(step))})
    mgr.wait()
    assert mgr.latest_step() == 3
    got = mgr.restore(3, target={"x": jnp.zeros((3,))})
    np.testing.assert_allclose(np.asarray(got["x"]), 3.0)
    mgr.close()


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, "@REPO@")
from sift_tpu.config import BAConfig
from sift_tpu.ba.solver import run_ba
from sift_tpu.io.synthetic import make_scene, pad_observations
from sift_tpu.io.checkpoint import CheckpointManager

ckpt_dir, steps, die_at = sys.argv[1], int(sys.argv[2]), sys.argv[3]
die_at = int(die_at) if die_at != "none" else None

scene = make_scene(np.random.default_rng(11), num_cameras=5,
                   num_landmarks=80, pose_noise=0.02, landmark_noise=0.1)
scene = pad_observations(scene, 512)
fixed = np.zeros(5, bool); fixed[:2] = True
cfg = BAConfig(max_iterations=1, cg_iterations=30)  # one LM step per "epoch"

mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
start = 0
poses = jnp.asarray(scene["poses_init"])
lms = jnp.asarray(scene["landmarks_init"])
latest = mgr.latest_step()
if latest is not None:
    st = mgr.restore(latest, target={"poses": poses, "landmarks": lms})
    poses, lms = st["poses"], st["landmarks"]
    start = latest + 1

for step in range(start, steps):
    out = run_ba(poses, jnp.asarray(scene["intrinsics"]), lms,
                 jnp.asarray(scene["obs_cam"]), jnp.asarray(scene["obs_lm"]),
                 jnp.asarray(scene["obs_uv"]), jnp.asarray(scene["obs_valid"]),
                 cfg, jnp.asarray(fixed))
    poses, lms = out.poses, out.landmarks
    mgr.save(step, {"poses": poses, "landmarks": lms})
    mgr.wait()
    if die_at is not None and step == die_at:
        os._exit(42)        # simulated host failure (no cleanup)
mgr.close()
np.save(os.path.join(ckpt_dir, "final.npy"), np.asarray(poses))
"""


@pytest.mark.slow
def test_fault_injection_resume_equivalence(tmp_path):
    """Kill the optimizer mid-run; restart must reproduce the uninterrupted
    result exactly (deterministic optimizer + checkpointed state)."""
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("@REPO@", repo))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="",
               PALLAS_AXON_POOL_IPS="")

    def run(ckpt_dir, die_at):
        return subprocess.run(
            [sys.executable, str(script), str(ckpt_dir), "6", die_at],
            env=env, capture_output=True, text=True, timeout=600)

    # Uninterrupted baseline.
    d1 = tmp_path / "a"
    r = run(d1, "none")
    assert r.returncode == 0, r.stderr[-2000:]

    # Fault at step 3, then resume.
    d2 = tmp_path / "b"
    r = run(d2, "3")
    assert r.returncode == 42          # died mid-run
    r = run(d2, "none")
    assert r.returncode == 0, r.stderr[-2000:]

    a = np.load(d1 / "final.npy")
    b = np.load(d2 / "final.npy")
    np.testing.assert_allclose(a, b, atol=1e-6)
