"""Multi-host-without-a-cluster test (SURVEY.md §4): two OS processes join a
jax.distributed coordinator over loopback (the DCN-path analog, Gloo
collectives on CPU), each contributing 4 virtual devices to a global 8-device
mesh, and run the distributed BA step. The result must match the
single-process 8-device run exactly."""

import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
pid, n, port, outdir = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                        sys.argv[4])
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=n, process_id=pid)
sys.path.insert(0, "@REPO@")
import numpy as np
import jax.numpy as jnp
from sift_tpu.config import BAConfig, MeshConfig
from sift_tpu.dist.mesh import make_mesh
from sift_tpu.dist.ba_dist import run_ba_sharded
from sift_tpu.io.synthetic import make_scene, pad_observations

assert len(jax.devices()) == 4 * n, jax.devices()
scene = make_scene(np.random.default_rng(21), num_cameras=5,
                   num_landmarks=96, pose_noise=0.02, landmark_noise=0.1)
scene = pad_observations(scene, 512)
fixed = np.zeros(5, bool); fixed[:2] = True
mesh = make_mesh(MeshConfig(data=4 * n, model=1))
st = run_ba_sharded(
    mesh, jnp.asarray(scene["poses_init"]), jnp.asarray(scene["intrinsics"]),
    jnp.asarray(scene["landmarks_init"]), scene["obs_cam"], scene["obs_lm"],
    scene["obs_uv"], scene["obs_valid"],
    cfg=BAConfig(max_iterations=6, cg_iterations=30),
    fixed_cam_mask=jnp.asarray(fixed))
if pid == 0:
    np.save(os.path.join(outdir, f"poses_{n}proc.npy"),
            np.asarray(jax.device_get(st.poses)))

# Row-sharded matching across the same global mesh (integer outputs must
# be identical across process counts).
from sift_tpu.config import MatchConfig
from sift_tpu.dist.matching_dist import match_large_sharded
rng = np.random.default_rng(7)
db = rng.standard_normal((96, 128)).astype(np.float32) * 3.0
qa = rng.standard_normal((128, 128)).astype(np.float32) * 3.0
qa[:48] = db[:48] + 0.01 * rng.standard_normal((48, 128))
m = match_large_sharded(mesh, jnp.asarray(qa), jnp.ones(128, bool),
                        jnp.asarray(db), jnp.ones(96, bool),
                        MatchConfig(max_matches=64))
if pid == 0:
    np.savez(os.path.join(outdir, f"matches_{n}proc.npz"),
             idx_a=np.asarray(jax.device_get(m.idx_a)),
             idx_b=np.asarray(jax.device_get(m.idx_b)),
             valid=np.asarray(jax.device_get(m.valid)))

# Sharded extraction + a mesh-backed SLAM chunk run across the SAME
# global mesh (r5, VERDICT #3b): the loopback previously exercised only
# BA/matching/PGO. Trajectories must agree across process counts
# (per-shard batch differs 2 vs 1, so extraction low bits may move —
# the pipeline is tolerance-robust to that by r5 hardening).
from sift_tpu.config import SiftConfig
from sift_tpu.dist.frontend_dist import extract_batch_sharded
scfg = SiftConfig(mode="lowe", octaves=3, max_keypoints=256,
                  max_keypoints_per_octave=128)
rng2 = np.random.default_rng(11)
yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
base = (128 + 60 * np.sin(xx / 5.0) * np.cos(yy / 7.0)
        + 25 * rng2.standard_normal((96, 128))).clip(0, 255)
frames8 = np.clip(
    base[None] + rng2.uniform(-2, 2, (8, 1, 1)).astype(np.float32),
    0, 255).astype(np.float32)
# replicate=True: sharded outputs span non-addressable devices in
# multiprocess, so the host-side save below needs the gathered buffers.
kp = extract_batch_sharded(mesh, frames8, scfg, True, replicate=True)
if pid == 0:
    np.savez(os.path.join(outdir, f"extract_{n}proc.npz"),
             x=np.asarray(jax.device_get(kp.x)),
             y=np.asarray(jax.device_get(kp.y)),
             valid=np.asarray(jax.device_get(kp.valid)))

from sift_tpu.slam.pipeline import SfmPipeline
from sift_tpu.config import (PipelineConfig, MatchConfig as MC,
                             RansacConfig, BAConfig as BC)
sys.path.insert(0, "@REPO@")
from tests.e2e.test_image_sfm import _render, _cfg, INTR, STEP
pcfg = _cfg().replace(chunked_tracking=True)
pipe = SfmPipeline(INTR, pcfg, mesh=mesh)
seq = [_render(STEP * i) for i in range(8)]
pipe.process_sequence(seq, batch=8)
if pid == 0:
    np.savez(os.path.join(outdir, f"slam_{n}proc.npz"),
             pos=pipe.positions(),
             tracked=np.asarray([r["tracked"] for r in pipe.trajectory]))
"""


@pytest.mark.slow
def test_two_process_ba_matches_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("@REPO@", _REPO))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = ""
    env["PALLAS_AXON_POOL_IPS"] = ""

    def run(n, port):
        procs = [subprocess.Popen(
            [sys.executable, str(script), str(pid), str(n), port,
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True) for pid in range(n)]
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, err[-3000:]

    run(1, "19741")            # single process, 4 devices
    run(2, "19742")            # two processes, 4 devices each

    a = np.load(tmp_path / "poses_1proc.npy")
    b = np.load(tmp_path / "poses_2proc.npy")
    # Same optimization across process counts (float reassociation only).
    np.testing.assert_allclose(a, b, atol=1e-4)

    ma = np.load(tmp_path / "matches_1proc.npz")
    mb = np.load(tmp_path / "matches_2proc.npz")
    assert ma["valid"].sum() >= 40              # planted matches recovered
    np.testing.assert_array_equal(ma["valid"], mb["valid"])
    v = ma["valid"]
    np.testing.assert_array_equal(ma["idx_a"][v], mb["idx_a"][v])
    np.testing.assert_array_equal(ma["idx_b"][v], mb["idx_b"][v])

    # Sharded extraction across process counts: per-image valid keypoint
    # counts agree (within tie-flip slack; per-shard batch is 2 vs 1) and
    # the position sets agree.
    ea = np.load(tmp_path / "extract_1proc.npz")
    eb = np.load(tmp_path / "extract_2proc.npz")
    for b in range(ea["x"].shape[0]):
        ca, cb = int(ea["valid"][b].sum()), int(eb["valid"][b].sum())
        assert abs(ca - cb) <= 3, (b, ca, cb)
        pa = np.sort(ea["x"][b][ea["valid"][b]])
        pb = np.sort(eb["x"][b][eb["valid"][b]])
        m = min(pa.size, pb.size)
        # trimmed sorted comparison (marginal keypoints may differ)
        np.testing.assert_allclose(pa[:m][np.abs(pa[:m] - pb[:m]) < 1.0],
                                   pb[:m][np.abs(pa[:m] - pb[:m]) < 1.0],
                                   atol=1e-2)
        assert np.mean(np.abs(pa[:m] - pb[:m]) < 1.0) > 0.9

    # Mesh-backed SLAM chunk run: trajectory equivalent across process
    # counts.
    sa = np.load(tmp_path / "slam_1proc.npz")
    sb = np.load(tmp_path / "slam_2proc.npz")
    np.testing.assert_array_equal(sa["tracked"], sb["tracked"])
    assert sa["tracked"].mean() > 0.8
    np.testing.assert_allclose(sa["pos"], sb["pos"], atol=5e-3)
