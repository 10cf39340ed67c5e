"""Multi-host fault injection (SURVEY.md §5, VERDICT r1 item 7).

The full kill -> detect -> restart cycle, multi-host-without-a-cluster
style: a 2-process distributed BA checkpoints mid-optimization, process 1
is killed abruptly, process 0 *detects* the death via the heartbeat layer
(sift_tpu/dist/failure.py) and exits cleanly instead of hanging in the
next collective; the job then restarts as a 1-process 4-device mesh from
the checkpoint and finishes. The resumed result must match an
uninterrupted run chunked at the same boundary (resume-equivalence — the
LM loop state is exactly (poses, landmarks, damping)).
"""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

_WORKER = r"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
pid, n, port, outdir, mode = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4], sys.argv[5])
if n > 1:
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=n, process_id=pid)
sys.path.insert(0, "@REPO@")
import numpy as np
import jax.numpy as jnp
from sift_tpu.config import BAConfig, MeshConfig
from sift_tpu.dist.mesh import make_mesh
from sift_tpu.dist.ba_dist import run_ba_sharded
from sift_tpu.dist.failure import Heartbeat
from sift_tpu.io.synthetic import make_scene, pad_observations

scene = make_scene(np.random.default_rng(31), num_cameras=5,
                   num_landmarks=96, pose_noise=0.02, landmark_noise=0.1)
scene = pad_observations(scene, 512)
fixed = np.zeros(5, bool); fixed[:2] = True
mesh = make_mesh(MeshConfig(data=4 * n, model=1))

CHUNK1, CHUNK2 = 3, 5

def chunk(poses, lms, damping_init, iters):
    cfg = BAConfig(max_iterations=iters, cg_iterations=30,
                   damping_init=damping_init)
    return run_ba_sharded(
        mesh, jnp.asarray(poses), jnp.asarray(scene["intrinsics"]),
        jnp.asarray(lms), scene["obs_cam"], scene["obs_lm"],
        scene["obs_uv"], scene["obs_valid"], cfg=cfg,
        fixed_cam_mask=jnp.asarray(fixed))

ckpt = os.path.join(outdir, "ba_ckpt.npz")

if mode == "fault":
    hb = Heartbeat(os.path.join(outdir, "hb"), pid).start()
    assert hb.wait_for_peers(n), "peers never appeared"
    st = chunk(scene["poses_init"], scene["landmarks_init"], 1e-3, CHUNK1)
    # BOTH processes materialize the result: without this, the non-saving
    # process returns from the (async) dispatch immediately and dies while
    # its peer is still inside the collective.
    poses, landmarks, damping = jax.device_get(
        (st.poses, st.landmarks, st.damping))
    if pid == 0:
        np.savez(ckpt + ".tmp.npz", poses=poses, landmarks=landmarks,
                 damping=damping)
        os.replace(ckpt + ".tmp.npz", ckpt)
    if pid == 1:
        # Die only after the checkpoint exists (survivor is then in its
        # detection loop, outside any collective).
        deadline = time.time() + 30.0
        while not os.path.exists(ckpt) and time.time() < deadline:
            time.sleep(0.05)
        os._exit(13)            # die abruptly mid-job
    # pid 0: detect the death instead of hanging in the next collective.
    deadline = time.time() + 20.0
    while time.time() < deadline:
        if 1 in hb.stale_peers(n, timeout_s=1.5):
            # detected -> clean stop for restart. os._exit: sys.exit would
            # run atexit's jax.distributed shutdown barrier, which blocks
            # on the DEAD peer and corrupts the exit code.
            os._exit(17)
        time.sleep(0.1)
    os._exit(3)                 # detection failed

elif mode == "resume":
    z = np.load(ckpt)
    st = chunk(z["poses"], z["landmarks"], float(z["damping"]), CHUNK2)
    np.save(os.path.join(outdir, "poses_resumed.npy"), np.asarray(st.poses))

elif mode == "golden":
    st1 = chunk(scene["poses_init"], scene["landmarks_init"], 1e-3, CHUNK1)
    st2 = chunk(np.asarray(st1.poses), np.asarray(st1.landmarks),
                float(st1.damping), CHUNK2)
    np.save(os.path.join(outdir, "poses_golden.npy"), np.asarray(st2.poses))
"""


@pytest.mark.slow
def test_kill_one_process_mid_ba_then_restart_smaller_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("@REPO@", _REPO))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = ""
    env["PALLAS_AXON_POOL_IPS"] = ""

    def launch(pid, n, port, mode):
        return subprocess.Popen(
            [sys.executable, str(script), str(pid), str(n), port,
             str(tmp_path), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)

    # Phase 1: 2-process job; process 1 dies after the checkpoint.
    procs = [launch(pid, 2, "19751", "fault") for pid in range(2)]
    out0, err0 = procs[0].communicate(timeout=600)
    out1, err1 = procs[1].communicate(timeout=600)
    assert procs[1].returncode == 13, err1[-2000:]   # killed itself
    assert procs[0].returncode == 17, (
        f"survivor failed to detect the death: rc={procs[0].returncode} "
        f"{err0[-2000:]}")
    assert (tmp_path / "ba_ckpt.npz").exists()

    # Phase 2: restart on a smaller (1-process, 4-device) mesh.
    p = launch(0, 1, "19752", "resume")
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err[-3000:]

    # Golden: uninterrupted single-process run chunked at the same boundary.
    p = launch(0, 1, "19753", "golden")
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err[-3000:]

    resumed = np.load(tmp_path / "poses_resumed.npy")
    golden = np.load(tmp_path / "poses_golden.npy")
    np.testing.assert_allclose(resumed, golden, atol=5e-4)


def test_heartbeat_detects_stale_and_live_peers(tmp_path):
    from sift_tpu.dist.failure import Heartbeat
    a = Heartbeat(str(tmp_path), 0, interval_s=0.05).start()
    b = Heartbeat(str(tmp_path), 1, interval_s=0.05).start()
    try:
        assert a.wait_for_peers(2, timeout_s=5.0)
        assert a.stale_peers(2, timeout_s=1.0) == []
        b.stop()
        time.sleep(1.2)
        assert a.stale_peers(2, timeout_s=1.0) == [1]
        # missing peer counts as stale too
        assert set(a.stale_peers(3, timeout_s=1.0)) == {1, 2}
    finally:
        a.stop()
        b.stop()
