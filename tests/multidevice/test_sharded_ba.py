"""Distributed BA on the 8-virtual-device CPU mesh (SURVEY.md §4:
multi-host without a cluster). The invariant that matters: sharded and
single-device optimization produce the same result (determinism across
shardings, SURVEY.md §5 race-detection analog)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sift_tpu.config import BAConfig, MeshConfig
from sift_tpu.ba.solver import run_ba
from sift_tpu.dist.mesh import make_mesh
from sift_tpu.dist.ba_dist import run_ba_sharded
from sift_tpu.io.synthetic import make_scene, pad_observations


@pytest.fixture(scope="module")
def scene():
    s = make_scene(np.random.default_rng(7), num_cameras=6, num_landmarks=160,
                   pose_noise=0.02, landmark_noise=0.1)
    return pad_observations(s, 1024)


def _fixed(c):
    m = np.zeros(c, bool)
    m[:2] = True
    return jnp.asarray(m)


def _args(scene):
    s = {k: jnp.asarray(v) for k, v in scene.items()
         if isinstance(v, np.ndarray)}
    return (s["poses_init"], s["intrinsics"], s["landmarks_init"],
            s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"])


@pytest.mark.parametrize("mesh_cfg", [
    MeshConfig(data=8, model=1),
    MeshConfig(data=4, model=2),
    MeshConfig(data=2, model=2),
])
def test_sharded_matches_single_device(scene, eight_devices, mesh_cfg):
    cfg = BAConfig(max_iterations=8, cg_iterations=40)
    args = _args(scene)
    fixed = _fixed(6)

    ref = run_ba(*args, cfg, fixed)
    mesh = make_mesh(mesh_cfg)
    got = run_ba_sharded(mesh, *args, cfg=cfg, fixed_cam_mask=fixed)

    # Same trajectory regardless of mesh shape (within float reassociation).
    np.testing.assert_allclose(np.asarray(got.poses), np.asarray(ref.poses),
                               atol=1e-4)
    np.testing.assert_allclose(float(got.rmse), float(ref.rmse), atol=1e-3)


def test_reduce_scatter_v_mode_matches_psum(scene, eight_devices):
    """Ulysses-style by-landmark reshard (reduce_scatter V + local inverse +
    all_gather) must equal the psum path (SURVEY §5: both layouts)."""
    cfg = BAConfig(max_iterations=8, cg_iterations=40)
    args = _args(scene)
    fixed = _fixed(6)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    a = run_ba_sharded(mesh, *args, cfg=cfg, fixed_cam_mask=fixed,
                       v_mode="psum")
    b = run_ba_sharded(mesh, *args, cfg=cfg, fixed_cam_mask=fixed,
                       v_mode="reduce_scatter")
    np.testing.assert_allclose(np.asarray(b.poses), np.asarray(a.poses),
                               atol=1e-4)
    np.testing.assert_allclose(float(b.rmse), float(a.rmse), atol=1e-3)


def test_sharded_ba_converges(scene, eight_devices):
    cfg = BAConfig(max_iterations=20, cg_iterations=60)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    st = run_ba_sharded(mesh, *_args(scene), cfg=cfg, fixed_cam_mask=_fixed(6))
    assert float(st.rmse) < 0.05
    np.testing.assert_allclose(np.asarray(st.poses), scene["poses_gt"],
                               atol=5e-3)
