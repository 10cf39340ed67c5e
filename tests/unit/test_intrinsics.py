"""Self-calibration tests: recover perturbed intrinsics on synthetic scenes."""

import numpy as np
import jax.numpy as jnp

from sift_tpu.config import BAConfig
from sift_tpu.ba.intrinsics import refine_intrinsics, self_calibrate
from sift_tpu.io.synthetic import make_scene, pad_observations


def test_refine_intrinsics_structure_fixed():
    scene = make_scene(np.random.default_rng(0), num_cameras=6,
                       num_landmarks=200)
    scene = pad_observations(scene, 2048)
    K_true = jnp.asarray(scene["intrinsics"])
    K0 = K_true + jnp.asarray([25.0, -18.0, 6.0, -4.0])

    K, rmse = refine_intrinsics(
        K0, jnp.asarray(scene["poses_gt"]), jnp.asarray(scene["landmarks_gt"]),
        jnp.asarray(scene["obs_cam"]), jnp.asarray(scene["obs_lm"]),
        jnp.asarray(scene["obs_uv"]), jnp.asarray(scene["obs_valid"]))
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_true), atol=0.1)
    assert float(rmse) < 0.05


def test_self_calibrate_alternation():
    scene = make_scene(np.random.default_rng(1), num_cameras=6,
                       num_landmarks=200, pose_noise=0.01,
                       landmark_noise=0.05)
    scene = pad_observations(scene, 2048)
    K_true = jnp.asarray(scene["intrinsics"])
    K0 = K_true + jnp.asarray([15.0, -10.0, 4.0, -3.0])
    fixed = np.zeros(6, bool)
    fixed[:2] = True

    K, poses, lms, st = self_calibrate(
        K0, jnp.asarray(scene["poses_init"]),
        jnp.asarray(scene["landmarks_init"]),
        jnp.asarray(scene["obs_cam"]), jnp.asarray(scene["obs_lm"]),
        jnp.asarray(scene["obs_uv"]), jnp.asarray(scene["obs_valid"]),
        BAConfig(max_iterations=10, cg_iterations=40), jnp.asarray(fixed))
    # Under translation-dominant motion, focal length is only weakly
    # observable: BA can absorb a focal error into depth/scale, so the
    # alternation guarantees a *consistent* model (tight reprojection,
    # finite sane intrinsics), not recovery of the true K — that needs
    # rotation-rich motion (verified exactly in the structure-fixed test).
    assert float(st.rmse) < 0.1
    K = np.asarray(K)
    assert np.isfinite(K).all() and (K[:2] > 100).all()
