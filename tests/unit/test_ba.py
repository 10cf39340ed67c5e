"""Bundle adjustment property tests on synthetic scenes (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from sift_tpu.config import BAConfig
from sift_tpu.ba.residuals import cost, linearize
from sift_tpu.ba.schur import build_system, schur_matvec, schur_rhs, pcg
from sift_tpu.ba.solver import run_ba
from sift_tpu.io.synthetic import make_scene, pad_observations


def _to_jnp(scene):
    return {k: jnp.asarray(v) for k, v in scene.items()
            if isinstance(v, np.ndarray)}


def _fixed_mask(c):
    m = np.zeros(c, bool)
    m[:2] = True          # gauge: first two cameras pinned
    return jnp.asarray(m)


def test_zero_noise_scene_has_zero_cost():
    scene = make_scene(np.random.default_rng(0))
    s = _to_jnp(scene)
    c, rmse = cost(s["poses_gt"], s["intrinsics"], s["landmarks_gt"],
                   s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"],
                   huber_delta=3.0)
    assert float(rmse) < 1e-2        # float32 projection roundtrip


def test_schur_matvec_matches_dense():
    """S x from the matrix-free path == dense U - W V^-1 W^T assembled in numpy."""
    scene = make_scene(np.random.default_rng(1), num_cameras=4,
                       num_landmarks=30, pose_noise=0.01,
                       landmark_noise=0.05)
    s = _to_jnp(scene)
    fixed = _fixed_mask(4)
    damping = 1e-2
    sys = build_system(s["poses_init"], s["intrinsics"], s["landmarks_init"],
                       s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"],
                       3.0, damping, fixed)

    # Dense assembly from the same blocks.
    Jc = np.asarray(sys.Jc)
    Jl = np.asarray(sys.Jl)
    oc = np.asarray(sys.obs_cam)
    ol = np.asarray(sys.obs_lm)
    C, L = 4, 30
    U = np.zeros((6 * C, 6 * C))
    V = np.zeros((3 * L, 3 * L))
    W = np.zeros((6 * C, 3 * L))
    for o in range(oc.shape[0]):
        c, l = oc[o], ol[o]
        U[6*c:6*c+6, 6*c:6*c+6] += Jc[o].T @ Jc[o]
        V[3*l:3*l+3, 3*l:3*l+3] += Jl[o].T @ Jl[o]
        W[6*c:6*c+6, 3*l:3*l+3] += Jc[o].T @ Jl[o]
    # Mirror build_system's relative (Marquardt) damping.
    for c in range(C):
        blk = U[6*c:6*c+6, 6*c:6*c+6]
        d = np.trace(blk) / 6.0
        blk += (damping * (1.0 + d) + 1e-6 * d) * np.eye(6)
    for l in range(L):
        blk = V[3*l:3*l+3, 3*l:3*l+3]
        d = np.trace(blk) / 3.0
        blk += (damping * (1.0 + d) + 1e-6 * d) * np.eye(3)
    S = U - W @ np.linalg.inv(V) @ W.T

    rng = np.random.default_rng(2)
    x = rng.standard_normal((C, 6)).astype(np.float32)
    got = np.asarray(schur_matvec(sys, jnp.asarray(x)))
    want = (S @ x.reshape(-1)).reshape(C, 6)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_pcg_solves_reduced_system():
    scene = make_scene(np.random.default_rng(3), num_cameras=4,
                       num_landmarks=50, pose_noise=0.01,
                       landmark_noise=0.05)
    s = _to_jnp(scene)
    sys = build_system(s["poses_init"], s["intrinsics"], s["landmarks_init"],
                       s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"],
                       3.0, 1e-2, _fixed_mask(4))
    b = schur_rhs(sys)
    x, k = pcg(sys, b, iters=200, tol=1e-6)
    res = np.asarray(schur_matvec(sys, x) - b)
    assert np.linalg.norm(res) < 1e-3 * max(np.linalg.norm(np.asarray(b)), 1.0)


def test_ba_converges_from_noisy_init():
    scene = make_scene(np.random.default_rng(4), num_cameras=6,
                       num_landmarks=150, pixel_noise=0.0,
                       pose_noise=0.02, landmark_noise=0.10)
    scene = pad_observations(scene, 1024)
    s = _to_jnp(scene)
    cfg = BAConfig(max_iterations=25, cg_iterations=60)
    fixed = _fixed_mask(6)

    c0, rmse0 = cost(s["poses_init"], s["intrinsics"], s["landmarks_init"],
                     s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"],
                     cfg.huber_delta)
    st = run_ba(s["poses_init"], s["intrinsics"], s["landmarks_init"],
                s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"],
                cfg, fixed)
    assert float(st.rmse) < 0.05, (float(rmse0), float(st.rmse))
    # Ground-truth recovery (gauge is pinned to GT, so absolute comparison ok).
    np.testing.assert_allclose(np.asarray(st.poses), scene["poses_gt"],
                               atol=2e-3)


def test_ba_robust_to_outliers():
    rng = np.random.default_rng(5)
    scene = make_scene(rng, num_cameras=5, num_landmarks=120,
                       pixel_noise=0.2, pose_noise=0.01,
                       landmark_noise=0.05)
    # Corrupt 10% of observations grossly.
    n = scene["obs_uv"].shape[0]
    bad = rng.choice(n, n // 10, replace=False)
    scene["obs_uv"][bad] += rng.uniform(30, 80, (bad.shape[0], 2)).astype(np.float32)
    scene = pad_observations(scene, 1024)
    s = _to_jnp(scene)
    cfg = BAConfig(max_iterations=30, cg_iterations=60, huber_delta=1.0,
                   loss="cauchy")
    st = run_ba(s["poses_init"], s["intrinsics"], s["landmarks_init"],
                s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"],
                cfg, _fixed_mask(5))
    # Poses still recovered well despite outliers (residual error here is
    # estimation noise from the 0.2 px observation noise, not outlier bias).
    np.testing.assert_allclose(np.asarray(st.poses), scene["poses_gt"],
                               atol=1e-2)


def test_run_ba_map_wrapper():
    """MapState round-trip through the optimizer."""
    from sift_tpu.types import MapState
    from sift_tpu.ba.solver import run_ba_map

    scene = make_scene(np.random.default_rng(9), num_cameras=4,
                       num_landmarks=60, pose_noise=0.01,
                       landmark_noise=0.05)
    scene = pad_observations(scene, 512)
    s = _to_jnp(scene)
    state = MapState(
        poses=s["poses_init"], intrinsics=s["intrinsics"],
        landmarks=s["landmarks_init"], obs_cam=s["obs_cam"],
        obs_lm=s["obs_lm"], obs_uv=s["obs_uv"],
        pose_valid=jnp.ones(4, bool),
        landmark_valid=jnp.ones(60, bool),
        obs_valid=s["obs_valid"])
    new_state, st = run_ba_map(state, BAConfig(max_iterations=10),
                               _fixed_mask(4))
    assert float(st.rmse) < 0.05
    np.testing.assert_allclose(np.asarray(new_state.poses),
                               np.asarray(st.poses))


def test_masked_observations_are_inert():
    """Flipping padding contents must not change the result (static-shape
    masking invariant)."""
    scene = make_scene(np.random.default_rng(6), num_cameras=4,
                       num_landmarks=60, pose_noise=0.01,
                       landmark_noise=0.05)
    scene = pad_observations(scene, 800)
    s = _to_jnp(scene)
    cfg = BAConfig(max_iterations=5, cg_iterations=30)

    st1 = run_ba(s["poses_init"], s["intrinsics"], s["landmarks_init"],
                 s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"],
                 cfg, _fixed_mask(4))
    # Garbage in the padded slots.
    uv2 = np.array(scene["obs_uv"])
    uv2[~scene["obs_valid"]] = 1e5
    st2 = run_ba(s["poses_init"], s["intrinsics"], s["landmarks_init"],
                 s["obs_cam"], s["obs_lm"], jnp.asarray(uv2), s["obs_valid"],
                 cfg, _fixed_mask(4))
    np.testing.assert_allclose(np.asarray(st1.poses), np.asarray(st2.poses),
                               atol=1e-6)


def test_pcg_without_jacobi_preconditioner_still_solves():
    """`BAConfig.jacobi_precond=False` (plain CG ablation) reaches the same
    reduced-system solution, just in more iterations."""
    scene = make_scene(np.random.default_rng(11), num_cameras=4,
                       num_landmarks=40, pose_noise=0.01,
                       landmark_noise=0.05)
    s = _to_jnp(scene)
    sys = build_system(s["poses_init"], s["intrinsics"], s["landmarks_init"],
                       s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"],
                       3.0, 1e-2, _fixed_mask(4))
    b = schur_rhs(sys)
    x_pre, _ = pcg(sys, b, 200, 1e-8, jacobi=True)
    x_cg, _ = pcg(sys, b, 500, 1e-8, jacobi=False)
    np.testing.assert_allclose(np.asarray(x_pre), np.asarray(x_cg),
                               atol=1e-3)


def test_dense_schur_matches_pcg_solution():
    """The one-shot dense Schur solve (window-BA fast path) must reach the
    same reduced-system solution as converged PCG."""
    from sift_tpu.ba.schur import dense_schur_solve
    scene = make_scene(np.random.default_rng(21), num_cameras=5,
                       num_landmarks=48, pose_noise=0.01,
                       landmark_noise=0.05)
    s = _to_jnp(scene)
    sys = build_system(s["poses_init"], s["intrinsics"], s["landmarks_init"],
                       s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"],
                       3.0, 1e-2, _fixed_mask(5))
    b = schur_rhs(sys)
    x_pcg, _ = pcg(sys, b, 300, 1e-8)
    x_dense = dense_schur_solve(sys, b)
    np.testing.assert_allclose(np.asarray(x_dense), np.asarray(x_pcg),
                               atol=2e-3)


def test_run_ba_dense_solver_converges():
    scene = make_scene(np.random.default_rng(22), num_cameras=6,
                       num_landmarks=64, pose_noise=0.05,
                       landmark_noise=0.2)
    s = _to_jnp(scene)
    cfg = BAConfig(max_iterations=15, solver="dense")
    st = run_ba(s["poses_init"], s["intrinsics"], s["landmarks_init"],
                s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"],
                cfg, _fixed_mask(6))
    assert float(st.rmse) < 0.5, float(st.rmse)


def test_gnc_anneal_converges_from_bad_init():
    """r5 regression: plain Huber DIVERGED from everything-is-an-outlier
    inits at map scale (IRLS down-weights the whole problem); the GNC
    schedule (BAConfig.robust_anneal) must converge the robust solve from
    a large-noise init on the corridor scene — asserted on median
    residual and camera-position error (raw RMSE is not meaningful for a
    robust solve)."""
    from sift_tpu.io.synthetic import make_corridor_scene
    from sift_tpu.geometry import lie_np
    from sift_tpu.eval.ate import ate_rmse

    sc = make_corridor_scene(np.random.default_rng(3), num_cameras=24,
                             num_landmarks=1024, obs_per_camera=256,
                             pose_noise=0.02, landmark_noise=0.2)
    n = 24
    s = _to_jnp(sc)
    cfg = BAConfig(max_iterations=10, cg_iterations=40, solver="pcg",
                   loss="huber", huber_delta=3.0)
    st = run_ba(s["poses_init"], s["intrinsics"], s["landmarks_init"],
                s["obs_cam"], s["obs_lm"], s["obs_uv"], s["obs_valid"],
                cfg, _fixed_mask(n))
    from sift_tpu.ba.residuals import reprojection_residuals
    r, _ = reprojection_residuals(st.poses, s["intrinsics"], st.landmarks,
                                  s["obs_cam"], s["obs_lm"], s["obs_uv"])
    rn = np.asarray(jnp.linalg.norm(r, axis=-1))[np.asarray(s["obs_valid"])]
    assert np.median(rn) < 1.0, np.median(rn)
    _, c_est = lie_np.se3_exp(np.asarray(st.poses, np.float64))
    _, c_gt = lie_np.se3_exp(np.asarray(sc["poses_gt"], np.float64))
    pos = ate_rmse(c_est, c_gt, align=True, with_scale=False)
    assert pos < 0.15, pos        # 24 m corridor; init error ~2 m scale


def test_corridor_scene_invariants():
    """Generator sanity: local visibility, >=2 obs per landmark, compact
    landmark ids, observation cap honoured."""
    from sift_tpu.io.synthetic import make_corridor_scene

    sc = make_corridor_scene(np.random.default_rng(1), num_cameras=32,
                             num_landmarks=2048, obs_per_camera=128)
    n_lms = sc["landmarks_init"].shape[0]
    counts = np.bincount(sc["obs_lm"], minlength=n_lms)
    assert counts.min() >= 2                   # untriangulatable rows dropped
    assert sc["obs_lm"].max() == n_lms - 1     # compact id space
    per_cam = np.bincount(sc["obs_cam"], minlength=32)
    assert per_cam.max() <= 128
    assert sc["obs_cam"].shape[0] >= 32 * 32   # scene is not degenerate
