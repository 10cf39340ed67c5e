"""Sim(3) group ops + scale-drift-correcting pose graph (monocular loop
closure, Strasdat RSS 2010 treatment)."""

import numpy as np
import jax
import jax.numpy as jnp

from sift_tpu.geometry import lie, sim3
from sift_tpu.slam.pose_graph import (Sim3Graph, optimize_pose_graph_sim3,
                                      sim3_edge_residual)


def _rand_xi(rng, n=32, scale=0.5, sig=0.3):
    xi = (rng.standard_normal((n, 7)) * scale).astype(np.float32)
    xi[:, 6] = (rng.standard_normal(n) * sig).astype(np.float32)
    return xi


class TestSim3Ops:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        for scale in (1e-5, 0.1, 1.0):
            xi = _rand_xi(rng, scale=scale)
            s, R, t = sim3.sim3_exp(jnp.asarray(xi))
            back = np.asarray(sim3.sim3_log(s, R, t))
            np.testing.assert_allclose(back, xi, atol=2e-4)

    def test_reduces_to_se3_at_zero_sigma(self):
        rng = np.random.default_rng(1)
        xi6 = (rng.standard_normal((16, 6)) * 0.7).astype(np.float32)
        s, R, t = sim3.sim3_exp(sim3.from_se3(jnp.asarray(xi6)))
        R_se, t_se = lie.se3_exp(jnp.asarray(xi6))
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_se), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_se), atol=1e-5)

    def test_compose_inverse_identity(self):
        rng = np.random.default_rng(2)
        xi = _rand_xi(rng, n=8)
        S = sim3.sim3_exp(jnp.asarray(xi))
        I = sim3.sim3_compose(*sim3.sim3_inverse(*S), *S)
        np.testing.assert_allclose(np.asarray(I[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(I[1]), np.tile(np.eye(3, dtype=np.float32), (8, 1, 1)),
            atol=1e-5)
        np.testing.assert_allclose(np.asarray(I[2]), 0.0, atol=1e-4)

    def test_transform_scales_points(self):
        xi = jnp.asarray([0, 0, 0, 0, 0, 0, np.log(2.0)], jnp.float32)
        s, R, t = sim3.sim3_exp(xi)
        x = jnp.asarray([1.0, -2.0, 3.0])
        y = sim3.sim3_transform(s, R, t, x)
        np.testing.assert_allclose(np.asarray(y), [2.0, -4.0, 6.0],
                                   atol=1e-5)

    def test_umeyama_recovers_similarity(self):
        rng = np.random.default_rng(3)
        src = rng.standard_normal((50, 3)).astype(np.float32)
        from scipy.spatial.transform import Rotation
        R_gt = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix().astype(
            np.float32)
        s_gt, t_gt = 1.7, np.array([0.5, -1.0, 2.0], np.float32)
        dst = s_gt * src @ R_gt.T + t_gt
        w = np.ones(50, np.float32)
        s, R, t = sim3.umeyama_alignment(jnp.asarray(src), jnp.asarray(dst),
                                         jnp.asarray(w))
        np.testing.assert_allclose(float(s), s_gt, atol=1e-4)
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-3)
        # weighted: corrupt half the points with weight 0
        dst2 = np.array(dst)
        dst2[:25] += 100.0
        w2 = np.ones(50, np.float32)
        w2[:25] = 0.0
        s, R, t = sim3.umeyama_alignment(jnp.asarray(src), jnp.asarray(dst2),
                                         jnp.asarray(w2))
        np.testing.assert_allclose(float(s), s_gt, atol=1e-3)


class TestSim3PoseGraph:
    def test_scale_drift_loop_correction(self):
        """A circular trajectory whose odometry accumulates scale drift:
        each measured odometry edge is the true relative pose but the
        integrated estimate grows scale error; the single loop edge
        carries the true (drift-free) relative similarity. Sim(3) PGO must
        pull every node's scale back toward truth — the SE(3) graph cannot
        (it has no scale variable at all)."""
        n = 12
        rng = np.random.default_rng(4)

        # Ground truth: nodes around a circle, sigma = 0 everywhere.
        xs_gt = []
        for k in range(n):
            ang = 2 * np.pi * k / n
            xi = np.zeros(7, np.float32)
            xi[:3] = [0, 0, ang]                 # yaw
            xi[3:6] = [np.cos(ang) * 3, np.sin(ang) * 3, 0]
            xs_gt.append(xi)
        xs_gt = np.stack(xs_gt)

        def rel(a, b):
            Sa = sim3.sim3_exp(jnp.asarray(a))
            Sb = sim3.sim3_exp(jnp.asarray(b))
            return np.asarray(sim3.sim3_log(
                *sim3.sim3_compose(*sim3.sim3_inverse(*Sa), *Sb)))

        # Drifted initialization: integrate odometry with a per-step scale
        # error (sigma drift) + pose noise.
        drift = 0.04
        xs_init = [xs_gt[0]]
        for k in range(1, n):
            z = rel(xs_gt[k - 1], xs_gt[k])
            z_noisy = z + np.concatenate(
                [rng.standard_normal(6) * 0.01, [drift]]).astype(np.float32)
            Sprev = sim3.sim3_exp(jnp.asarray(xs_init[-1]))
            Sstep = sim3.sim3_exp(jnp.asarray(z_noisy))
            xs_init.append(np.asarray(sim3.sim3_log(
                *sim3.sim3_compose(*Sprev, *Sstep))))
        xs_init = np.stack(xs_init)
        assert abs(xs_init[-1][6]) > 0.3        # drift really accumulated

        # Edges: odometry (true relative sims, sigma 0) + loop n-1 -> 0.
        E = n
        ei = np.arange(n - 1, dtype=np.int32)
        ej = np.arange(1, n, dtype=np.int32)
        ez = np.stack([rel(xs_gt[k], xs_gt[k + 1]) for k in range(n - 1)])
        ei = np.concatenate([ei, [n - 1]]).astype(np.int32)
        ej = np.concatenate([ej, [0]]).astype(np.int32)
        ez = np.concatenate([ez, rel(xs_gt[n - 1], xs_gt[0])[None]])
        ew = np.ones(E, np.float32)
        ew[-1] = 10.0                            # loop edge weight
        fixed = np.zeros(n, bool)
        fixed[0] = True

        g = Sim3Graph(poses=jnp.asarray(xs_init), edge_i=jnp.asarray(ei),
                      edge_j=jnp.asarray(ej), edge_z=jnp.asarray(ez),
                      edge_w=jnp.asarray(ew), fixed=jnp.asarray(fixed))
        out = jax.jit(lambda gg: optimize_pose_graph_sim3(gg, iterations=30))(g)
        poses = np.asarray(out.poses)

        # Scales recovered (sigma ~ 0 everywhere), residuals tiny.
        assert np.abs(poses[:, 6]).max() < 0.02, poses[:, 6]
        r = np.asarray(jax.vmap(sim3_edge_residual)(
            out.poses[jnp.asarray(ei)], out.poses[jnp.asarray(ej)],
            jnp.asarray(ez)))
        assert float(np.abs(r).max()) < 0.05

    def test_inert_padding_edges(self):
        rng = np.random.default_rng(5)
        n = 4
        xs = _rand_xi(rng, n=n, scale=0.2, sig=0.1)
        ei = np.array([0, 1, 2, 0, 0], np.int32)
        ej = np.array([1, 2, 3, 0, 0], np.int32)
        ez = np.zeros((5, 7), np.float32)
        for k in range(3):
            Sa = sim3.sim3_exp(jnp.asarray(xs[ei[k]]))
            Sb = sim3.sim3_exp(jnp.asarray(xs[ej[k]]))
            ez[k] = np.asarray(sim3.sim3_log(
                *sim3.sim3_compose(*sim3.sim3_inverse(*Sa), *Sb)))
        ew = np.array([1, 1, 1, 0, 0], np.float32)
        fixed = np.zeros(n, bool)
        fixed[0] = True

        g1 = Sim3Graph(poses=jnp.asarray(xs), edge_i=jnp.asarray(ei),
                       edge_j=jnp.asarray(ej), edge_z=jnp.asarray(ez),
                       edge_w=jnp.asarray(ew), fixed=jnp.asarray(fixed))
        ez2 = np.array(ez)
        ez2[3:] = 17.0                            # garbage in padding
        g2 = g1.replace(edge_z=jnp.asarray(ez2))
        o1 = optimize_pose_graph_sim3(g1, iterations=5)
        o2 = optimize_pose_graph_sim3(g2, iterations=5)
        np.testing.assert_allclose(np.asarray(o1.poses),
                                   np.asarray(o2.poses), atol=1e-6)
