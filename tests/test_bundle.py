"""Bundle adjustment (poses + landmarks, Schur complement) and robust
kernels: analytic-Jacobian checks, convergence on synthetic scenes,
outlier rejection, and mesh-sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.core import se3
from bufferx_tpu.parallel.bundle import (
    LandmarkGraph,
    _obs_blocks,
    bundle_adjust,
    robust_weight,
)
from bufferx_tpu.parallel.posegraph import PoseGraph, pose_graph_gauss_newton


def make_scene(rs, k=4, n_lms=40, noise=0.0):
    """k poses on a small arc observing n_lms world landmarks."""
    lms = rs.uniform(-2, 2, (n_lms, 3)).astype(np.float32)
    poses = [np.eye(4, dtype=np.float32)]
    for _ in range(k - 1):
        d = np.eye(4, dtype=np.float32)
        ang = rs.uniform(-0.2, 0.2)
        c, s = np.cos(ang), np.sin(ang)
        d[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        d[:3, 3] = rs.uniform(-0.3, 0.3, 3)
        poses.append(poses[-1] @ d)
    poses = np.stack(poses)
    of, ol, oz = [], [], []
    for i, T in enumerate(poses):
        Rinv, tinv = T[:3, :3].T, -T[:3, :3].T @ T[:3, 3]
        for j in range(n_lms):
            of.append(i)
            ol.append(j)
            z = Rinv @ lms[j] + tinv
            oz.append(z + rs.randn(3) * noise)
    obs = LandmarkGraph(
        obs_frame=jnp.asarray(of, jnp.int32),
        obs_lm=jnp.asarray(ol, jnp.int32),
        obs_local=jnp.asarray(np.asarray(oz, np.float32)),
        weights=jnp.ones(len(of), jnp.float32),
    )
    return jnp.asarray(poses), jnp.asarray(lms), obs


def perturb(poses, lms, rs, rot=0.05, tr=0.1, lm=0.1):
    out = np.asarray(poses).copy()
    for i in range(1, len(out)):
        ang = rs.uniform(-rot, rot)
        c, s = np.cos(ang), np.sin(ang)
        Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        out[i, :3, :3] = Rz @ out[i, :3, :3]
        out[i, :3, 3] += rs.uniform(-tr, tr, 3)
    lms_p = np.asarray(lms) + rs.uniform(-lm, lm, np.asarray(lms).shape)
    return jnp.asarray(out), jnp.asarray(lms_p.astype(np.float32))


class TestJacobians:
    def test_analytic_matches_finite_difference(self):
        rs = np.random.RandomState(0)
        poses, lms, obs = make_scene(rs, k=2, n_lms=3)
        r, Jp, Jl, _w = _obs_blocks(poses, lms, obs, "none", 1.0)
        eps = 1e-4

        # landmark jacobian
        for d in range(3):
            lms2 = lms.at[:, d].add(eps)
            r2, *_ = _obs_blocks(poses, lms2, obs, "none", 1.0)
            fd = (r2 - r) / eps
            np.testing.assert_allclose(
                np.asarray(fd), np.asarray(Jl[:, :, d]), atol=1e-2
            )

        # pose jacobian via left perturbation of pose 1
        from bufferx_tpu.parallel.posegraph import _apply_increment

        for d in range(6):
            delta = jnp.zeros((2, 6)).at[1, d].add(eps)
            poses2 = _apply_increment(poses, delta)
            r2, *_ = _obs_blocks(poses2, lms, obs, "none", 1.0)
            fd = (r2 - r) / eps
            mask = np.asarray(obs.obs_frame) == 1
            np.testing.assert_allclose(
                np.asarray(fd)[mask], np.asarray(Jp)[mask, :, d], atol=1e-2
            )


class TestBundleAdjust:
    def test_converges_to_ground_truth(self):
        rs = np.random.RandomState(1)
        poses_gt, lms_gt, obs = make_scene(rs, k=4, n_lms=40, noise=0.0)
        poses0, lms0 = perturb(poses_gt, lms_gt, rs)
        poses, lms = bundle_adjust(
            poses0, lms0, obs, num_poses=4, num_lms=40, num_iters=8
        )
        for i in range(4):
            assert float(se3.compute_rte(poses[i], poses_gt[i])) < 1e-3
            assert float(se3.compute_rre(poses[i], poses_gt[i])) < 0.05
        np.testing.assert_allclose(np.asarray(lms), np.asarray(lms_gt),
                                   atol=1e-3)

    def test_with_pose_graph_factors(self):
        rs = np.random.RandomState(2)
        poses_gt, lms_gt, obs = make_scene(rs, k=3, n_lms=25, noise=0.002)
        rel = [
            np.linalg.inv(np.asarray(poses_gt[i]))
            @ np.asarray(poses_gt[i + 1])
            for i in range(2)
        ]
        pg = PoseGraph(
            edges_i=jnp.asarray([0, 1], jnp.int32),
            edges_j=jnp.asarray([1, 2], jnp.int32),
            t_meas=jnp.asarray(np.stack(rel), jnp.float32),
            weights=jnp.ones(2, jnp.float32),
        )
        poses0, lms0 = perturb(poses_gt, lms_gt, rs)
        poses, _lms = bundle_adjust(
            poses0, lms0, obs, num_poses=3, num_lms=25,
            pose_graph=pg, num_iters=8,
        )
        for i in range(3):
            assert float(se3.compute_rte(poses[i], poses_gt[i])) < 0.01

    def test_robust_kernel_rejects_outlier_observations(self):
        rs = np.random.RandomState(3)
        poses_gt, lms_gt, obs = make_scene(rs, k=3, n_lms=30, noise=0.001)
        # corrupt 10% of observations grossly
        oz = np.asarray(obs.obs_local).copy()
        bad = rs.choice(len(oz), len(oz) // 10, replace=False)
        oz[bad] += rs.uniform(1.0, 2.0, (len(bad), 3))
        obs_bad = obs._replace(obs_local=jnp.asarray(oz))
        poses0, lms0 = perturb(poses_gt, lms_gt, rs)

        p_plain, _ = bundle_adjust(
            poses0, lms0, obs_bad, num_poses=3, num_lms=30, num_iters=8
        )
        p_gm, _ = bundle_adjust(
            poses0, lms0, obs_bad, num_poses=3, num_lms=30, num_iters=8,
            robust="gm", robust_scale=0.05,
        )
        err_plain = sum(
            float(se3.compute_rte(p_plain[i], poses_gt[i])) for i in range(3)
        )
        err_gm = sum(
            float(se3.compute_rte(p_gm[i], poses_gt[i])) for i in range(3)
        )
        assert err_gm < err_plain * 0.2
        assert err_gm < 0.01

    def test_mesh_sharded_matches_single_device(self):
        rs = np.random.RandomState(4)
        poses_gt, lms_gt, obs = make_scene(rs, k=4, n_lms=32)
        poses0, lms0 = perturb(poses_gt, lms_gt, rs)
        from bufferx_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, "fp")
        # observation count (4*32=128) is a multiple of 8 already
        p1, l1 = bundle_adjust(
            poses0, lms0, obs, num_poses=4, num_lms=32, num_iters=5
        )
        p2, l2 = bundle_adjust(
            poses0, lms0, obs, num_poses=4, num_lms=32, num_iters=5,
            mesh=mesh, axis="fp",
        )
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)


class TestRobustPoseGraph:
    def test_huber_downweights_bad_loop_closure(self):
        rs = np.random.RandomState(5)
        poses_gt, _, _ = make_scene(rs, k=5, n_lms=3)
        edges = [(i, i + 1) for i in range(4)] + [(0, 4)]
        meas = [
            np.linalg.inv(np.asarray(poses_gt[i]))
            @ np.asarray(poses_gt[j])
            for i, j in edges
        ]
        # corrupt the loop closure
        meas[-1][:3, 3] += np.array([1.5, -1.0, 0.5], np.float32)
        g = PoseGraph(
            edges_i=jnp.asarray([e[0] for e in edges], jnp.int32),
            edges_j=jnp.asarray([e[1] for e in edges], jnp.int32),
            t_meas=jnp.asarray(np.stack(meas), jnp.float32),
            weights=jnp.ones(len(edges), jnp.float32),
        )
        init = jnp.asarray(
            np.stack([np.eye(4, dtype=np.float32)] * 5)
        )
        p_plain = pose_graph_gauss_newton(g, init, num_poses=5, num_iters=10)
        p_rob = pose_graph_gauss_newton(
            g, init, num_poses=5, num_iters=15, robust="huber",
            robust_scale=0.02,
        )
        err_plain = sum(
            float(se3.compute_rte(p_plain[i], poses_gt[i])) for i in range(5)
        )
        err_rob = sum(
            float(se3.compute_rte(p_rob[i], poses_gt[i])) for i in range(5)
        )
        assert err_rob < err_plain * 0.5
        assert err_rob < 0.05


class TestRobustWeight:
    def test_shapes_and_limits(self):
        r = jnp.asarray([0.0, 0.5, 10.0])
        np.testing.assert_allclose(robust_weight(r, "none", 1.0), 1.0)
        h = np.asarray(robust_weight(r, "huber", 1.0))
        assert h[0] == 1.0 and h[1] == 1.0 and h[2] == 0.1
        g = np.asarray(robust_weight(r, "gm", 1.0))
        assert g[0] == 1.0 and g[2] < 1e-3
