"""Solver tests: synthetic correspondence problems with known SE(3) poses."""

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.core import se3
from bufferx_tpu.solver import (
    cross_scale_consensus,
    gnc_tls_solve,
    post_refinement,
    ransac_pose,
    so2_pose_candidates,
)


def make_problem(rng, n=400, outlier_frac=0.5, noise=0.005, scale=2.0):
    """Correspondences with known pose; outliers scattered uniformly."""
    T = np.asarray(
        se3.integrate(
            se3.random_rotation(jax.random.PRNGKey(rng.randint(1 << 30)), 3),
            jnp.asarray(rng.randn(3).astype(np.float32)),
        )
    )
    src = (rng.randn(n, 3) * scale).astype(np.float32)
    tgt = src @ T[:3, :3].T + T[:3, 3] + rng.randn(n, 3).astype(np.float32) * noise
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    tgt[out_idx] = (rng.randn(n_out, 3) * scale * 2).astype(np.float32)
    inlier_gt = np.ones(n, bool)
    inlier_gt[out_idx] = False
    return T, src, tgt, inlier_gt


class TestSO2Candidates:
    def test_planar_case_recovers_rotation(self, rng):
        # both LRFs identity (global-z case), pose = pure z-rotation
        azi_n = 20
        bin_idx = 4
        theta = 2 * np.pi * bin_idx / azi_n
        Rz = np.asarray(se3.rotation_z(jnp.asarray(theta)))
        src = rng.randn(16, 3).astype(np.float32)
        t_gt = np.array([1.0, -2.0, 0.5], np.float32)
        tgt = src @ Rz.T + t_gt
        eye = np.tile(np.eye(3, dtype=np.float32), (16, 1, 1))
        R, t = so2_pose_candidates(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(eye),
            jnp.asarray(eye), jnp.full((16,), float(bin_idx)), azi_n,
        )
        np.testing.assert_allclose(np.asarray(R)[0], Rz, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.tile(t_gt, (16, 1)), atol=1e-3)


class TestConsensus:
    def test_finds_true_inlier_set(self, rng):
        T, src, tgt, inlier_gt = make_problem(rng, n=300, outlier_frac=0.6)
        n = len(src)
        # candidate poses: from each correspondence pretend R=T_R, t from pair
        R_cand = np.tile(T[:3, :3], (n, 1, 1)).astype(np.float32)
        t_cand = (tgt - src @ T[:3, :3].T).astype(np.float32)
        mask, best, count = cross_scale_consensus(
            jnp.asarray(R_cand), jnp.asarray(t_cand),
            jnp.asarray(src), jnp.asarray(tgt), jnp.ones(n, bool),
            azi_n=20, inlier_th=1.0 / 3.0,
        )
        mask = np.asarray(mask)
        # best candidate must be an inlier correspondence and recover most
        # of the true inlier set
        assert inlier_gt[int(best)]
        recall = mask[inlier_gt].mean()
        precision = inlier_gt[mask].mean() if mask.any() else 0.0
        assert recall > 0.8 and precision > 0.9

    def test_invalid_candidates_never_win(self, rng):
        T, src, tgt, inlier_gt = make_problem(rng, n=100, outlier_frac=0.3)
        n = len(src)
        R_cand = np.tile(T[:3, :3], (n, 1, 1)).astype(np.float32)
        t_cand = (tgt - src @ T[:3, :3].T).astype(np.float32)
        valid = np.zeros(n, bool)
        valid[~inlier_gt] = True  # only outlier candidates allowed
        _, best, _ = cross_scale_consensus(
            jnp.asarray(R_cand), jnp.asarray(t_cand),
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid),
            azi_n=20, inlier_th=1.0 / 3.0,
        )
        assert not inlier_gt[int(best)]


class TestRansac:
    def test_recovers_pose_half_outliers(self, rng):
        T, src, tgt, inlier_gt = make_problem(rng, n=400, outlier_frac=0.5)
        res = ransac_pose(
            jnp.asarray(src), jnp.asarray(tgt),
            jnp.ones(400, bool), jnp.ones(400, bool),
            jax.random.PRNGKey(0), dist_th=0.10,
            num_hypotheses=2048, chunk=512,
        )
        rte = float(se3.compute_rte(res.pose, jnp.asarray(T)))
        rre = float(se3.compute_rre(res.pose, jnp.asarray(T)))
        assert rte < 0.05 and rre < 1.0, (rte, rre)
        assert int(res.num_inliers) >= 0.9 * inlier_gt.sum()

    def test_pool_restriction_speeds_success(self, rng):
        # 90% outliers, but pool = known inliers: must still succeed
        T, src, tgt, inlier_gt = make_problem(rng, n=500, outlier_frac=0.9)
        res = ransac_pose(
            jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(inlier_gt), jnp.ones(500, bool),
            jax.random.PRNGKey(1), dist_th=0.10,
            num_hypotheses=512, chunk=256,
        )
        assert float(se3.compute_rte(res.pose, jnp.asarray(T))) < 0.05

    def test_empty_pool_no_nan(self, rng):
        T, src, tgt, _ = make_problem(rng, n=50, outlier_frac=0.0)
        res = ransac_pose(
            jnp.asarray(src), jnp.asarray(tgt),
            jnp.zeros(50, bool), jnp.ones(50, bool),
            jax.random.PRNGKey(2), dist_th=0.10,
            num_hypotheses=256, chunk=128,
        )
        assert np.isfinite(np.asarray(res.pose)).all()


class TestIRLS:
    def test_refines_coarse_pose(self, rng):
        T, src, tgt, inlier_gt = make_problem(
            rng, n=300, outlier_frac=0.3, noise=0.002
        )
        # perturb ground truth as a coarse initialization
        dR = np.asarray(se3.rotation_z(jnp.asarray(0.05)))
        T0 = T.copy()
        T0[:3, :3] = dR @ T0[:3, :3]
        T0[:3, 3] += 0.05
        refined = post_refinement(
            jnp.asarray(T0.astype(np.float32)), jnp.asarray(src),
            jnp.asarray(tgt), jnp.ones(300, bool), dist_th=0.10,
        )
        assert float(se3.compute_rte(refined, jnp.asarray(T))) < float(
            se3.compute_rte(jnp.asarray(T0), jnp.asarray(T))
        )
        assert float(se3.compute_rte(refined, jnp.asarray(T))) < 0.01
        assert float(se3.compute_rre(refined, jnp.asarray(T))) < 0.5


class TestGNC:
    def test_recovers_pose_under_outliers(self, rng):
        T, src, tgt, inlier_gt = make_problem(
            rng, n=300, outlier_frac=0.6, noise=0.002
        )
        res = gnc_tls_solve(
            jnp.asarray(src), jnp.asarray(tgt), jnp.ones(300, bool),
            noise_bound=0.05,
        )
        rte = float(se3.compute_rte(res.pose, jnp.asarray(T)))
        rre = float(se3.compute_rre(res.pose, jnp.asarray(T)))
        assert rte < 0.05 and rre < 1.0, (rte, rre)
        w = np.asarray(res.weights) > 0.5
        assert w[inlier_gt].mean() > 0.9
        assert inlier_gt[w].mean() > 0.9

    def test_all_inliers_exact(self, rng):
        T, src, tgt, _ = make_problem(rng, n=100, outlier_frac=0.0, noise=0.0)
        res = gnc_tls_solve(
            jnp.asarray(src), jnp.asarray(tgt), jnp.ones(100, bool),
            noise_bound=0.05,
        )
        assert float(se3.compute_rte(res.pose, jnp.asarray(T))) < 1e-3
