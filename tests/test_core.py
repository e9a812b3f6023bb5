"""Unit tests for core SE(3) + linalg against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bufferx_tpu.core import linalg, se3


def random_pose(rs):
    axis = rs.randn(3)
    axis /= np.linalg.norm(axis)
    angle = rs.uniform(0, np.pi)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    t = rs.randn(3)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


class TestSE3:
    def test_transform_roundtrip(self, rng):
        T = random_pose(rng)
        pts = rng.randn(50, 3).astype(np.float32)
        out = se3.transform(jnp.asarray(pts), jnp.asarray(T, dtype=jnp.float32))
        expect = pts @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_inverse(self, rng):
        T = jnp.asarray(random_pose(rng), dtype=jnp.float32)
        eye = se3.concatenate(T, se3.inverse(T))
        np.testing.assert_allclose(eye, np.eye(4), atol=1e-5)

    def test_integrate_decompose(self, rng):
        T = jnp.asarray(random_pose(rng), dtype=jnp.float32)
        R, t = se3.decompose(T)
        np.testing.assert_allclose(se3.integrate(R, t), T, atol=1e-6)

    def test_batched_integrate(self, rng):
        Ts = np.stack([random_pose(rng) for _ in range(4)]).astype(np.float32)
        R, t = se3.decompose(jnp.asarray(Ts))
        np.testing.assert_allclose(se3.integrate(R, t), Ts, atol=1e-6)

    def test_rte_rre(self, rng):
        T_gt = random_pose(rng)
        T_est = random_pose(rng)
        rte = se3.compute_rte(jnp.asarray(T_est), jnp.asarray(T_gt))
        rre = se3.compute_rre(jnp.asarray(T_est), jnp.asarray(T_gt))
        np.testing.assert_allclose(
            rte, np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]), rtol=1e-5
        )
        cos = (np.trace(T_est[:3, :3].T @ T_gt[:3, :3]) - 1) / 2
        expect = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        np.testing.assert_allclose(rre, expect, rtol=1e-4)

    def test_rre_identical_pose_is_zero_like(self, rng):
        T = jnp.asarray(random_pose(rng), dtype=jnp.float64)
        assert float(se3.compute_rre(T, T)) < 0.05

    def test_axis_angle(self, rng):
        v = rng.randn(8, 3).astype(np.float32)
        R = se3.axis_angle_to_rotation(jnp.asarray(v))
        # orthonormal, det +1
        RtR = np.einsum("bij,bik->bjk", np.asarray(R), np.asarray(R))
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
        # rotation about z by theta matches rotation_z
        th = 0.7
        Rz = se3.axis_angle_to_rotation(jnp.asarray([0.0, 0.0, th]))
        np.testing.assert_allclose(Rz, se3.rotation_z(jnp.asarray(th)), atol=1e-6)

    def test_random_rotation_proper(self):
        for num_axis in (0, 1, 3):
            R = se3.random_rotation(jax.random.PRNGKey(0), num_axis)
            np.testing.assert_allclose(
                np.asarray(R) @ np.asarray(R).T, np.eye(3), atol=1e-5
            )
            np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


class TestEigh3x3:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_numpy(self, seed):
        rs = np.random.RandomState(seed)
        X = rs.randn(64, 5, 3).astype(np.float32)
        A = np.einsum("bni,bnj->bij", X, X)
        vals, vecs = linalg.eigh3x3(jnp.asarray(A))
        vals_np, _ = np.linalg.eigh(A)
        np.testing.assert_allclose(vals, vals_np, atol=1e-3 * np.abs(vals_np).max())
        # eigen-equation residual
        for i in range(3):
            res = np.einsum("bij,bj->bi", A, np.asarray(vecs)[..., i]) - np.asarray(
                vals
            )[..., i : i + 1] * np.asarray(vecs)[..., i]
            assert np.abs(res).max() < 1e-2 * max(1.0, np.abs(vals_np).max())

    def test_diagonal(self):
        A = jnp.asarray(np.diag([3.0, 1.0, 2.0])[None], dtype=jnp.float32)
        vals, vecs = linalg.eigh3x3(A)
        np.testing.assert_allclose(vals[0], [1.0, 2.0, 3.0], atol=1e-6)
        np.testing.assert_allclose(np.abs(np.asarray(vecs)[0, :, 0]), [0, 1, 0], atol=1e-6)

    def test_smallest_eigvec_plane_normal(self, rng):
        # points on the z=0 plane: smallest eigenvector of covariance == ±z
        pts = rng.randn(200, 3).astype(np.float32)
        pts[:, 2] = 0.01 * pts[:, 2]
        cov = (pts.T @ pts)[None]
        v = np.asarray(linalg.smallest_eigvec_3x3(jnp.asarray(cov)))[0]
        assert abs(abs(v[2]) - 1.0) < 1e-3


class TestKabsch:
    def test_exact_recovery(self, rng):
        T = random_pose(rng)
        A = rng.randn(100, 3).astype(np.float32)
        B = A @ T[:3, :3].T + T[:3, 3]
        R, t = linalg.kabsch(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(R, T[:3, :3], atol=1e-4)
        np.testing.assert_allclose(t, T[:3, 3], atol=1e-4)

    def test_weighted_ignores_outliers(self, rng):
        T = random_pose(rng)
        A = rng.randn(100, 3).astype(np.float32)
        B = A @ T[:3, :3].T + T[:3, 3]
        B[50:] += rng.randn(50, 3) * 10  # corrupt half
        w = np.concatenate([np.ones(50), np.zeros(50)]).astype(np.float32)
        R, t = linalg.kabsch(jnp.asarray(A), jnp.asarray(B), jnp.asarray(w))
        np.testing.assert_allclose(R, T[:3, :3], atol=1e-4)
        np.testing.assert_allclose(t, T[:3, 3], atol=1e-4)

    def test_batched_and_proper(self, rng):
        Ts = [random_pose(rng) for _ in range(8)]
        A = rng.randn(8, 30, 3).astype(np.float32)
        B = np.stack([A[i] @ Ts[i][:3, :3].T + Ts[i][:3, 3] for i in range(8)])
        R, t = linalg.kabsch(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)
        for i in range(8):
            np.testing.assert_allclose(np.asarray(R)[i], Ts[i][:3, :3], atol=1e-3)

    def test_minimal_three_point(self, rng):
        # RANSAC hypothesis shape: 3-point minimal sets
        T = random_pose(rng)
        A = rng.randn(3, 3).astype(np.float32)
        B = A @ T[:3, :3].T + T[:3, 3]
        R, t = linalg.kabsch(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(R, T[:3, :3], atol=1e-3)

    def test_degenerate_noise_still_proper(self, rng):
        # collinear points: R must still be a proper rotation
        A = np.stack([np.linspace(0, 1, 10)] * 3, axis=-1).astype(np.float32)
        B = A + rng.randn(10, 3).astype(np.float32) * 1e-3
        R, _ = linalg.kabsch(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-3)


class TestRodrigues:
    def test_maps_a_to_z(self, rng):
        a = rng.randn(32, 3).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        z = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (32, 1))
        R = linalg.rodrigues_a_to_b(jnp.asarray(a), jnp.asarray(z))
        # row-vector convention: a @ R == z
        out = np.einsum("bi,bij->bj", a, np.asarray(R))
        np.testing.assert_allclose(out, z, atol=1e-5)

    def test_antiparallel(self):
        a = jnp.asarray([[0.0, 0.0, -1.0]])
        b = jnp.asarray([[0.0, 0.0, 1.0]])
        R = linalg.rodrigues_a_to_b(a, b)
        out = np.asarray(a) @ np.asarray(R)[0]
        np.testing.assert_allclose(out[0], [0, 0, 1.0], atol=1e-5)
