"""Geometry-layer tests: grid construction, SPT invariance, LRF, sphericity."""

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.core.se3 import rotation_z
from bufferx_tpu.geometry import cylindrical, lrf, patches, sphericity


class TestGrid:
    def test_cell_centers_shape_and_radii(self):
        g = cylindrical.grid_cell_centers(3, 7, 20)
        assert g.shape == (3 * 7 * 20, 3)
        r = np.linalg.norm(g.reshape(3, 7 * 20, 3), axis=-1)
        # shells at (i + 0.5) / 3 of unit radius
        np.testing.assert_allclose(r[0], 1 / 6, atol=1e-6)
        np.testing.assert_allclose(r[1], 3 / 6, atol=1e-6)
        np.testing.assert_allclose(r[2], 5 / 6, atol=1e-6)

    def test_azimuth_rings(self):
        g = cylindrical.grid_cell_centers(1, 1, 8).reshape(1, 1, 8, 3)
        az = np.arctan2(g[0, 0, :, 1], g[0, 0, :, 0])
        diffs = np.diff(np.unwrap(az))
        np.testing.assert_allclose(diffs, 2 * np.pi / 8, atol=1e-6)


class TestVarToInvar:
    def test_rotation_equivariance_collapses(self):
        # A point placed at each azimuth bin's own angle maps to the same
        # canonical coordinates after derotation.
        rad_n, ele_n, azi_n, ns = 1, 1, 12, 1
        pts = np.zeros((1, azi_n, ns, 3), np.float32)
        for i in range(azi_n):
            a = 2 * np.pi / azi_n * i
            pts[0, i, 0] = [np.cos(a), np.sin(a), 0.3]
        out = cylindrical.var_to_invar(jnp.asarray(pts), rad_n, ele_n, azi_n)
        out = np.asarray(out).reshape(azi_n, 3)
        for i in range(1, azi_n):
            np.testing.assert_allclose(out[i], out[0], atol=1e-5)

    def test_bin_zero_unchanged(self, rng):
        pts = rng.randn(2, 3 * 7 * 20, 10, 3).astype(np.float32)
        out = np.asarray(cylindrical.var_to_invar(jnp.asarray(pts), 3, 7, 20))
        s = pts.reshape(2, 3, 7, 20, 10, 3)
        o = out.reshape(2, 3, 7, 20, 10, 3)
        np.testing.assert_allclose(o[:, :, :, 0], s[:, :, :, 0], atol=1e-6)


class TestSPT:
    def test_output_shape_and_radius(self, rng):
        K, P = 8, 128
        patch = (rng.randn(K, P, 3) * 0.4).astype(np.float32)
        mask = np.ones((K, P), bool)
        out = cylindrical.spatial_point_transformer(
            jnp.asarray(patch), jnp.asarray(mask),
            rad_n=3, ele_n=7, azi_n=20, delta=0.8, nsample=10, chunk=4,
        )
        assert out.shape == (K, 3 * 7 * 20, 10, 3)
        # every selected point is within delta/rad_n of its (derotated) cell
        cells = cylindrical.grid_cell_centers(3, 7, 20)
        cells_inv = np.asarray(
            cylindrical.var_to_invar(
                jnp.asarray(cells[None, :, None, :]), 3, 7, 20
            )
        )[0, :, 0]
        d = np.linalg.norm(np.asarray(out) - cells_inv[None, :, None, :], axis=-1)
        nonzero = np.abs(np.asarray(out)).sum(-1) > 0
        assert np.all(d[nonzero] <= 0.8 / 3 + 1e-4)

    def test_so2_equivariance(self, rng):
        # rotating a patch about z shifts the azimuth assignment but the
        # derotated (invariant) content is preserved up to bin quantization:
        # check the multiset of per-(rad, ele)-ring point counts is stable.
        K, P = 1, 256
        patch = (rng.randn(K, P, 3) * 0.4).astype(np.float32)
        mask = np.ones((K, P), bool)
        azi_n = 20
        shift = 3
        Rz = np.asarray(rotation_z(jnp.asarray(2 * np.pi * shift / azi_n)))
        patch_rot = patch @ Rz.T

        def counts(p):
            out = cylindrical.spatial_point_transformer(
                jnp.asarray(p), jnp.asarray(mask),
                rad_n=3, ele_n=7, azi_n=azi_n, delta=0.8, nsample=10, chunk=1,
            )
            occ = (np.abs(np.asarray(out)).sum(-1) > 0).sum(-1)  # [K, G]
            return occ.reshape(3, 7, azi_n)

        c0 = counts(patch)
        c1 = counts(patch_rot)
        # rotated patch occupancy = original rolled along azimuth
        np.testing.assert_array_equal(c1, np.roll(c0, shift, axis=-1))


class TestLRF:
    def test_planar_patch_normal(self, rng):
        # points on a tilted plane: z-axis must be the plane normal
        n = np.array([1.0, 2.0, 2.0]) / 3.0
        basis = np.linalg.svd(np.eye(3) - np.outer(n, n))[0][:, :2]
        uv = rng.randn(200, 2).astype(np.float32)
        delta = (uv @ basis.T).astype(np.float32)[None]  # [1, 200, 3]
        kpt = (n * 5.0).astype(np.float32)[None]          # origin->kpt along n
        z = np.asarray(lrf.compute_z_axis(jnp.asarray(delta), jnp.asarray(kpt)))[0]
        assert abs(abs(np.dot(z, n)) - 1.0) < 1e-3
        # disambiguation: z points towards the origin side
        assert np.dot(-z, kpt[0]) >= 0

    def test_align_rotates_normal_to_z(self, rng):
        n = np.array([0.6, 0.0, 0.8], np.float32)
        basis = np.linalg.svd(np.eye(3) - np.outer(n, n))[0][:, :2].astype(np.float32)
        delta = (rng.randn(100, 2).astype(np.float32) @ basis.T)[None]
        kpt = (-n * 2.0)[None]
        out, rand_axis, R = lrf.align_patches(
            jnp.asarray(delta), jnp.asarray(kpt), jnp.asarray(False)
        )
        # aligned patch lies in the xy-plane
        assert np.abs(np.asarray(out)[0, :, 2]).max() < 1e-3
        # rand_axis is horizontal and unit
        np.testing.assert_allclose(np.linalg.norm(np.asarray(rand_axis)[0]), 1.0, atol=1e-5)
        assert abs(np.asarray(rand_axis)[0, 2]) < 1e-6

    def test_global_z_branch_identity(self, rng):
        delta = rng.randn(1, 50, 3).astype(np.float32)
        kpt = rng.randn(1, 3).astype(np.float32)
        out, rand_axis, R = lrf.align_patches(
            jnp.asarray(delta), jnp.asarray(kpt), jnp.asarray(True)
        )
        np.testing.assert_allclose(np.asarray(out), delta, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rand_axis)[0], [1, 0, 0], atol=1e-6)

    def test_masked_slots_ignored(self, rng):
        # zero offsets (masked convention) must not change the normal
        base = rng.randn(80, 2).astype(np.float32)
        delta_plane = np.concatenate(
            [base, np.zeros((80, 1), np.float32)], axis=-1
        )[None]
        delta_padded = np.concatenate(
            [delta_plane, np.zeros((1, 40, 3), np.float32)], axis=1
        )
        kpt = np.array([[0.0, 0.0, 3.0]], np.float32)
        z1 = np.asarray(lrf.compute_z_axis(jnp.asarray(delta_plane), jnp.asarray(kpt)))
        z2 = np.asarray(lrf.compute_z_axis(jnp.asarray(delta_padded), jnp.asarray(kpt)))
        np.testing.assert_allclose(z1, z2, atol=1e-5)


class TestSelectPatches:
    def test_center_substitution(self, rng):
        pts = rng.randn(300, 3).astype(np.float32)
        kpts = np.array([[50.0, 50.0, 50.0]], np.float32)  # empty neighborhood
        p, v = patches.select_patches(
            jnp.asarray(pts), jnp.ones(300, bool), jnp.asarray(kpts),
            jnp.float32(0.5), jax.random.PRNGKey(0), 32, use_approx=False,
        )
        assert not np.any(np.asarray(v))
        np.testing.assert_allclose(np.asarray(p)[0], np.tile(kpts, (32, 1)), atol=1e-6)

    def test_in_radius(self, rng):
        pts = rng.randn(500, 3).astype(np.float32)
        kpts = pts[:4]
        p, v = patches.select_patches(
            jnp.asarray(pts), jnp.ones(500, bool), jnp.asarray(kpts),
            jnp.float32(0.8), jax.random.PRNGKey(0), 64, use_approx=False,
        )
        d = np.linalg.norm(np.asarray(p) - kpts[:, None], axis=-1)
        assert np.all(d <= 0.8 + 1e-5)


class TestSphericity:
    def test_planar_vs_spherical(self, rng):
        planar = rng.randn(5000, 3).astype(np.float32) * [10, 10, 0.05]
        blob = rng.randn(5000, 3).astype(np.float32) * 2.0
        v1, s1, a1 = sphericity.sphericity_based_voxel_analysis(
            planar, planar, np.random.RandomState(0)
        )
        v2, s2, a2 = sphericity.sphericity_based_voxel_analysis(
            blob, blob, np.random.RandomState(0)
        )
        assert s1 < 0.05 < s2
        assert a1  # planar z-up scene is aligned to global z
        assert v1 > 0 and v2 > 0

    def test_voxel_rule(self, rng):
        planar = rng.randn(8000, 3).astype(np.float32) * [10, 10, 0.05]
        v, s, _ = sphericity.sphericity_based_voxel_analysis(
            planar, planar, np.random.RandomState(1)
        )
        # alpha=1.0 branch: sqrt(z_range)/100
        assert 0.001 <= v <= 0.02
