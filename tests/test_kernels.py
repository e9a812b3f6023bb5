"""Kernel tests against numpy oracles (CPU backend; Pallas via interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.kernels import fps, neighbors, radius, voxel


def np_fps(xyz, k):
    """Numpy oracle: FPS starting at index 0."""
    n = len(xyz)
    sel = [0]
    mind = np.sum((xyz - xyz[0]) ** 2, axis=-1)
    for _ in range(k - 1):
        s = int(np.argmax(mind))
        sel.append(s)
        mind = np.minimum(mind, np.sum((xyz - xyz[s]) ** 2, axis=-1))
    return np.array(sel)


class TestFPS:
    def test_matches_oracle(self, rng):
        xyz = rng.randn(200, 3).astype(np.float32)
        mask = np.ones(200, bool)
        idx, valid = fps.farthest_point_sampling(jnp.asarray(xyz), jnp.asarray(mask), 32)
        np.testing.assert_array_equal(np.asarray(idx), np_fps(xyz, 32))
        assert np.all(np.asarray(valid))

    def test_respects_mask(self, rng):
        xyz = rng.randn(100, 3).astype(np.float32)
        xyz[50:] += 100.0  # invalid points are far away: would dominate FPS
        mask = np.zeros(100, bool)
        mask[:50] = True
        idx, valid = fps.farthest_point_sampling(jnp.asarray(xyz), jnp.asarray(mask), 20)
        assert np.all(np.asarray(idx) < 50)
        assert np.all(np.asarray(valid))

    def test_more_samples_than_valid(self, rng):
        xyz = rng.randn(10, 3).astype(np.float32)
        mask = np.ones(10, bool)
        idx, valid = fps.farthest_point_sampling(jnp.asarray(xyz), jnp.asarray(mask), 16)
        assert np.asarray(valid).sum() == 10
        # tail repeats the first selection
        np.testing.assert_array_equal(np.asarray(idx)[10:], np.asarray(idx)[0])

    def test_spread_property(self, rng):
        # FPS keypoints must be farther apart than random ones
        xyz = rng.randn(2000, 3).astype(np.float32)
        mask = np.ones(2000, bool)
        idx, _ = fps.farthest_point_sampling(jnp.asarray(xyz), jnp.asarray(mask), 50)
        sel = xyz[np.asarray(idx)]
        d = np.sqrt(((sel[:, None] - sel[None]) ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        rnd = xyz[rng.choice(2000, 50, replace=False)]
        dr = np.sqrt(((rnd[:, None] - rnd[None]) ** 2).sum(-1))
        np.fill_diagonal(dr, np.inf)
        assert d.min() > dr.min()

    def test_pallas_interpret_matches(self, rng):
        xyz = rng.randn(300, 3).astype(np.float32)
        mask = np.ones(300, bool)
        mask[250:] = False
        with jax.disable_jit():  # interpret-mode pallas on CPU
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                idx_p, valid_p = fps.farthest_point_sampling_pallas(
                    jnp.asarray(xyz), jnp.asarray(mask), 32
                )
        idx_j, valid_j = fps.farthest_point_sampling(
            jnp.asarray(xyz), jnp.asarray(mask), 32
        )
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_j))
        np.testing.assert_array_equal(np.asarray(valid_p), np.asarray(valid_j))


class TestNeighbors:
    def test_sqdist_oracle(self, rng):
        a = rng.randn(20, 3).astype(np.float32)
        b = rng.randn(30, 3).astype(np.float32)
        d = neighbors.sqdist(jnp.asarray(a), jnp.asarray(b))
        expect = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d), expect, atol=1e-4)

    def test_nearest_neighbor(self, rng):
        q = rng.randn(50, 32).astype(np.float32)
        r = rng.randn(80, 32).astype(np.float32)
        idx, d2 = neighbors.nearest_neighbor(jnp.asarray(q), jnp.asarray(r))
        expect = np.argmin(((q[:, None] - r[None]) ** 2).sum(-1), axis=-1)
        np.testing.assert_array_equal(np.asarray(idx), expect)

    def test_nearest_neighbor_masked(self, rng):
        q = rng.randn(10, 4).astype(np.float32)
        r = np.concatenate([q + 100.0, q + 0.01 * rng.randn(10, 4)]).astype(np.float32)
        mask_r = np.concatenate([np.ones(10, bool), np.zeros(10, bool)])
        idx, _ = neighbors.nearest_neighbor(
            jnp.asarray(q), jnp.asarray(r), mask_ref=jnp.asarray(mask_r)
        )
        assert np.all(np.asarray(idx) < 10)  # masked refs never selected

    def test_mutual_nearest_perfect(self, rng):
        # identical descriptor sets in shuffled order: all slots mutual
        a = rng.randn(40, 16).astype(np.float32)
        perm = rng.permutation(40)
        b = a[perm]
        nn, mutual, _d2 = neighbors.mutual_nearest(
            jnp.asarray(a), jnp.asarray(b),
            jnp.ones(40, bool), jnp.ones(40, bool),
        )
        assert np.all(np.asarray(mutual))
        np.testing.assert_array_equal(perm[np.asarray(nn)], np.arange(40))

    def test_mutual_nearest_respects_masks(self, rng):
        a = rng.randn(20, 8).astype(np.float32)
        b = a.copy()
        mask_a = np.ones(20, bool)
        mask_a[15:] = False
        nn, mutual, _d2 = neighbors.mutual_nearest(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask_a), jnp.ones(20, bool)
        )
        assert not np.any(np.asarray(mutual)[15:])
        assert np.all(np.asarray(mutual)[:15])

    def test_ball_query_within_radius(self, rng):
        pts = rng.randn(500, 3).astype(np.float32)
        centers = pts[:8]
        idx, valid = neighbors.ball_query(
            jnp.asarray(pts), jnp.ones(500, bool), jnp.asarray(centers),
            jnp.float32(0.7), jax.random.PRNGKey(0), 32, use_approx=False,
        )
        idx, valid = np.asarray(idx), np.asarray(valid)
        for k in range(8):
            got = pts[idx[k][valid[k]]]
            d = np.linalg.norm(got - centers[k], axis=-1)
            assert np.all(d <= 0.7 + 1e-5)
            # center itself is in radius, so at least one valid
            assert valid[k].sum() >= 1

    def test_ball_query_empty(self, rng):
        pts = rng.randn(100, 3).astype(np.float32)
        centers = np.full((2, 3), 50.0, np.float32)  # nothing within radius
        idx, valid = neighbors.ball_query(
            jnp.asarray(pts), jnp.ones(100, bool), jnp.asarray(centers),
            jnp.float32(0.5), jax.random.PRNGKey(0), 16, use_approx=False,
        )
        assert not np.any(np.asarray(valid))

    def test_ball_query_random_subset(self, rng):
        # when > nsample points in radius, selection should not be the
        # nearest ones: check it spans the radius
        pts = (rng.rand(2000, 3).astype(np.float32) - 0.5) * 2.0
        centers = np.zeros((1, 3), np.float32)
        idx, valid = neighbors.ball_query(
            jnp.asarray(pts), jnp.ones(2000, bool), jnp.asarray(centers),
            jnp.float32(0.9), jax.random.PRNGKey(1), 64, use_approx=False,
        )
        got = pts[np.asarray(idx)[0][np.asarray(valid)[0]]]
        d = np.linalg.norm(got, axis=-1)
        assert d.max() > 0.6  # not clustered at the center


class TestVoxel:
    def test_matches_numpy(self, rng):
        xyz = rng.randn(1000, 3).astype(np.float32)
        out_np = voxel.voxel_downsample_np(xyz, 0.5)
        out_j, mask_j = voxel.voxel_downsample(
            jnp.asarray(xyz), jnp.ones(1000, bool), jnp.float32(0.5), 512
        )
        got = np.asarray(out_j)[np.asarray(mask_j)]
        assert got.shape == out_np.shape
        # same barycenter set (sort rows for comparison)
        a = got[np.lexsort(got.T)]
        b = out_np[np.lexsort(out_np.T)]
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_respects_mask(self, rng):
        xyz = rng.randn(100, 3).astype(np.float32)
        mask = np.zeros(100, bool)
        mask[:10] = True
        out, m = voxel.voxel_downsample(
            jnp.asarray(xyz), jnp.asarray(mask), jnp.float32(10.0), 64
        )
        # all 10 valid points fall in one or two voxels at this size
        assert 1 <= np.asarray(m).sum() <= 4

    def test_capacity_overflow(self, rng):
        xyz = (rng.rand(256, 3) * 100).astype(np.float32)  # all distinct voxels
        out, m = voxel.voxel_downsample(
            jnp.asarray(xyz), jnp.ones(256, bool), jnp.float32(0.01), 64
        )
        assert np.asarray(m).sum() == 64  # filled to capacity, no crash

    def test_single_voxel_barycenter(self):
        xyz = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]], np.float32)
        out, m = voxel.voxel_downsample(
            jnp.asarray(xyz), jnp.ones(2, bool), jnp.float32(1.0), 8
        )
        np.testing.assert_allclose(np.asarray(out)[0], [0.15, 0.15, 0.15], atol=1e-6)
        assert np.asarray(m).sum() == 1


class TestRadius:
    def test_quantile_semantics(self, rng):
        pts = rng.randn(3000, 3).astype(np.float32)
        kpts = pts[:200]
        radii = radius.density_aware_radius(
            jnp.asarray(pts), jnp.ones(3000, bool),
            jnp.asarray(kpts), jnp.ones(200, bool),
            thresholds=(5.0, 2.0, 0.5),
        )
        radii = np.asarray(radii)
        # radii decrease with threshold and match the numpy quantile
        assert radii[0] > radii[1] > radii[2] > 0
        d = np.sqrt(((kpts[:, None] - pts[None]) ** 2).sum(-1)).ravel()
        for r, th in zip(radii, (5.0, 2.0, 0.5)):
            frac = (d < r).mean() * 100
            assert abs(frac - th) < 0.35, (r, frac, th)

    def test_respects_mask(self, rng):
        pts = rng.randn(1000, 3).astype(np.float32)
        pts_far = pts.copy()
        pts_far[500:] *= 100  # masked-out far points must not matter
        mask = np.concatenate([np.ones(500, bool), np.zeros(500, bool)])
        r_masked = radius.density_aware_radius(
            jnp.asarray(pts_far), jnp.asarray(mask),
            jnp.asarray(pts[:100]), jnp.ones(100, bool), thresholds=(5.0,),
        )
        # reference denominator counts *valid* pairs only in our version:
        r_clean = radius.density_aware_radius(
            jnp.asarray(pts[:500]), jnp.ones(500, bool),
            jnp.asarray(pts[:100]), jnp.ones(100, bool), thresholds=(5.0,),
        )
        np.testing.assert_allclose(np.asarray(r_masked), np.asarray(r_clean), atol=0.011)


class TestDensityFilter:
    """kernels/density.py — volumetric clutter prefilter."""

    def _surface(self, rng, n=4000):
        # bumpy plane patch ~[0,1]^2: a 2D manifold in 3D
        uv = rng.rand(n, 2).astype(np.float32)
        z = 0.1 * np.sin(6 * uv[:, 0]) * np.cos(5 * uv[:, 1])
        return np.column_stack([uv, z]).astype(np.float32)

    def test_removes_volumetric_clutter(self, rng):
        from bufferx_tpu.kernels.density import density_inlier_mask

        surf = self._surface(rng)
        n_out = 400
        out = rng.uniform(-0.2, 1.2, (n_out, 3)).astype(np.float32)
        out[:, 2] = rng.uniform(0.3, 1.0, n_out)  # clearly off-surface
        pts = np.concatenate([surf, out])
        perm = rng.permutation(len(pts))
        is_out = np.zeros(len(pts), bool)
        is_out[len(surf):] = True
        keep = np.asarray(density_inlier_mask(
            jnp.asarray(pts[perm]), jnp.ones(len(pts), bool)
        ))
        removed = ~keep
        io = is_out[perm]
        assert (removed & io).sum() / n_out > 0.7          # catches clutter
        assert (removed & ~io).sum() / len(surf) < 0.05    # keeps surface

    def test_clean_cloud_mostly_kept(self, rng):
        from bufferx_tpu.kernels.density import density_inlier_mask

        surf = self._surface(rng)
        keep = np.asarray(density_inlier_mask(
            jnp.asarray(surf), jnp.ones(len(surf), bool)
        ))
        assert keep.mean() > 0.95

    def test_respects_input_mask_and_guard(self, rng):
        from bufferx_tpu.kernels.density import density_inlier_mask

        surf = self._surface(rng, n=1000)
        pad = np.zeros((200, 3), np.float32)
        pts = np.concatenate([surf, pad])
        mask = np.concatenate([np.ones(1000, bool), np.zeros(200, bool)])
        keep = np.asarray(density_inlier_mask(jnp.asarray(pts), jnp.asarray(mask)))
        assert not keep[1000:].any()                       # padding stays invalid
        # degenerate guard: uniform volumetric cloud (no manifold) — the
        # filter must not drop more than half
        vol = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
        keep2 = np.asarray(density_inlier_mask(
            jnp.asarray(vol), jnp.ones(1000, bool)
        ))
        assert keep2.mean() >= 0.5


class TestBallQueryBlocks:
    """kernels/neighbors.py:ball_query_blocks — two-level ball query."""

    def _setup(self, rng, n=4096, k=32, r=0.3):
        pts = rng.rand(n, 3).astype(np.float32) * 2 - 1
        mask = np.ones(n, bool)
        kpts = pts[rng.choice(n, k, replace=False)]
        d2 = np.asarray(neighbors.masked_sqdist(
            jnp.asarray(kpts), jnp.asarray(pts),
            jnp.ones(k, bool), jnp.asarray(mask)))
        return pts, mask, kpts, d2

    def test_all_returned_points_in_radius(self, rng):
        pts, mask, kpts, d2 = self._setup(rng)
        r = 0.3
        patches, valid = neighbors.ball_query_blocks(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(kpts),
            jnp.float32(r), jax.random.PRNGKey(0), 128, jnp.asarray(d2))
        patches, valid = np.asarray(patches), np.asarray(valid)
        d = np.linalg.norm(patches - kpts[:, None], axis=-1)
        assert np.all(d[valid] <= r + 1e-6)
        # invalid slots carry the keypoint itself (zero offset)
        np.testing.assert_allclose(
            patches[~valid],
            np.broadcast_to(kpts[:, None], patches.shape)[~valid], atol=0)

    def test_sparse_patches_fully_captured(self, rng):
        # radius so small that every keypoint has < nsample in-ball points:
        # the block path must return EVERY in-radius point (the flat
        # approx_max_k at recall 0.5 drops ~half of them)
        pts, mask, kpts, d2 = self._setup(rng, r=0.08)
        r = 0.08
        patches, valid = neighbors.ball_query_blocks(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(kpts),
            jnp.float32(r), jax.random.PRNGKey(1), 128, jnp.asarray(d2))
        counts_true = (d2 <= r * r).sum(1)
        assert np.all(counts_true < 128)
        np.testing.assert_array_equal(np.asarray(valid).sum(1), counts_true)

    def test_dense_patches_fill_and_uniformity(self, rng):
        pts, mask, kpts, d2 = self._setup(rng, n=8192, k=8, r=0.8)
        r = 0.8
        nsample = 64
        patches, valid = neighbors.ball_query_blocks(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(kpts),
            jnp.float32(r), jax.random.PRNGKey(2), nsample, jnp.asarray(d2))
        patches, valid = np.asarray(patches), np.asarray(valid)
        assert np.all(valid.sum(1) == nsample)
        # spatial uniformity: selected centroid tracks the in-ball centroid
        for i in range(len(kpts)):
            inball = pts[d2[i] <= r * r]
            sel = patches[i][valid[i]]
            tol = 3.0 * inball.std(0).max() / np.sqrt(nsample)
            np.testing.assert_allclose(sel.mean(0), inball.mean(0), atol=tol)

    def test_masked_points_never_selected(self, rng):
        pts, mask, kpts, _ = self._setup(rng)
        mask[::2] = False
        d2 = np.asarray(neighbors.masked_sqdist(
            jnp.asarray(kpts), jnp.asarray(pts),
            jnp.ones(len(kpts), bool), jnp.asarray(mask)))
        patches, valid = neighbors.ball_query_blocks(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(kpts),
            jnp.float32(0.5), jax.random.PRNGKey(3), 64, jnp.asarray(d2))
        patches, valid = np.asarray(patches), np.asarray(valid)
        allowed = {tuple(p) for p in pts[mask]}
        for i in range(len(kpts)):
            for p in patches[i][valid[i]]:
                assert tuple(p) in allowed


class TestStratifiedBallQuery:
    """Gather-free stratified ball query (kernels/neighbors.py)."""

    def _d2(self, centers, pts, pts_mask):
        d = neighbors.masked_sqdist(
            jnp.asarray(centers), jnp.asarray(pts),
            jnp.ones(len(centers), bool), jnp.asarray(pts_mask),
        )
        return d

    def test_within_radius_and_coords_exact(self, rng):
        pts = rng.randn(512, 3).astype(np.float32)
        centers = pts[:8]
        mask = np.ones(512, bool)
        r = jnp.float32(0.7)
        patches, valid = neighbors.ball_query_stratified(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(centers), r,
            jax.random.PRNGKey(0), 64, self._d2(centers, pts, mask),
        )
        patches, valid = np.asarray(patches), np.asarray(valid)
        pts_set = {tuple(np.round(p, 6)) for p in pts}
        for k in range(8):
            got = patches[k][valid[k]]
            d = np.linalg.norm(got - centers[k], axis=-1)
            assert np.all(d <= 0.7 + 1e-5)
            assert valid[k].sum() >= 1  # the center itself is in radius
            # the one-hot reduction must reproduce coordinates EXACTLY
            for p in got:
                assert tuple(np.round(p, 6)) in pts_set
            # invalid slots carry the center's own coordinates
            inval = patches[k][~valid[k]]
            if len(inval):
                np.testing.assert_allclose(
                    inval, np.broadcast_to(centers[k], inval.shape), atol=0
                )

    def test_empty_ball(self, rng):
        pts = rng.randn(128, 3).astype(np.float32)
        centers = np.full((2, 3), 50.0, np.float32)
        mask = np.ones(128, bool)
        patches, valid = neighbors.ball_query_stratified(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(centers),
            jnp.float32(0.5), jax.random.PRNGKey(0), 16,
            self._d2(centers, pts, mask),
        )
        assert not np.any(np.asarray(valid))
        np.testing.assert_allclose(
            np.asarray(patches), np.broadcast_to(centers[:, None], (2, 16, 3))
        )

    def test_respects_point_mask(self, rng):
        pts = rng.randn(256, 3).astype(np.float32) * 0.1
        mask = np.zeros(256, bool)
        mask[:64] = True  # only the first 64 are real
        centers = np.zeros((1, 3), np.float32)
        patches, valid = neighbors.ball_query_stratified(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(centers),
            jnp.float32(1.0), jax.random.PRNGKey(2), 32,
            self._d2(centers, pts, mask),
        )
        got = np.asarray(patches)[0][np.asarray(valid)[0]]
        real = {tuple(np.round(p, 6)) for p in pts[:64]}
        for p in got:
            assert tuple(np.round(p, 6)) in real

    def test_stratified_is_a_spread_sample(self, rng):
        # dense ball: selection spans the radius, is not nearest-biased,
        # and fills every slot (every strip has in-radius members)
        pts = (rng.rand(4096, 3).astype(np.float32) - 0.5) * 2.0
        centers = np.zeros((1, 3), np.float32)
        mask = np.ones(4096, bool)
        patches, valid = neighbors.ball_query_stratified(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(centers),
            jnp.float32(0.9), jax.random.PRNGKey(1), 64,
            self._d2(centers, pts, mask),
        )
        valid = np.asarray(valid)
        assert valid.all()
        d = np.linalg.norm(np.asarray(patches)[0], axis=-1)
        assert d.max() > 0.6
        assert d.min() < 0.3

    def test_selection_randomizes_with_key(self, rng):
        pts = (rng.rand(1024, 3).astype(np.float32) - 0.5) * 2.0
        centers = np.zeros((1, 3), np.float32)
        mask = np.ones(1024, bool)
        d2 = self._d2(centers, pts, mask)
        p1, _ = neighbors.ball_query_stratified(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(centers),
            jnp.float32(0.9), jax.random.PRNGKey(1), 32, d2)
        p2, _ = neighbors.ball_query_stratified(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(centers),
            jnp.float32(0.9), jax.random.PRNGKey(2), 32, d2)
        assert not np.allclose(np.asarray(p1), np.asarray(p2))

    def test_select_patches_dispatch_and_fallback(self, rng):
        from bufferx_tpu.geometry.patches import select_patches

        pts = rng.randn(512, 3).astype(np.float32)
        mask = np.ones(512, bool)
        centers = pts[:4]
        d2 = self._d2(centers, pts, mask)
        # divisible: stratified path, coords exact
        p, v = select_patches(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(centers),
            jnp.float32(0.8), jax.random.PRNGKey(0), 64, d2=d2,
            use_strat=True,
        )
        assert p.shape == (4, 64, 3)
        # non-divisible: loud fallback to the flat path
        import warnings as _w

        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            p2, v2 = select_patches(
                jnp.asarray(pts[:500]), jnp.asarray(mask[:500]),
                jnp.asarray(centers), jnp.float32(0.8),
                jax.random.PRNGKey(0), 64, d2=d2[:, :500], use_strat=True,
            )
        assert any("stratified" in str(w.message) for w in rec)
        assert p2.shape == (4, 64, 3)


def test_radius_subsample_matches_full(rng=None):
    """Stride-4 quantile estimation stays within the estimate's own 1-cm
    rounding of the full computation on a production-like cloud."""
    from bufferx_tpu.kernels.neighbors import masked_sqdist
    from bufferx_tpu.kernels.radius import density_aware_radius_from_d2

    rs = np.random.RandomState(3)
    pts = rs.randn(8192, 3).astype(np.float32)
    kpts = pts[rs.choice(8192, 512, replace=False)]
    mask = np.ones(8192, bool)
    kmask = np.ones(512, bool)
    d2 = masked_sqdist(jnp.asarray(kpts), jnp.asarray(pts),
                       jnp.asarray(kmask), jnp.asarray(mask))
    full = density_aware_radius_from_d2(
        d2, jnp.asarray(mask), jnp.asarray(kmask),
        thresholds=(5.0, 2.0, 0.5), max_r=5.0, subsample=1)
    sub = density_aware_radius_from_d2(
        d2, jnp.asarray(mask), jnp.asarray(kmask),
        thresholds=(5.0, 2.0, 0.5), max_r=5.0, subsample=4)
    np.testing.assert_allclose(np.asarray(sub), np.asarray(full), atol=0.021)


def test_sqdist_compensated_accuracy():
    """One-pass bf16 hi/lo sqdist must stay within 2^-16-relative of the
    HIGHEST-precision f32 path at scene scale (it feeds the geometry d2
    matrices; boundary flips beyond that would perturb ball queries)."""
    import jax.numpy as jnp
    import numpy as np

    from bufferx_tpu.kernels.neighbors import sqdist, sqdist_compensated

    rs = np.random.RandomState(3)
    a = jnp.asarray(rs.randn(64, 3) * 3.0, jnp.float32)
    b = jnp.asarray(rs.randn(256, 3) * 3.0, jnp.float32)
    want = np.asarray(sqdist(a, b))
    got = np.asarray(sqdist_compensated(a, b))
    # error bound: 2^-16 * sum_i |a_i||b_i| (the dropped lo*lo terms) —
    # at 3-m scene scale that is ~4e-4 m^2, i.e. <1 mm at radius 0.3 m
    scale = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / scale) < 1.5e-3
