"""Native C++ library tests: build + parity against numpy oracles."""

import numpy as np
import pytest

from bufferx_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        if not native.build():
            pytest.skip("no C++ toolchain available")
    assert native.available()


class TestVoxelDownsample:
    def test_matches_numpy(self, rng):
        from bufferx_tpu.kernels.voxel import voxel_downsample_np

        pts = rng.randn(5000, 3).astype(np.float32)
        a = native.voxel_downsample(pts, 0.4)
        b = voxel_downsample_np(pts, 0.4)
        assert len(a) == len(b)
        sa = a[np.lexsort(a.T)]
        sb = b[np.lexsort(b.T)]
        np.testing.assert_allclose(sa, sb, atol=1e-4)

    def test_capacity(self, rng):
        pts = (rng.rand(1000, 3) * 100).astype(np.float32)
        out = native.voxel_downsample(pts, 0.01, capacity=64)
        assert len(out) == 64


class TestRadiusNeighbors:
    def test_all_within_radius(self, rng):
        pts = rng.randn(2000, 3).astype(np.float32)
        q = pts[:16]
        idx = native.radius_neighbors(q, pts, 0.5, 64)
        assert idx.shape == (16, 64)
        for row, qq in zip(idx, q):
            hits = row[row >= 0]
            assert len(hits) >= 1  # the query point itself
            d = np.linalg.norm(pts[hits] - qq, axis=-1)
            assert np.all(d <= 0.5 + 1e-5)

    def test_finds_all_neighbors(self, rng):
        # count parity with brute force (up to capacity)
        pts = rng.randn(500, 3).astype(np.float32)
        q = pts[:8]
        idx = native.radius_neighbors(q, pts, 0.6, 500)
        d2 = ((q[:, None] - pts[None]) ** 2).sum(-1)
        for i in range(8):
            expect = (d2[i] <= 0.36).sum()
            got = (idx[i] >= 0).sum()
            assert got == expect


class TestKNN:
    def test_matches_bruteforce(self, rng):
        pts = rng.randn(3000, 3).astype(np.float32)
        q = rng.randn(32, 3).astype(np.float32)
        idx, d2 = native.knn(q, pts, 5)
        bf = ((q[:, None] - pts[None]) ** 2).sum(-1)
        bf_idx = np.argsort(bf, axis=1)[:, :5]
        bf_d = np.take_along_axis(bf, bf_idx, 1)
        # distances must match (indices may tie-swap)
        np.testing.assert_allclose(np.sort(d2, 1), np.sort(bf_d, 1), rtol=1e-4)


class TestFPS:
    def test_matches_numpy_oracle(self, rng):
        pts = rng.randn(800, 3).astype(np.float32)
        got = native.fps(pts, 32)
        sel = [0]
        mind = ((pts - pts[0]) ** 2).sum(-1)
        for _ in range(31):
            s = int(np.argmax(mind))
            sel.append(s)
            mind = np.minimum(mind, ((pts - pts[s]) ** 2).sum(-1))
        np.testing.assert_array_equal(got, sel)
