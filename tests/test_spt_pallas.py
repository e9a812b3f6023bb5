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
