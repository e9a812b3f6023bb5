"""Parity test: the fused Pallas SPT cell query vs the exact jax path.

Given the same per-point priorities, both select the top-``nsample``
in-radius points per cell (ties -> lowest index), so outputs must match
exactly. Runs the kernel in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.geometry.cylindrical import (
    _cell_query_one,
    grid_cell_centers,
)
from bufferx_tpu.geometry.spt_pallas import spt_cell_query_pallas


def jax_reference(patches, mask, noise, cells, radius, nsample):
    return jax.vmap(
        lambda pp, mm, nn: _cell_query_one(
            pp, mm, cells, nn, radius, nsample, use_approx=False
        )
    )(patches, mask, noise)


class TestSPTPallasParity:
    def test_matches_exact_jax(self, rng):
        K, P, ns = 3, 128, 10
        cells = jnp.asarray(grid_cell_centers(3, 7, 20))
        patches = jnp.asarray((rng.randn(K, P, 3) * 0.4).astype(np.float32))
        mask = np.ones((K, P), bool)
        mask[:, 100:] = False
        noise = jnp.asarray(rng.rand(K, P).astype(np.float32))
        radius = 0.8 / 3

        ref = jax_reference(
            patches, jnp.asarray(mask), noise, cells, radius, ns
        )
        out = spt_cell_query_pallas(
            patches, jnp.asarray(mask), noise, cells, radius, ns,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_empty_patch_all_zero(self, rng):
        K, P, ns = 1, 64, 10
        cells = jnp.asarray(grid_cell_centers(3, 7, 20))
        patches = jnp.asarray(np.full((K, P, 3), 50.0, np.float32))
        mask = jnp.zeros((K, P), bool)
        noise = jnp.asarray(rng.rand(K, P).astype(np.float32))
        out = spt_cell_query_pallas(
            patches, mask, noise, cells, 0.8 / 3, ns, interpret=True
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
        noise = jnp.asarray(rng.rand(K, P).astype(np.float32))
        out = np.asarray(
            spt_cell_query_pallas(
                jnp.asarray(patches), jnp.ones((K, P), bool), noise, cells,
                0.1, ns, interpret=True,
            )
        )
        nonzero = (np.abs(out[0, 0]).sum(-1) > 0).sum()
        assert nonzero == 2
