"""Cylindrical-grid machinery for the Mini-SpinNet descriptor.

Pure-jax reimplementation of the reference's grid construction and queries
(``/root/reference/utils/common.py``): ``s2_grid`` (:248), spherical→
Cartesian conversion (:373), ``get_voxel_coordinate`` (:422),
``sphere_query`` (:431) and ``var_to_invar`` (:472). The CUDA ``ball_query``
inside ``sphere_query`` becomes the same masked random top-k used by
:mod:`bufferx_tpu.kernels.neighbors`, vmapped over patches and chunked with
``lax.map`` to bound the transient [G, P] score matrices.

Grid layout convention (matches the reference flattening order): cells are
indexed ``[rad, ele, azi]``, flattened C-order to ``G = rad_n*ele_n*azi_n``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.core.se3 import rotation_z

__all__ = ["grid_cell_centers", "spatial_point_transformer", "var_to_invar"]


def grid_cell_centers(rad_n: int, ele_n: int, azi_n: int) -> np.ndarray:
    """Cell-center coordinates of the unit cylindrical(-spherical) grid.

    Returns [rad_n * ele_n * azi_n, 3] float32: rings of ``azi_n`` azimuth
    bins at ``ele_n`` elevations, replicated at ``rad_n`` radial shells
    centered at radii (i + 0.5)/rad_n, i = 0..rad_n-1 (unit descriptor
    radius; scale by ``des_r`` outside).
    """
    beta = np.linspace(0.0, np.pi, ele_n, endpoint=False) + np.pi / ele_n / 2.0
    alpha = np.linspace(0.0, 2.0 * np.pi, azi_n, endpoint=False) + np.pi / azi_n
    B, A = np.meshgrid(beta, alpha, indexing="ij")      # [ele, azi]
    st, ct = np.sin(B), np.cos(B)
    cp, sp = np.cos(A), np.sin(A)
    on_sphere = np.stack([st * cp, st * sp, ct], axis=-1).reshape(-1, 3)
    shells = (np.arange(rad_n) / rad_n + 1.0 / (2 * rad_n)).reshape(rad_n, 1, 1)
    return (shells * on_sphere[None]).reshape(-1, 3).astype(np.float32)


def _cell_query_one(
    patch: jnp.ndarray,       # [P, 3] normalized patch offsets, rows in
                              # random order (see spt_pallas docstring)
    patch_mask: jnp.ndarray,  # [P]
    cells: jnp.ndarray,       # [G, 3]
    radius: float,
    nsample: int,
    use_approx: bool,
):
    """First ``nsample`` in-radius points per grid cell (row order),
    zero-filled. Row order is the selection priority: patch rows arrive
    uniformly shuffled, so this is the reference's shuffle-once-then-
    ball-query random subset (``utils/common.py:431-460``)."""
    d2 = (
        jnp.sum(cells * cells, axis=-1, keepdims=True)
        - 2.0
        * jnp.einsum("gd,pd->gp", cells, patch, precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(patch * patch, axis=-1)[None, :]
    )
    in_r = (d2 <= radius * radius) & patch_mask[None, :]
    p = patch.shape[0]
    # priority = descending row index: top-k picks the earliest rows
    prio = -jnp.arange(p, dtype=jnp.float32)[None, :]
    scores = jnp.where(in_r, prio, -jnp.inf)
    if use_approx:
        # bitonic approx top-k: ~50x cheaper than the full per-cell sort
        vals, idx = jax.lax.approx_max_k(scores, nsample, recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(scores, nsample)          # [G, ns]
    valid = vals > -jnp.inf
    idx = jnp.where(valid, idx, 0)
    gathered = patch[idx]                                    # [G, ns, 3]
    return jnp.where(valid[..., None], gathered, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "rad_n", "ele_n", "azi_n", "delta", "nsample", "chunk", "use_approx"
    ),
)
def spatial_point_transformer(
    patches: jnp.ndarray,       # [K, P, 3] normalized (unit-radius) offsets,
                                # rows in random order
    patches_mask: jnp.ndarray,  # [K, P]
    rad_n: int,
    ele_n: int,
    azi_n: int,
    delta: float,
    nsample: int,
    chunk: int = 256,
    use_approx: bool = True,
):
    """SPT: scatter each patch onto the cylindrical grid and derotate.

    Equivalent of ``MiniSpinNet.SPT`` (``models/patch_embedder.py:150-165``):
    per grid cell, take the first ``nsample`` in-radius patch points in row
    order (radius = delta / rad_n on the unit patch) — patch rows arrive
    uniformly shuffled from the patch extraction, so this reproduces the
    reference's shuffle-once-then-ball-query random subset — zero out
    empties, then rotate each azimuth column into the invariant frame.
    Returns [K, G, nsample, 3].
    """
    k, p = patches.shape[0], patches.shape[1]
    cells = jnp.asarray(grid_cell_centers(rad_n, ele_n, azi_n))
    g = cells.shape[0]
    radius = delta / rad_n

    if jax.default_backend() == "tpu" and nsample * 8 <= 128:
        from bufferx_tpu.geometry.spt_pallas import spt_cell_query_pallas

        out = spt_cell_query_pallas(
            patches, patches_mask, cells, radius, nsample
        )
        return var_to_invar(out, rad_n, ele_n, azi_n)

    def run_chunk(args):
        pa, ma = args
        return jax.vmap(
            lambda pp, mm: _cell_query_one(
                pp, mm, cells, radius, nsample, use_approx
            )
        )(pa, ma)

    n_chunks = (k + chunk - 1) // chunk
    pad = n_chunks * chunk - k
    pa = jnp.pad(patches, ((0, pad), (0, 0), (0, 0)))
    ma = jnp.pad(patches_mask, ((0, pad), (0, 0)))
    out = jax.lax.map(
        run_chunk,
        (
            pa.reshape(n_chunks, chunk, p, 3),
            ma.reshape(n_chunks, chunk, p),
        ),
    ).reshape(n_chunks * chunk, g, nsample, 3)[:k]
    return var_to_invar(out, rad_n, ele_n, azi_n)


def var_to_invar(
    pts: jnp.ndarray, rad_n: int, ele_n: int, azi_n: int
) -> jnp.ndarray:
    """Derotate each azimuth column by its bin angle (``common.py:472-498``).

    pts: [K, G, nsample, 3] with G = rad_n*ele_n*azi_n in [rad, ele, azi]
    order. Cell at azimuth bin i gets rotated by R_z(-i * 2π/azi_n) so all
    columns share one canonical frame.
    """
    k, _, ns, _ = pts.shape
    pts = pts.reshape(k, rad_n, ele_n, azi_n, ns, 3)
    angles = -2.0 * jnp.pi / azi_n * jnp.arange(azi_n, dtype=pts.dtype)
    R = rotation_z(angles)                                   # [azi, 3, 3]
    out = jnp.einsum(
        "kreasd,adc->kreasc",            # a = azimuth bin, d/c = coord dims
        pts,
        jnp.swapaxes(R, -1, -2),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(k, rad_n * ele_n * azi_n, ns, 3)
