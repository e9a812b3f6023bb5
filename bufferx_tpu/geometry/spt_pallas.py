"""Fused Pallas kernel for the spatial point transformer's cell query.

The XLA formulation of the SPT (distance matrix -> per-cell top-k by random
priority -> gather) spends its time in [G, P] sorts and 3-float-row gathers
(~530 ms/pair at production shapes). This kernel fuses the whole per-patch
query into VMEM:

- one grid program per patch; patch coords live as [8, P] (xyz in sublanes,
  points on lanes), cells as [Gp, 8] (cells on sublanes);
- squared distances [Gp, P] built with three VPU broadcasts (no MXU);
- ``nsample`` rounds of masked max-selection replace the sort: winner =
  first lane achieving the row max of the priority scores (exact, *not*
  approximate top-k), coordinates extracted by masked row-sum reductions,
  winner's score knocked to -inf;
- empty cells / exhausted candidates produce all-zero slots, matching the
  reference's empty-slot zeroing (``utils/common.py:443-460``).

Output layout [K, Gp, 128] with lane t*3+c holding sample t's coordinate c
(slice to [K, G, nsample, 3] outside). Selection semantics are identical to
the exact jax path given the same per-point priorities, so the two backends
are directly testable against each other.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spt_cell_query_pallas"]


def _kernel(cells_ref, patch_ref, score0_ref, out_ref, *, nsample: int,
            radius2: float, num_cells: int):
    """cells_ref [Gp, 8] (cols 0-2 xyz); patch_ref [1, 8, P] (rows 0-2 xyz);
    score0_ref [1, P] masked priorities; out_ref [1, Gp, 128]."""
    gp = cells_ref.shape[0]
    p = patch_ref.shape[2]

    cx = cells_ref[:, 0:1]                     # [Gp, 1]
    cy = cells_ref[:, 1:2]
    cz = cells_ref[:, 2:3]
    px = patch_ref[0, 0:1, :]                  # [1, P]
    py = patch_ref[0, 1:2, :]
    pz = patch_ref[0, 2:3, :]

    d2 = (cx - px) ** 2 + (cy - py) ** 2 + (cz - pz) ** 2   # [Gp, P]
    gi = jax.lax.broadcasted_iota(jnp.int32, (gp, 1), 0)
    cell_ok = gi < num_cells
    scores = jnp.where(
        (d2 <= radius2) & cell_ok, score0_ref[0, 0:1, :], -jnp.inf
    )

    lane = jax.lax.broadcasted_iota(jnp.int32, (gp, p), 1)
    out_ref[0, :, :] = jnp.zeros((gp, 128), out_ref.dtype)

    # python-unrolled: Mosaic needs static (or 128-aligned) lane indices
    # for the per-sample column writes; nsample is a static kernel param.
    for t in range(nsample):
        m = jnp.max(scores, axis=1, keepdims=True)              # [Gp, 1]
        valid = m > -jnp.inf
        sel = jnp.min(
            jnp.where(scores == m, lane, p), axis=1, keepdims=True
        )                                                       # [Gp, 1]
        onehot = jnp.where((lane == sel) & valid, 1.0, 0.0)     # [Gp, P]
        x = jnp.sum(onehot * px, axis=1, keepdims=True)
        y = jnp.sum(onehot * py, axis=1, keepdims=True)
        z = jnp.sum(onehot * pz, axis=1, keepdims=True)
        for c, v in enumerate((x, y, z)):
            out_ref[0, :, t * 3 + c : t * 3 + c + 1] = v.astype(out_ref.dtype)
        scores = jnp.where(onehot > 0.0, -jnp.inf, scores)


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "interpret")
)
def spt_cell_query_pallas(
    patches: jnp.ndarray,       # [K, P, 3]
    patches_mask: jnp.ndarray,  # [K, P]
    noise: jnp.ndarray,         # [K, P] random priorities
    cells: jnp.ndarray,         # [G, 3]
    radius: float,
    nsample: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [K, G, nsample, 3] selected (zero-filled) patch points."""
    k, p, _ = patches.shape
    g = cells.shape[0]
    assert nsample * 3 <= 128, "output packs nsample*3 coords into one tile"
    gp = (g + 7) // 8 * 8
    p_pad = (p + 127) // 128 * 128

    patches_t = jnp.zeros((k, 8, p_pad), patches.dtype)
    patches_t = patches_t.at[:, :3, :p].set(jnp.swapaxes(patches, 1, 2))
    cells_t = jnp.zeros((gp, 8), cells.dtype).at[:g, :3].set(cells)
    score0 = jnp.where(patches_mask, noise, -jnp.inf)
    score0 = jnp.pad(
        score0, ((0, 0), (0, p_pad - p)), constant_values=-jnp.inf
    )[:, None, :]                              # [K, 1, P]: TPU block rule
    # (second-to-last block dim must divide 8 or equal the array dim)

    out = pl.pallas_call(
        functools.partial(
            _kernel, nsample=nsample, radius2=float(radius) ** 2,
            num_cells=g,
        ),
        grid=(k,),
        in_specs=[
            pl.BlockSpec((gp, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, gp, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, gp, 128), patches.dtype),
        interpret=interpret,
    )(cells_t, patches_t, score0)

    out = out[:, :g, : nsample * 3]
    return out.reshape(k, g, nsample, 3)
