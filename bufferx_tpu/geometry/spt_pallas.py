"""Fused Pallas kernel for the spatial point transformer's cell query.

The XLA formulation of the SPT (distance matrix -> per-cell top-k by random
priority -> gather) spends its time in [G, P] sorts and 3-float-row gathers
(~530 ms/pair at production shapes). This kernel fuses the whole per-patch
query into VMEM:

- one grid program per PB=8 patches (amortizes program launch + input DMA,
  which dominated the single-patch variant);
- patch coords live twice: [8, P] (xyz in sublanes — VPU broadcasts for the
  distance field) and [P, 8] (xyz in lanes — MXU one-hot extraction);
- squared distances [Gp, P] built with three VPU broadcasts;
- ``nsample`` rounds of masked max-selection replace the sort: winner =
  first lane achieving the row max of the priority scores (exact, *not*
  approximate top-k), coordinates extracted in one [Gp,P]x[P,8] MXU matmul,
  winner's score knocked to -inf;
- empty cells / exhausted candidates produce all-zero slots, matching the
  reference's empty-slot zeroing (``utils/common.py:443-460``).

Output layout [K, Gp, 128] with lane t*8+c holding sample t's coordinate c
(sliced to [K, G, nsample, 3] outside). Selection semantics are identical
to the exact jax path given the same per-point priorities, so the two
backends are directly testable against each other.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spt_cell_query_pallas"]

_PB = 8  # patches per grid program


def _kernel(cells_ref, rows_ref, cols_ref, score0_ref, out_ref, *,
            nsample: int, radius2: float, num_cells: int):
    """cells_ref [Gp, 8] (cols 0-2 xyz); rows_ref [PB, 8, P] (xyz rows);
    cols_ref [PB, P, 8] (xyz lanes); score0_ref [PB, 1, P] masked
    priorities; out_ref [PB, Gp, 128]."""
    gp = cells_ref.shape[0]
    p = rows_ref.shape[2]

    cx = cells_ref[:, 0:1]                     # [Gp, 1]
    cy = cells_ref[:, 1:2]
    cz = cells_ref[:, 2:3]
    gi = jax.lax.broadcasted_iota(jnp.int32, (gp, 1), 0)
    cell_ok = gi < num_cells
    lane = jax.lax.broadcasted_iota(jnp.int32, (gp, p), 1)

    for j in range(_PB):
        px = rows_ref[j, 0:1, :]               # [1, P]
        py = rows_ref[j, 1:2, :]
        pz = rows_ref[j, 2:3, :]
        d2 = (cx - px) ** 2 + (cy - py) ** 2 + (cz - pz) ** 2   # [Gp, P]
        scores = jnp.where(
            (d2 <= radius2) & cell_ok, score0_ref[j, 0:1, :], -jnp.inf
        )
        out_ref[j, :, :] = jnp.zeros((gp, 128), out_ref.dtype)
        patch_cols = cols_ref[j]               # [P, 8]

        # python-unrolled: Mosaic needs static lane indices for the
        # per-sample column writes; nsample is a static kernel param.
        for t in range(nsample):
            m = jnp.max(scores, axis=1, keepdims=True)          # [Gp, 1]
            valid = m > -jnp.inf
            sel = jnp.min(
                jnp.where(scores == m, lane, p), axis=1, keepdims=True
            )
            onehot = jnp.where((lane == sel) & valid, 1.0, 0.0)  # [Gp, P]
            coords = jnp.dot(
                onehot, patch_cols, preferred_element_type=jnp.float32
            )                                                    # [Gp, 8]
            out_ref[j, :, t * 8 : t * 8 + 8] = coords.astype(out_ref.dtype)
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
    assert nsample * 8 <= 128, "output packs nsample*8 lanes into one tile"
    gp = (g + 7) // 8 * 8
    p_pad = (p + 127) // 128 * 128
    k_pad = (k + _PB - 1) // _PB * _PB

    rows = jnp.zeros((k_pad, 8, p_pad), patches.dtype)
    rows = rows.at[:k, :3, :p].set(jnp.swapaxes(patches, 1, 2))
    cols = jnp.zeros((k_pad, p_pad, 8), patches.dtype)
    cols = cols.at[:k, :p, :3].set(patches)
    cells_t = jnp.zeros((gp, 8), cells.dtype).at[:g, :3].set(cells)
    score0 = jnp.where(patches_mask, noise, -jnp.inf)
    score0 = jnp.pad(
        score0, ((0, k_pad - k), (0, p_pad - p)), constant_values=-jnp.inf
    )[:, None, :]                              # [Kp, 1, P]

    out = pl.pallas_call(
        functools.partial(
            _kernel, nsample=nsample, radius2=float(radius) ** 2,
            num_cells=g,
        ),
        grid=(k_pad // _PB,),
        in_specs=[
            pl.BlockSpec((gp, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_PB, 8, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PB, p_pad, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PB, 1, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_PB, gp, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, gp, 128), patches.dtype),
        interpret=interpret,
    )(cells_t, rows, cols, score0)

    out = out[:k, :g, : nsample * 8].reshape(k, g, nsample, 8)
    return out[..., :3]
