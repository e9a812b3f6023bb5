"""Fused Pallas kernel for the spatial point transformer's cell query.

Selects, per cylindrical-grid cell, the **first ``nsample`` in-radius patch
points in row order**. Patch rows arrive in uniform-random order (the
patch extraction at :mod:`bufferx_tpu.geometry.patches` orders by its
random top-k priorities), so first-in-order = uniform random subset — the
exact distribution of the reference's shuffle-once-then-ball-query
(``utils/common.py:431-460``: the cloud is shuffled once and ``ball_query``
keeps the first ``nsample`` hits in cloud order; here "cloud order" is the
patch's random row order, same construction).

Kernel design (one grid program per ``PB=8`` patches):

- patch coords live twice in VMEM: [8, P] (xyz in sublanes — VPU broadcasts
  for the distance field) and [P, 8] (xyz in lanes — MXU extraction);
- squared distances [Gp, P] from three VPU broadcasts; in-radius mask;
- **selection rank by matmul, not argmax rounds**: the running count of
  in-radius hits along the row is a prefix sum, computed as 0/1-matrix ×
  lower-triangular-ones matmuls on the MXU in bf16 (exact: chunk width 128
  keeps every partial sum ≤ 128 < 2^8, below bf16's integer-exactness
  limit of 256), plus scalar cross-chunk offsets. This replaces the
  previous kernel's ``nsample`` sequential masked-argmax rounds (~5 VPU
  sweeps over [Gp, P] each) with ~3 sweeps total;
- sample ``t`` = the point whose rank is ``t+1``: one compare per slot and
  one [Gp, P] × [P, 8] MXU matmul extracts its coordinates;
- empty cells / exhausted candidates produce all-zero slots, matching the
  reference's empty-slot zeroing (``utils/common.py:443-460``).

Output layout [K, Gp, 128] with lane t*8+c holding sample t's coordinate c
(sliced to [K, G, nsample, 3] outside). Selection is deterministic given
the row order, so the jax fallback (top-k over descending-index priorities)
is bit-identical and the two backends are directly testable against each
other.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spt_cell_query_pallas"]

_PB = 4       # patches per grid program
_CHUNK = 128  # prefix-sum chunk width (bf16-exact: sums stay < 256)


def _rank_in_row_order(ok: jnp.ndarray, lt: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix count of set bits along lanes. ok: [Gp, P] bool;
    lt: [CHUNK, CHUNK] bf16 lower-triangular ones (inclusive)."""
    gp, p = ok.shape
    f = ok.astype(jnp.bfloat16)
    parts = []
    offset = None
    for c in range(p // _CHUNK):
        blk = f[:, c * _CHUNK : (c + 1) * _CHUNK]
        r = jnp.dot(blk, lt, preferred_element_type=jnp.float32)  # [Gp, C]
        if offset is not None:
            r = r + offset
        parts.append(r)
        offset = r[:, _CHUNK - 1 : _CHUNK]          # running total [Gp, 1]
    return jnp.concatenate(parts, axis=1)            # [Gp, P]


def _kernel(cells_ref, rows_ref, cols_ref, valid_ref, lt_ref, out_ref, *,
            nsample: int, radius2: float, num_cells: int):
    """cells_ref [Gp, 8] (cols 0-2 xyz); rows_ref [PB, 8, P] (xyz rows);
    cols_ref [PB, P, 8] (xyz lanes); valid_ref [PB, 1, P] f32 0/1;
    lt_ref [CHUNK, CHUNK] bf16; out_ref [PB, Gp, 128]."""
    gp = cells_ref.shape[0]

    cx = cells_ref[:, 0:1]                     # [Gp, 1]
    cy = cells_ref[:, 1:2]
    cz = cells_ref[:, 2:3]
    gi = jax.lax.broadcasted_iota(jnp.int32, (gp, 1), 0)
    cell_ok = gi < num_cells
    lt = lt_ref[:, :]

    for j in range(_PB):
        px = rows_ref[j, 0:1, :]               # [1, P]
        py = rows_ref[j, 1:2, :]
        pz = rows_ref[j, 2:3, :]
        d2 = (cx - px) ** 2 + (cy - py) ** 2 + (cz - pz) ** 2   # [Gp, P]
        ok = (d2 <= radius2) & cell_ok & (valid_ref[j, 0:1, :] > 0.0)
        rank = _rank_in_row_order(ok, lt)
        rank = jnp.where(ok, rank, 0.0)
        patch_cols = cols_ref[j]               # [P, 8]

        if nsample * 8 < 128:
            out_ref[j, :, nsample * 8 :] = jnp.zeros(
                (gp, 128 - nsample * 8), out_ref.dtype
            )
        # python-unrolled: Mosaic needs static lane indices for the
        # per-sample column writes; nsample is a static kernel param.
        for t in range(nsample):
            onehot = (rank == jnp.float32(t + 1)).astype(jnp.float32)
            coords = jnp.dot(
                onehot, patch_cols, preferred_element_type=jnp.float32
            )                                                    # [Gp, 8]
            out_ref[j, :, t * 8 : t * 8 + 8] = coords.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "interpret")
)
def spt_cell_query_pallas(
    patches: jnp.ndarray,       # [K, P, 3] (rows in random order)
    patches_mask: jnp.ndarray,  # [K, P]
    cells: jnp.ndarray,         # [G, 3]
    radius: float,
    nsample: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [K, G, nsample, 3]: per cell, the first ``nsample`` in-radius
    patch points in row order (zero-filled when fewer exist)."""
    k, p, _ = patches.shape
    g = cells.shape[0]
    assert nsample * 8 <= 128, "output packs nsample*8 lanes into one tile"
    gp = (g + 7) // 8 * 8
    p_pad = (p + _CHUNK - 1) // _CHUNK * _CHUNK
    k_pad = (k + _PB - 1) // _PB * _PB

    rows = jnp.zeros((k_pad, 8, p_pad), patches.dtype)
    rows = rows.at[:k, :3, :p].set(jnp.swapaxes(patches, 1, 2))
    cols = jnp.zeros((k_pad, p_pad, 8), patches.dtype)
    cols = cols.at[:k, :p, :3].set(patches)
    cells_t = jnp.zeros((gp, 8), cells.dtype).at[:g, :3].set(cells)
    valid = jnp.zeros((k_pad, 1, p_pad), jnp.float32)
    valid = valid.at[:k, 0, :p].set(patches_mask.astype(jnp.float32))
    lt = jnp.tril(jnp.ones((_CHUNK, _CHUNK), jnp.bfloat16)).T  # row i: 1s ≥ i

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
            pl.BlockSpec((_CHUNK, _CHUNK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_PB, gp, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, gp, 128), patches.dtype),
        interpret=interpret,
    )(cells_t, rows, cols, valid, lt)

    out = out[:k, :g, : nsample * 8].reshape(k, g, nsample, 8)
    return out[..., :3]
