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

__all__ = ["spt_cell_query_pallas", "spt_moments_pallas"]

_PB = 4       # patches per grid program
_CHUNK = 128  # prefix-sum chunk width (bf16-exact: sums stay < 256)
_PB_M = 8     # patches per program in the moments kernel (16 lanes each,
              # 8 patches per 128-lane output row; 32 measured slightly
              # worse — the kernel is compute-bound, not dispatch-bound)


def _aug_cells(cells_ref, radius2: float, num_cells: int):
    """Cell-side operands of the matmul distance field.

    The in-radius test ``|c - p|^2 <= r^2`` is evaluated as
    ``(|p|^2 - 2 c.p) <= r^2 - |c|^2`` with the left side computed by one
    MXU matmul: ``[-2c, 1] @ [p; |p|^2]``. A plain f32 matmul is slow
    (multi-pass) and plain bf16 flips boundary points, so both operands are
    split into bf16 hi/lo halves and stacked along the contraction axis —
    ``[c_hi, c_hi, c_lo] @ [p_hi; p_lo; p_hi]`` — recovering ~2^-18
    relative accuracy in ONE bf16 matmul (the 24-wide contraction pads to
    128 lanes regardless).

    Returns (cells_cat [Gp, 24] bf16, thr [Gp, 1] f32).
    """
    gp = cells_ref.shape[0]
    cx = cells_ref[:, 0:1]
    cy = cells_ref[:, 1:2]
    cz = cells_ref[:, 2:3]
    gi = jax.lax.broadcasted_iota(jnp.int32, (gp, 1), 0)
    cell_ok = gi < num_cells
    li = jax.lax.broadcasted_iota(jnp.int32, (gp, 8), 1)
    cells_aug = jnp.where(
        li < 3, -2.0 * cells_ref[:, :], jnp.where(li == 3, 1.0, 0.0)
    )                                            # [Gp, 8] f32
    c_hi = cells_aug.astype(jnp.bfloat16)
    c_lo = (cells_aug - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    cells_cat = jnp.concatenate([c_hi, c_hi, c_lo], axis=1)   # [Gp, 24]
    thr = jnp.where(cell_ok, radius2 - (cx * cx + cy * cy + cz * cz),
                    -jnp.inf)                    # [Gp, 1]
    return cells_cat, thr


def _cross_field(cells_cat, rj):
    """``|p|^2 - 2 c.p`` for one patch: rj [8, P] (xyz in sublanes 0-2).

    Returns [Gp, P] f32 via one bf16 hi/lo-compensated MXU matmul.
    """
    px = rj[0:1, :]
    py = rj[1:2, :]
    pz = rj[2:3, :]
    pq = px * px + py * py + pz * pz             # [1, P]
    si = jax.lax.broadcasted_iota(jnp.int32, (8, rj.shape[1]), 0)
    p_aug = jnp.where(si < 3, rj, jnp.where(si == 3, pq, 0.0))
    p_hi = p_aug.astype(jnp.bfloat16)
    p_lo = (p_aug - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    p_cat = jnp.concatenate([p_hi, p_lo, p_hi], axis=0)       # [24, P]
    return jnp.dot(cells_cat, p_cat, preferred_element_type=jnp.float32)


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


def _kernel(cells_ref, rows_ref, lt_ref, out_ref, *,
            nsample: int, radius2: float, num_cells: int):
    """cells_ref [Gp, 8] (cols 0-2 xyz); rows_ref [PB, 8, P] (xyz in
    sublanes 0-2, validity 0/1 in sublane 3); lt_ref [CHUNK, CHUNK] bf16;
    out_ref [PB, Gp, 128]."""
    gp = cells_ref.shape[0]
    lt = lt_ref[:, :]
    cells_cat, thr = _aug_cells(cells_ref, radius2, num_cells)

    for j in range(_PB):
        rj = rows_ref[j]                       # [8, P]
        cross = _cross_field(cells_cat, rj)    # [Gp, P]
        ok = (cross <= thr) & (rj[3:4, :] > 0.0)
        rank = _rank_in_row_order(ok, lt)
        rank = jnp.where(ok, rank, 0.0)
        # [P, 8] via in-VMEM transpose (see _moments_kernel: a separate
        # [K, P, 8] operand stores lane-padded 16x and its DMA dominates);
        # zero the mask sublane so extracted coords stay pure xyz.
        si = jax.lax.broadcasted_iota(jnp.int32, rj.shape, 0)
        patch_cols = jnp.transpose(jnp.where(si < 3, rj, 0.0), (1, 0))

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
    rows = rows.at[:k, 3, :p].set(patches_mask.astype(patches.dtype))
    cells_t = jnp.zeros((gp, 8), cells.dtype).at[:g, :3].set(cells)
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
            pl.BlockSpec((_CHUNK, _CHUNK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_PB, gp, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, gp, 128), patches.dtype),
        interpret=interpret,
    )(cells_t, rows, lt)

    out = out[:k, :g, : nsample * 8].reshape(k, g, nsample, 8)
    return out[..., :3]


def _moments_kernel(cells_ref, rows_ref, out_ref, *,
                    radius2: float, num_cells: int):
    """Dense moment pooling ("moments" descriptor mode), v2.

    One program pools ``_PB_M`` patches. v1 ran one [Gp, 24] x [24, P]
    distance matmul PER PATCH (the 24-wide contraction pads to 128 — 5x
    padding waste paid 8x per program), transposed the patch rows in VMEM,
    and assembled psi from [P, 1] COLUMN slices (1 of 128 lanes busy).
    MICRO_r4.jsonl measured the result at 0.6% MXU. v2 restructures:

    - ONE distance matmul for all patches: per-patch operands concatenate
      along lanes to [24, PB*P], so the padded contraction is paid once;
    - psi is built in [16, P] ROW orientation directly from the rows-ref
      sublanes (every op runs at full lane width, no transpose);
    - the moments contraction runs as ``dot_general`` over the LAST axis
      of both ``ok [Gp, P]`` and ``psi_rows [16, P]`` (the MXU's native
      A @ B^T feed) -> [Gp, 16] written to the packed output lanes.

    Counts stay exact: 0/1 bf16 products accumulate in f32 on the MXU.

    cells_ref [Gp, 8] (cols 0-2 xyz); rows_ref [PB, 8, P] (xyz in sublanes
    0-2, mask in sublane 3); out_ref [PB//8, Gp, 128] (patch j's moments
    in lanes (j%8)*16 .. (j%8)*16+16 of row j//8).
    """
    cells_cat, thr = _aug_cells(cells_ref, radius2, num_cells)
    p = rows_ref.shape[2]

    p_cats = []
    psis = []
    for j in range(_PB_M):
        rj = rows_ref[j]                         # [8, P]; sublane 3 = mask
        px, py, pz = rj[0:1, :], rj[1:2, :], rj[2:3, :]
        v = rj[3:4, :]
        pq = px * px + py * py + pz * pz         # [1, P]
        si = jax.lax.broadcasted_iota(jnp.int32, (8, p), 0)
        p_aug = jnp.where(si < 3, rj, jnp.where(si == 3, pq, 0.0))
        p_hi = p_aug.astype(jnp.bfloat16)
        p_lo = (p_aug - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        p_cats.append(jnp.concatenate([p_hi, p_lo, p_hi], axis=0))  # [24,P]
        zero = jnp.zeros_like(px)
        psi = jnp.concatenate(
            [px, py, pz, px * px, py * py, pz * pz,
             px * py, py * pz, pz * px, v,
             zero, zero, zero, zero, zero, zero],
            axis=0,
        ) * v                                    # [16, P], mask folded in
        psis.append(psi.astype(jnp.bfloat16))

    cross = jnp.dot(
        cells_cat, jnp.concatenate(p_cats, axis=1),
        preferred_element_type=jnp.float32,
    )                                            # [Gp, PB*P]
    ok = (cross <= thr).astype(jnp.bfloat16)     # thr broadcasts over lanes

    for j in range(_PB_M):
        # moments-MAJOR output [16, Gp]: cells ride the 128-lane axis, so
        # the downstream derotation (moments_to_features) runs full-width
        # VPU ops — the old [K, G, 10] layout padded 10 -> 128 lanes (12x)
        # on every elementwise op AND needed an unpack transpose.
        m = jax.lax.dot_general(
            psis[j], ok[:, j * p : (j + 1) * p],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # [16, Gp]
        out_ref[j] = m


@functools.partial(
    jax.jit, static_argnames=("radius", "interpret", "moments_major")
)
def spt_moments_pallas(
    patches: jnp.ndarray,       # [K, P, 3] normalized offsets
    patches_mask: jnp.ndarray,  # [K, P]
    cells: jnp.ndarray,         # [G, 3]
    radius: float,
    interpret: bool = False,
    moments_major: bool = False,
) -> jnp.ndarray:
    """Raw per-cell moments: [K, 10, G] when ``moments_major`` (the
    serving layout — cells on lanes, a pure slice of the kernel output),
    else [K, G, 10] (one transpose, compatibility layout).

    Counts stay exact (0/1 in bf16, f32 MXU accumulation); coordinate
    moments carry bf16 rounding — the same precision the descriptor conv
    stack runs at.
    """
    from bufferx_tpu.geometry.moments import NUM_MOMENTS

    k, p, _ = patches.shape
    g = cells.shape[0]
    gp = (g + 7) // 8 * 8
    p_pad = (p + 127) // 128 * 128
    k_pad = (k + _PB_M - 1) // _PB_M * _PB_M

    rows = jnp.zeros((k_pad, 8, p_pad), patches.dtype)
    rows = rows.at[:k, :3, :p].set(jnp.swapaxes(patches, 1, 2))
    rows = rows.at[:k, 3, :p].set(patches_mask.astype(patches.dtype))
    cells_t = jnp.zeros((gp, 8), cells.dtype).at[:g, :3].set(cells)

    out = pl.pallas_call(
        functools.partial(
            _moments_kernel, radius2=float(radius) ** 2, num_cells=g
        ),
        grid=(k_pad // _PB_M,),
        in_specs=[
            pl.BlockSpec((gp, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_PB_M, 8, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_PB_M, 16, gp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, 16, gp), jnp.float32),
        interpret=interpret,
    )(cells_t, rows)

    if moments_major:
        return out[:k, :NUM_MOMENTS, :g]
    return jnp.transpose(out[:k, :NUM_MOMENTS, :g], (0, 2, 1))
