"""Fused multi-radius stratified ball query (Pallas TPU kernel).

The XLA formulation of :func:`bufferx_tpu.kernels.neighbors.
ball_query_stratified` runs once PER SCALE: each call re-reads the dense
[K, N] distance matrix from HBM (181 MB per cloud at production shapes)
and XLA materializes several [K, L, S]-sized intermediates (score /
one-hot / select), putting the stage ~6x above its traffic bound
(MICRO_r4b.jsonl: 5.3 ms/pair/scale). This kernel fuses the WHOLE
selection for ALL scales into one pass over d2:

- d2 is read once per cloud (not once per scale); every intermediate
  lives in VMEM at [Kt, S] tile granularity;
- the per-strip winner for every radius is found with a single packed
  int32 min-reduction: ``value = cyclic_rank << 24 | quantized_coord``
  — the rank occupies the high bits (it decides the winner; ranks are
  unique within a strip so there are no ties), and the winner's
  coordinate rides along in the low 24 bits, eliminating the separate
  one-hot/select pass entirely. Coordinates quantize to the cloud's
  bounding box at 2^-24 of its extent (< 1 um at room scale) — decoded
  outside the kernel;
- the random strip offsets are SHARED across scales (one stratified
  draw per (center, strip)); each scale still selects independently
  through its own in-radius test.

The pure-jax reference implementation (``_multi_reference`` — used on
CPU and in tests) computes the identical packed formulation, so the two
backends agree bit-exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ball_query_stratified_multi"]

_KT = 32           # centers per grid program
_QBITS = 24
_QMASK = (1 << _QBITS) - 1


def _quantize(pts: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Per-coordinate bbox quantization to _QBITS over VALID rows only
    (zero padding rows would otherwise inflate the box toward the origin
    for off-origin clouds, costing resolution). Returns (q [N,3] int32,
    lo [3], res [3])."""
    if mask is None:
        lo = jnp.min(pts, axis=0)
        hi = jnp.max(pts, axis=0)
    else:
        m = mask[:, None]
        lo = jnp.min(jnp.where(m, pts, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(m, pts, -jnp.inf), axis=0)
        # all-invalid cloud: fall back to a degenerate box at the origin
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
    res = jnp.maximum(hi - lo, 1e-9) / _QMASK
    q = jnp.clip(
        jnp.round((pts - lo) / res), 0, _QMASK
    ).astype(jnp.int32)
    return q, lo, res


def _decode(packed, centers, lo, res, l):
    """packed [R, 3, K, S] int32 -> (patches [R, K, S, 3], valid [R, K, S])."""
    score = packed[:, 0] >> _QBITS                    # [R, K, S]
    valid = score < l
    q = (packed & _QMASK).astype(jnp.float32)         # [R, 3, K, S]
    x = lo[None, :, None, None] + q * res[None, :, None, None]
    patches = jnp.moveaxis(x, 1, -1)                  # [R, K, S, 3]
    patches = jnp.where(
        valid[..., None], patches, centers[None, :, None, :]
    )
    return patches, valid


def _multi_reference(d2, q, off, radii2, nsample):
    """Pure-jax packed formulation (bit-identical to the kernel)."""
    kq, n = d2.shape
    s = nsample
    l = n // s
    d2s = d2.reshape(kq, l, s)
    q_s = q.reshape(l, s, 3)
    pos = jnp.arange(l, dtype=jnp.int32)[None, :, None]      # [1, L, 1]
    rank = pos - off[:, None, :]
    rank = jnp.where(rank < 0, rank + l, rank)               # [K, L, S]
    outs = []
    for r in range(radii2.shape[0]):
        in_r = d2s <= radii2[r]
        score = jnp.where(in_r, rank, l)                     # [K, L, S]
        base = score << _QBITS
        per_c = [
            jnp.min(base + q_s[None, :, :, c], axis=1)       # [K, S]
            for c in range(3)
        ]
        outs.append(jnp.stack(per_c))                        # [3, K, S]
    return jnp.stack(outs)                                   # [R, 3, K, S]


def _kernel(radii_ref, d2_ref, off_ref, q_ref, out_ref, *,
            num_r: int, nsample: int, num_l: int):
    """radii_ref [R8, S] f32 (radius^2 broadcast along lanes — Mosaic
    cannot broadcast a [1,1] into both sublanes and lanes); d2_ref
    [Kt, N]; off_ref [Kt, S] int32; q_ref [3, L, S] int32;
    out_ref [R, 3, Kt, S] int32."""
    kt = d2_ref.shape[0]
    s = nsample
    l = num_l
    accs = [
        [jnp.full((kt, s), jnp.int32(0x7FFFFFFF)) for _ in range(3)]
        for _ in range(num_r)
    ]
    off = off_ref[:, :]
    for li in range(l):
        d2_l = d2_ref[:, li * s : (li + 1) * s]              # [Kt, S]
        rank = jnp.int32(li) - off
        rank = jnp.where(rank < 0, rank + l, rank)           # [Kt, S]
        for r in range(num_r):
            in_r = d2_l <= radii_ref[r : r + 1, :]     # [1, S] row
            score = jnp.where(in_r, rank, l)
            base = score << _QBITS
            for c in range(3):
                qc = q_ref[c, li, :].reshape(1, s)           # [1, S]
                accs[r][c] = jnp.minimum(accs[r][c], base + qc)
    for r in range(num_r):
        for c in range(3):
            out_ref[r, c, :, :] = accs[r][c]


@functools.partial(
    jax.jit, static_argnames=("nsample", "interpret", "force_pallas")
)
def ball_query_stratified_multi(
    pts: jnp.ndarray,        # [N, 3]
    pts_mask: jnp.ndarray,   # [N] (already folded into d2's fill)
    centers: jnp.ndarray,    # [K, 3]
    radii: jnp.ndarray,      # [R] search radii (one per scale)
    key: jax.Array,
    nsample: int,
    d2: jnp.ndarray,         # [K, N] masked squared distances
    interpret: bool = False,
    force_pallas: bool = False,
):
    """Stratified ball query for ALL radii in one pass over ``d2``.

    Returns (patches [R, K, nsample, 3], valid [R, K, nsample]).
    Selection semantics per radius match
    :func:`~bufferx_tpu.kernels.neighbors.ball_query_stratified` with the
    strip offsets shared across radii; coordinates are bbox-quantized to
    2^-24 of the cloud extent (sub-um at room scale). Requires
    ``N % nsample == 0``.
    """
    kq, n = d2.shape
    s = nsample
    assert n % s == 0, "cloud capacity must divide nsample"
    l = n // s
    # the packed encoding is score << _QBITS | coord in int32: scores run
    # 0..l inclusive, so l must fit the (31 - _QBITS) bits above the
    # coordinate field or the sign bit silently corrupts the min-reduction
    assert l < (1 << (31 - _QBITS)), (
        f"max_points/nsample = {l} overflows the packed int32 encoding "
        f"(must be < {1 << (31 - _QBITS)}); use a larger nsample or the "
        "per-scale query path"
    )
    num_r = radii.shape[0]
    q, lo, res = _quantize(pts, pts_mask)
    off = jax.random.randint(key, (kq, s), 0, l, dtype=jnp.int32)
    radii2 = (radii * radii).astype(jnp.float32)

    use_pallas = force_pallas or (
        jax.default_backend() == "tpu" and not interpret
    )
    if not use_pallas and not interpret:
        packed = _multi_reference(d2, q, off, radii2, s)
        return _decode(packed, centers, lo, res, l)

    k_pad = (kq + _KT - 1) // _KT * _KT
    d2_p = jnp.pad(d2, ((0, k_pad - kq), (0, 0)), constant_values=1e30)
    off_p = jnp.pad(off, ((0, k_pad - kq), (0, 0)))
    q_t = jnp.transpose(q.reshape(l, s, 3), (2, 0, 1))       # [3, L, S]
    r_pad = max((num_r + 7) // 8 * 8, 8)
    radii_arr = jnp.zeros((r_pad, s), jnp.float32).at[:num_r, :].set(
        jnp.broadcast_to(radii2[:, None], (num_r, s))
    )

    packed = pl.pallas_call(
        functools.partial(_kernel, num_r=num_r, nsample=s, num_l=l),
        grid=(k_pad // _KT,),
        in_specs=[
            pl.BlockSpec((max(8, (radii.shape[0] + 7) // 8 * 8), s),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_KT, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_KT, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, l, s), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_r, 3, _KT, s), lambda i: (0, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((num_r, 3, k_pad, s), jnp.int32),
        interpret=interpret,
    )(radii_arr, d2_p, off_p, q_t)

    return _decode(packed[:, :, :kq], centers, lo, res, l)
