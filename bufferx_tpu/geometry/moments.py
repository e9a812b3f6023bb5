"""Dense moment pooling for the spatial point transformer ("moments" mode).

TPU-first alternative to the sampled SPT (``spatial_point_transformer``):
instead of selecting ``nsample`` random in-radius points per cylindrical
cell and running a point-MLP over them (the reference design,
``/root/reference/models/patch_embedder.py:150-165`` +
``utils/common.py:422-498``), pool **exact geometric moments over every
in-radius point**:

    per cell c:  N_c = sum 1,  S1_c = sum x,  S2_c = sum x x^T

This is a single MXU matmul per patch — ``ok [G, P] @ psi [P, 10]`` with
``psi(x) = [x, y, z, x2, y2, z2, xy, yz, zx, 1]`` — and shrinks the SPT
output from [K, G, nsample, 3] (the pipeline's largest tensor) to
[K, G, 10]. The derotation of ``var_to_invar`` commutes with the pooling
(sums of rotated points = rotated sums), so it is applied to the pooled
moments: first moments as vectors, second moments as rank-2 tensors.

The pooled population differs from the reference's (all in-radius points
vs. ``nsample`` random samples), so descriptors trained in one mode are not
interchangeable with the other; the mode is selected by
``cfg.patch.desc_mode`` and baked into the checkpoint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bufferx_tpu.core.se3 import rotation_z
from bufferx_tpu.geometry.cylindrical import grid_cell_centers

__all__ = [
    "point_moment_features",
    "pool_cell_moments",
    "moments_to_features",
    "moments_to_features_mm",
]

NUM_MOMENTS = 10  # Sx Sy Sz Sxx Syy Szz Sxy Syz Szx N


def point_moment_features(patches: jnp.ndarray, mask: jnp.ndarray,
                          lanes: int = NUM_MOMENTS) -> jnp.ndarray:
    """psi(x) per point, zeroed for invalid slots: [..., P, lanes].

    Lane layout: [x, y, z, x2, y2, z2, xy, yz, zx, 1] (+ zero padding).
    Folding the validity mask into psi means the pooling matmul needs no
    separate mask operand: invalid points contribute exactly zero to every
    moment even when their (zero) offset falls inside a central cell.
    """
    x, y, z = patches[..., 0], patches[..., 1], patches[..., 2]
    one = jnp.ones_like(x)
    psi = jnp.stack(
        [x, y, z, x * x, y * y, z * z, x * y, y * z, z * x, one], axis=-1
    )
    if lanes > NUM_MOMENTS:
        psi = jnp.pad(psi, [(0, 0)] * (psi.ndim - 1) + [(0, lanes - NUM_MOMENTS)])
    return psi * mask[..., None].astype(psi.dtype)


def _pool_one(patch, mask, cells, radius):
    """[P, 3], [P] -> raw cell moments [G, 10] (pure-jax oracle path)."""
    d2 = (
        jnp.sum(cells * cells, axis=-1, keepdims=True)
        - 2.0 * jnp.einsum("gd,pd->gp", cells, patch,
                           precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(patch * patch, axis=-1)[None, :]
    )
    ok = (d2 <= radius * radius).astype(jnp.float32)        # [G, P]
    psi = point_moment_features(patch, mask)                 # [P, 10]
    return jnp.dot(ok, psi, precision=jax.lax.Precision.HIGHEST)


@functools.partial(
    jax.jit,
    static_argnames=("rad_n", "ele_n", "azi_n", "delta", "chunk",
                     "moments_major"),
)
def pool_cell_moments(
    patches: jnp.ndarray,       # [K, P, 3] normalized (unit-radius) offsets
    patches_mask: jnp.ndarray,  # [K, P]
    rad_n: int,
    ele_n: int,
    azi_n: int,
    delta: float,
    chunk: int = 256,
    moments_major: bool = False,
) -> jnp.ndarray:
    """Raw per-cell moments over ALL in-radius patch points.

    Layout: [K, 10, G] when ``moments_major`` (serving — cells ride the
    TPU lane axis so downstream elementwise work runs full-width; the
    old [K, G, 10] layout pads 10 -> 128 lanes on every op), else
    [K, G, 10].

    Ball radius = ``delta / rad_n`` on the unit patch (same cell geometry as
    the sampled SPT). Dispatches to the fused Pallas kernel on TPU; the
    pure-jax path below is the oracle and the CPU/GPU fallback.
    """
    k, p = patches.shape[0], patches.shape[1]
    cells = jnp.asarray(grid_cell_centers(rad_n, ele_n, azi_n))
    g = cells.shape[0]
    radius = delta / rad_n

    if jax.default_backend() == "tpu":
        from bufferx_tpu.geometry.spt_pallas import spt_moments_pallas

        return spt_moments_pallas(
            patches, patches_mask, cells, radius,
            moments_major=moments_major,
        )

    def run_chunk(args):
        pa, ma = args
        return jax.vmap(lambda pp, mm: _pool_one(pp, mm, cells, radius))(pa, ma)

    n_chunks = (k + chunk - 1) // chunk
    pad = n_chunks * chunk - k
    pa = jnp.pad(patches, ((0, pad), (0, 0), (0, 0)))
    ma = jnp.pad(patches_mask, ((0, pad), (0, 0)))
    out = jax.lax.map(
        run_chunk,
        (pa.reshape(n_chunks, chunk, p, 3), ma.reshape(n_chunks, chunk, p)),
    ).reshape(n_chunks * chunk, g, NUM_MOMENTS)[:k]
    return jnp.transpose(out, (0, 2, 1)) if moments_major else out


@functools.partial(jax.jit, static_argnames=("rad_n", "ele_n", "azi_n", "delta"))
def moments_to_features(
    raw: jnp.ndarray,  # [K, G, 10] raw cell moments
    rad_n: int,
    ele_n: int,
    azi_n: int,
    delta: float,
) -> jnp.ndarray:
    """Derotate + normalize raw moments into descriptor-net inputs [K, G, 10].

    Derotation (the moment-space ``var_to_invar``): cell at azimuth bin i is
    rotated by R_z(-i * 2pi / azi_n) — first moments as vectors, second
    moments as tensors M -> R M R^T. Features per cell:

      [count_norm, (mean - canon_center) / cell_r (3), cov / cell_r^2 (6)]

    with ``cell_r = delta / rad_n`` (the query-ball radius), so offsets and
    covariances are O(1); empty cells are all-zero (the reference's
    empty-slot convention).
    """
    k = raw.shape[0]
    hp = jax.lax.Precision.HIGHEST
    raw = raw.reshape(k, rad_n, ele_n, azi_n, NUM_MOMENTS)
    s1 = raw[..., 0:3]                                      # [K,r,e,a,3]
    n = raw[..., 9]
    # symmetric second-moment components
    sxx, syy, szz = raw[..., 3], raw[..., 4], raw[..., 5]
    sxy, syz, szx = raw[..., 6], raw[..., 7], raw[..., 8]

    angles = -2.0 * jnp.pi / azi_n * jnp.arange(azi_n, dtype=raw.dtype)
    R = rotation_z(angles)                                   # [a, 3, 3]
    # R_z derotation written as explicit trig arithmetic, NOT einsum: the
    # einsum forms ("aij,kreaj->kreai" etc.) lower to dot_generals with
    # batch dims (k,r,e,a) of 3x3 operands — tens of millions of 3-wide
    # matmuls that run ~10x slower than these plain broadcasts on TPU
    # (MICRO_r4.jsonl: 9.5 ms/pair for ~0.1 ms of VPU work).
    ca = jnp.cos(angles)[None, None, None, :]                # [1,1,1,a]
    sa = jnp.sin(angles)[None, None, None, :]

    def rot_vec(v):
        """R_z(angle) @ v over the trailing xyz axis."""
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        return jnp.stack([ca * x - sa * y, sa * x + ca * y, z], axis=-1)

    s1 = rot_vec(s1)
    # symmetric tensor: M' = R M R^T, expanded per component
    c2, s2, cs = ca * ca, sa * sa, ca * sa
    xx_r = c2 * sxx - 2.0 * cs * sxy + s2 * syy
    yy_r = s2 * sxx + 2.0 * cs * sxy + c2 * syy
    xy_r = cs * (sxx - syy) + (c2 - s2) * sxy
    zx_r = ca * szx - sa * syz
    yz_r = sa * szx + ca * syz
    zz_r = szz

    centers = jnp.asarray(grid_cell_centers(rad_n, ele_n, azi_n))
    centers = centers.reshape(rad_n, ele_n, azi_n, 3)
    canon = jnp.einsum("aij,reaj->reai", R, centers, precision=hp)  # [r,e,a,3]

    cell_r = delta / rad_n
    n_safe = jnp.maximum(n, 1.0)
    mean = s1 / n_safe[..., None]
    mx, my, mz = mean[..., 0], mean[..., 1], mean[..., 2]
    off = (mean - canon[None]) / cell_r
    inv_ncr2 = 1.0 / (n_safe * (cell_r * cell_r))
    icr2 = 1.0 / (cell_r * cell_r)
    cov6 = jnp.stack(
        [xx_r * inv_ncr2 - mx * mx * icr2,
         yy_r * inv_ncr2 - my * my * icr2,
         zz_r * inv_ncr2 - mz * mz * icr2,
         xy_r * inv_ncr2 - mx * my * icr2,
         yz_r * inv_ncr2 - my * mz * icr2,
         zx_r * inv_ncr2 - mz * mx * icr2],
        axis=-1,
    )
    density = jnp.log1p(n)[..., None] * 0.25
    feats = jnp.concatenate([density, off, cov6], axis=-1)   # [K,r,e,a,10]
    feats = jnp.where(n[..., None] > 0.0, feats, 0.0)
    return feats.reshape(k, rad_n * ele_n * azi_n, NUM_MOMENTS)


@functools.partial(jax.jit, static_argnames=("rad_n", "ele_n", "azi_n", "delta"))
def moments_to_features_mm(
    raw: jnp.ndarray,  # [K, 10, G] raw cell moments (moments-major)
    rad_n: int,
    ele_n: int,
    azi_n: int,
    delta: float,
) -> jnp.ndarray:
    """Moments-major twin of :func:`moments_to_features`: [K, 10, G] in,
    [K, 10, G] out (feature channels on the sublane axis, cells on the
    lane axis).

    Same math; the layout is the point: with G on the 128-lane axis every
    elementwise op runs at full vector width, whereas the [K, G, 10]
    layout pads its 10-wide minor axis to 128 lanes (12x wasted lanes AND
    12x padded intermediate tiles — MICRO_r4b.jsonl measured the standard
    layout at 7.3 ms/pair for ~0.2 ms of arithmetic). The azimuth-
    dependent trig coefficients become plain [1, G] lane broadcasts.
    """
    k = raw.shape[0]
    g = rad_n * ele_n * azi_n
    hp = jax.lax.Precision.HIGHEST
    # per-cell azimuth angle: cell index = (r * ele_n + e) * azi_n + a
    a_idx = jnp.arange(g, dtype=jnp.int32) % azi_n
    angles_a = -2.0 * jnp.pi / azi_n * jnp.arange(azi_n, dtype=raw.dtype)
    ca = jnp.cos(angles_a)[a_idx][None, :]                   # [1, G]
    sa = jnp.sin(angles_a)[a_idx][None, :]

    sx, sy, sz = raw[:, 0], raw[:, 1], raw[:, 2]             # [K, G]
    sxx, syy, szz = raw[:, 3], raw[:, 4], raw[:, 5]
    sxy, syz, szx = raw[:, 6], raw[:, 7], raw[:, 8]
    n = raw[:, 9]

    s1x = ca * sx - sa * sy
    s1y = sa * sx + ca * sy
    s1z = sz
    c2, s2, cs = ca * ca, sa * sa, ca * sa
    xx_r = c2 * sxx - 2.0 * cs * sxy + s2 * syy
    yy_r = s2 * sxx + 2.0 * cs * sxy + c2 * syy
    xy_r = cs * (sxx - syy) + (c2 - s2) * sxy
    zx_r = ca * szx - sa * syz
    yz_r = sa * szx + ca * syz
    zz_r = szz

    from bufferx_tpu.core.se3 import rotation_z
    from bufferx_tpu.geometry.cylindrical import grid_cell_centers

    R = rotation_z(angles_a)                                 # [a, 3, 3]
    centers = jnp.asarray(grid_cell_centers(rad_n, ele_n, azi_n))
    canon = jnp.einsum(
        "gij,gj->gi", R[a_idx], centers, precision=hp
    )                                                        # [G, 3]

    cell_r = delta / rad_n
    n_safe = jnp.maximum(n, 1.0)
    inv_n = 1.0 / n_safe
    mx, my, mz = s1x * inv_n, s1y * inv_n, s1z * inv_n
    icr = 1.0 / cell_r
    offx = (mx - canon[None, :, 0]) * icr
    offy = (my - canon[None, :, 1]) * icr
    offz = (mz - canon[None, :, 2]) * icr
    icr2 = icr * icr
    inv_ncr2 = inv_n * icr2
    feats = jnp.stack(
        [jnp.log1p(n) * 0.25,
         offx, offy, offz,
         xx_r * inv_ncr2 - mx * mx * icr2,
         yy_r * inv_ncr2 - my * my * icr2,
         zz_r * inv_ncr2 - mz * mz * icr2,
         xy_r * inv_ncr2 - mx * my * icr2,
         yz_r * inv_ncr2 - my * mz * icr2,
         zx_r * inv_ncr2 - mz * mx * icr2],
        axis=1,
    )                                                        # [K, 10, G]
    return jnp.where(n[:, None, :] > 0.0, feats, 0.0)
