"""Local reference frame (LRF) estimation for patch descriptors.

Reimplements the reference's z-axis alignment
(``/root/reference/models/patch_embedder.py:122-148`` ``axis_align`` +
``utils/common.py:709-726`` ``cal_Z_axis``): the patch normal is the
smallest-eigenvalue direction of the *uncentered* covariance of keypoint-
relative offsets (closed-form 3x3 eigendecomposition replaces the
``torch_batch_svd`` CUDA dependency), disambiguated to point toward the
sensor origin, then patches are rotated so the normal becomes +z.

Masked slots must carry zero offsets (they then contribute nothing to the
covariance) — :func:`bufferx_tpu.geometry.patches.select_patches` guarantees
this by substituting the keypoint itself into invalid slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bufferx_tpu.core.linalg import rodrigues_a_to_b, smallest_eigvec_3x3

__all__ = ["compute_z_axis", "align_patches"]


def compute_z_axis(delta: jnp.ndarray, ref_point: jnp.ndarray) -> jnp.ndarray:
    """Patch normals from keypoint-relative offsets.

    delta: [K, P, 3] offsets (invalid slots zero); ref_point: [K, 3] keypoint
    coordinates in the cloud frame (used for sign disambiguation: the normal
    points so that ``dot(-z, ref_point) >= 0``, i.e. toward the origin).
    """
    cov = jnp.einsum(
        "kpi,kpj->kij", delta, delta, precision=jax.lax.Precision.HIGHEST
    )
    z = smallest_eigvec_3x3(cov)
    flip = jnp.sum(-z * ref_point, axis=-1) < 0.0
    z = jnp.where(flip[:, None], -z, z)
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)


def align_patches(
    delta: jnp.ndarray,
    kpts: jnp.ndarray,
    is_aligned_to_global_z: jnp.ndarray,
):
    """Rotate patches into their LRF (or keep the global frame).

    delta: [K, P, 3] keypoint-relative offsets; kpts: [K, 3];
    is_aligned_to_global_z: traced bool scalar — when True the cloud's +z is
    already gravity-aligned (outdoor LiDAR) and the LRF is skipped, matching
    ``axis_align``'s two branches. Both branches are computed and selected
    with ``where`` so indoor/outdoor share one compiled program.

    Returns (aligned_delta [K, P, 3], rand_axis [K, 3], R [K, 3, 3]) where
    ``rand_axis`` is the in-plane reference direction used by the SO(2)
    ground-truth labeler and R maps patch offsets into the LRF via
    ``delta @ R``.
    """
    k = delta.shape[0]
    z_hat = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], delta.dtype), (k, 3))

    # LRF branch
    z = compute_z_axis(delta, kpts)
    R_lrf = rodrigues_a_to_b(z, z_hat)
    delta_lrf = jnp.einsum(
        "kpi,kij->kpj", delta, R_lrf, precision=jax.lax.Precision.HIGHEST
    )
    rand_lrf = jnp.cross(z, z_hat)
    rand_lrf = rand_lrf / jnp.maximum(
        jnp.linalg.norm(rand_lrf, axis=-1, keepdims=True), 1e-12
    )

    # global-z branch
    R_id = jnp.broadcast_to(jnp.eye(3, dtype=delta.dtype), (k, 3, 3))
    rand_id = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], delta.dtype), (k, 3))

    aligned = jnp.asarray(is_aligned_to_global_z)
    out_delta = jnp.where(aligned, delta, delta_lrf)
    out_rand = jnp.where(aligned, rand_id, rand_lrf)
    out_R = jnp.where(aligned, R_id, R_lrf)
    return out_delta, out_rand, out_R
