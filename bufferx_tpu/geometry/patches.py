"""Patch extraction around keypoints.

Replaces ``MiniSpinNet.select_patches``
(``/root/reference/models/patch_embedder.py:92-120``): gather up to
``patch_sample`` random in-radius cloud points per keypoint; slots with no
point get the keypoint's own coordinates (so their keypoint-relative offset
is exactly zero — the masking convention the LRF covariance and the SPT rely
on).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bufferx_tpu.kernels.neighbors import ball_query

__all__ = ["select_patches"]


@functools.partial(jax.jit, static_argnames=("patch_sample", "use_approx"))
def select_patches(
    pts: jnp.ndarray,
    pts_mask: jnp.ndarray,
    kpts: jnp.ndarray,
    radius: jnp.ndarray,
    key: jax.Array,
    patch_sample: int,
    use_approx: bool = True,
    d2: jnp.ndarray | None = None,
):
    """Returns (patches [K, P, 3] absolute coords, patch_mask [K, P]).

    ``d2``: optional precomputed [K, N] squared keypoint-to-cloud distances
    (shared across scales by the pipeline)."""
    idx, valid = ball_query(
        pts, pts_mask, kpts, radius, key, patch_sample,
        use_approx=use_approx, d2=d2,
    )
    gathered = pts[idx]                                   # [K, P, 3]
    patches = jnp.where(valid[..., None], gathered, kpts[:, None, :])
    return patches, valid
