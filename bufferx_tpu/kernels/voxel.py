"""Voxel-grid downsampling (barycenter per occupied voxel).

Replaces both the reference's Open3D ``voxel_down_sample`` calls in the
loaders (``dataset/threedmatch.py:90,128``) and the ``grid_subsampling`` C++
extension (``cpp_wrappers/cpp_subsampling/grid_subsampling.cpp:4-107``).

Two implementations with identical semantics:

- ``voxel_downsample``: device-side, static-shape. Sort points by packed
  voxel id, mark segment starts, scatter-add into a fixed-capacity output —
  all segment-ops XLA compiles well on TPU. Output order = first-occurrence
  order of voxels in the *sorted* stream (i.e. voxel-id order).
- ``voxel_downsample_np``: host-side numpy (``np.unique``) for the input
  pipeline, where clouds are still ragged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["voxel_downsample", "voxel_downsample_np"]

_BITS = 21  # 3 * 21 = 63 bits: supports grids up to 2M cells per axis


@functools.partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    voxel_size: jnp.ndarray,
    capacity: int,
):
    """Barycenter voxel downsample with fixed output capacity.

    xyz: [N, 3]; mask: [N]; voxel_size: scalar (traced ok). Returns
    (out_xyz [capacity, 3], out_mask [capacity]). If more than ``capacity``
    voxels are occupied, the excess (highest voxel ids) is dropped.
    """
    origin = jnp.min(jnp.where(mask[:, None], xyz, jnp.inf), axis=0)
    cell = jnp.floor((xyz - origin) / voxel_size).astype(jnp.int32)
    # int32 per-axis cells sorted lexicographically — no 64-bit packing
    # needed (jax x64 is off by default). Padded points sort last.
    big = jnp.int32(2**30)
    cell = jnp.where(mask[:, None], jnp.clip(cell, 0, big - 1), big)

    order = jnp.lexsort((cell[:, 2], cell[:, 1], cell[:, 0]))
    cell_s = cell[order]
    xyz_s = xyz[order]
    mask_s = mask[order]

    changed = jnp.any(cell_s[1:] != cell_s[:-1], axis=-1)
    new_seg = jnp.concatenate([jnp.ones((1,), bool), changed]) & mask_s
    seg_idx = jnp.cumsum(new_seg.astype(jnp.int32)) - 1          # [N]
    in_cap = mask_s & (seg_idx < capacity) & (seg_idx >= 0)
    tgt = jnp.where(in_cap, seg_idx, capacity)                    # overflow row

    zeros = jnp.zeros((capacity + 1, 3), xyz.dtype)
    sums = zeros.at[tgt].add(jnp.where(in_cap[:, None], xyz_s, 0.0))[:capacity]
    cnts = (
        jnp.zeros((capacity + 1,), jnp.int32)
        .at[tgt]
        .add(in_cap.astype(jnp.int32))[:capacity]
    )
    out_mask = cnts > 0
    out_xyz = sums / jnp.maximum(cnts, 1)[:, None]
    return out_xyz, out_mask


def voxel_downsample_np(xyz: np.ndarray, voxel_size: float) -> np.ndarray:
    """Host-side barycenter voxel downsample (ragged in, ragged out)."""
    if len(xyz) == 0:
        return xyz
    cell = np.floor((xyz - xyz.min(axis=0)) / voxel_size).astype(np.int64)
    vid = (cell[:, 0] << (2 * _BITS)) | (cell[:, 1] << _BITS) | cell[:, 2]
    uniq, inv, cnt = np.unique(vid, return_inverse=True, return_counts=True)
    sums = np.zeros((len(uniq), 3), xyz.dtype)
    np.add.at(sums, inv, xyz)
    return sums / cnt[:, None]
