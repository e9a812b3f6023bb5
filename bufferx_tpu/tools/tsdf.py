"""TSDF volume fusion (offline fragment generation).

JAX replacement for the reference's CUDA ``Integrate`` kernel
(``/root/reference/dataset/scannetpp/iphone/scannetpp.cu:24-120``): project
every voxel center into each depth frame, compute the truncated signed
distance along the camera ray, and fold it into a weighted running average.
One jitted call per frame; the volume stays on device. Fragment extraction
returns the near-surface voxel centers (|tsdf| below a band, weight > 0),
the same crossing-band criterion the reference's cloud export uses.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TsdfVolume", "make_volume", "integrate_frame", "extract_points"]

_MAX_DEPTH = 6.0  # reference's depth validity cap (scannetpp.cu:60)


class TsdfVolume(NamedTuple):
    tsdf: jnp.ndarray      # [X, Y, Z] f32, init 1.0
    weight: jnp.ndarray    # [X, Y, Z] f32, init 0.0
    origin: jnp.ndarray    # [3]
    voxel_size: float
    trunc: float


def make_volume(origin, dims, voxel_size: float, trunc: float | None = None):
    dims = tuple(int(d) for d in dims)
    return TsdfVolume(
        tsdf=jnp.ones(dims, jnp.float32),
        weight=jnp.zeros(dims, jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        voxel_size=float(voxel_size),
        trunc=float(trunc if trunc is not None else 5 * voxel_size),
    )


@functools.partial(jax.jit, static_argnames=("dims",))
def _integrate(tsdf, weight, origin, voxel_size, trunc, cam_k, cam2base,
               depth, dims):
    x, y, z = dims
    gx, gy, gz = jnp.meshgrid(
        jnp.arange(x), jnp.arange(y), jnp.arange(z), indexing="ij"
    )
    pts = origin[None] + voxel_size * jnp.stack(
        [gx.ravel(), gy.ravel(), gz.ravel()], axis=-1
    ).astype(jnp.float32)                                   # [N, 3] base frame

    # base -> camera: the reference stores cam2base and applies its
    # transpose-rotation inverse in-kernel (scannetpp.cu:40-46)
    R = cam2base[:3, :3]
    t = cam2base[:3, 3]
    cam = (pts - t) @ R                                      # R^T (p - t)
    zc = cam[:, 2]
    u = jnp.round(cam_k[0, 0] * cam[:, 0] / zc + cam_k[0, 2]).astype(jnp.int32)
    v = jnp.round(cam_k[1, 1] * cam[:, 1] / zc + cam_k[1, 2]).astype(jnp.int32)

    h, w = depth.shape
    in_img = (zc > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    ui = jnp.clip(u, 0, w - 1)
    vi = jnp.clip(v, 0, h - 1)
    d = depth[vi, ui]
    valid = in_img & (d > 0) & (d <= _MAX_DEPTH)

    diff = d - zc
    valid = valid & (diff > -trunc)
    dist = jnp.clip(diff / trunc, -1.0, 1.0)

    tsdf_f = tsdf.ravel()
    w_f = weight.ravel()
    w_new = w_f + valid.astype(jnp.float32)
    tsdf_new = jnp.where(
        valid,
        (tsdf_f * w_f + dist) / jnp.maximum(w_new, 1.0),
        tsdf_f,
    )
    w_out = jnp.where(valid, w_new, w_f)
    return tsdf_new.reshape(dims), w_out.reshape(dims)


def integrate_frame(vol: TsdfVolume, cam_k, cam2base, depth) -> TsdfVolume:
    """Folds one depth frame into the volume.

    cam_k: [3,3] intrinsics; cam2base: [4,4] camera-to-base pose;
    depth: [H, W] meters (0 = invalid)."""
    tsdf, weight = _integrate(
        vol.tsdf, vol.weight, vol.origin,
        jnp.float32(vol.voxel_size), jnp.float32(vol.trunc),
        jnp.asarray(cam_k, jnp.float32), jnp.asarray(cam2base, jnp.float32),
        jnp.asarray(depth, jnp.float32), vol.tsdf.shape,
    )
    return vol._replace(tsdf=tsdf, weight=weight)


def extract_points(vol: TsdfVolume, band: float = 0.2) -> np.ndarray:
    """Near-surface voxel centers -> [N, 3] float32 (host)."""
    tsdf = np.asarray(vol.tsdf)
    w = np.asarray(vol.weight)
    mask = (np.abs(tsdf) < band) & (w > 0)
    idx = np.argwhere(mask)
    return (
        np.asarray(vol.origin)[None] + vol.voxel_size * idx
    ).astype(np.float32)
