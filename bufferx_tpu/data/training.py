"""Training batch assembly (host -> fixed-shape device batches).

Implements the loader-side of the training contract (SURVEY §2.5): two
downsampling levels (fds for patch extraction, sds for supervision
keypoints), GT-correspondence sampling, randomized descriptor radius
(``models/BUFFERX.py:175-198``), SE(3)/jitter augmentation
(``dataset/threedmatch.py:104-107``).
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.config import Config
from bufferx_tpu.data.modelnet import synthetic_pair
from bufferx_tpu.kernels.voxel import voxel_downsample_np
from bufferx_tpu.train.forward import sample_gt_correspondences

__all__ = [
    "build_training_batch",
    "synthetic_training_stream",
    "random_des_r",
    "rotate_pair",
]


def _pad(xyz: np.ndarray, cap: int, rs: np.random.RandomState):
    xyz = np.asarray(xyz, np.float32)
    if len(xyz) > cap:
        xyz = xyz[rs.choice(len(xyz), cap, replace=False)]
    else:
        xyz = xyz[rs.permutation(len(xyz))]
    out = np.zeros((cap, 3), np.float32)
    out[: len(xyz)] = xyz
    mask = np.zeros(cap, bool)
    mask[: len(xyz)] = True
    return out, mask


def _random_rotation(rs: np.random.RandomState, mode: str) -> np.ndarray:
    """Uniform random rotation matrix: full SO(3) or about +z (SO(2))."""
    if mode == "so2":
        th = rs.uniform(0.0, 2.0 * np.pi)
        c, s = np.cos(th), np.sin(th)
        return np.array(
            [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float32
        )
    # uniform SO(3) via a random unit quaternion
    q = rs.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def rotate_pair(
    src_pts: np.ndarray,
    tgt_pts: np.ndarray,
    gt_pose: np.ndarray,
    rs: np.random.RandomState,
    mode: str,
):
    """Cloud-level rotation augmentation with GT conjugation.

    Independent random rotations Rs/Rt applied to each cloud (the
    reference rotates both training halves: SO(3) for 3DMatch at
    ``dataset/threedmatch.py:104-107``, SO(2)-about-z for KITTI at
    ``dataset/kitti.py:142-148``). With src' = Rs·src + ds and
    tgt' = Rt·tgt + dt the pose mapping src'->tgt' is
    R' = Rt·R·Rs^T, t' = Rt·t + dt - R'·ds.

    Each cloud is also pushed OFF-ORIGIN by a random offset of ~3x its
    bounding radius. This reproduces the reference's sensor-frame
    geometry: its fragments live in camera coordinates 0.5-4 m in front
    of the origin, which keeps the LRF normal-sign disambiguation
    (``dot(-z, keypoint) >= 0`` — geometry/lrf.py:37) stable under
    rotation. Synthetic clouds straddle the origin, and independent
    SO(3) rotations then decorrelate the sign decision between the two
    halves — ~half the positive pairs get 180-degree-flipped LRFs and
    the contrastive stage collapses to its positives-unlearnable saddle
    (observed: desc_loss pinned at exactly neg_margin - pos_margin).
    """
    if mode == "none":
        return src_pts, tgt_pts, np.asarray(gt_pose, np.float32)
    Rs = _random_rotation(rs, mode)
    Rt = _random_rotation(rs, mode)

    def offset(pts):
        rad = float(np.linalg.norm(pts, axis=1).max()) + 1e-6
        d = rs.randn(3)
        if mode == "so2":
            d[2] = abs(d[2])  # keep a gravity-consistent viewpoint shift
        d /= np.linalg.norm(d) + 1e-12
        return (d * rad * (2.5 + rs.uniform(0.0, 1.0))).astype(np.float32)

    ds, dt = offset(src_pts), offset(tgt_pts)
    T = np.asarray(gt_pose, np.float32)
    R, t = T[:3, :3], T[:3, 3]
    Rp = Rt @ R @ Rs.T
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = Rp
    out[:3, 3] = Rt @ t + dt - Rp @ ds
    return (
        (src_pts @ Rs.T + ds).astype(np.float32),
        (tgt_pts @ Rt.T + dt).astype(np.float32),
        out,
    )


def random_des_r(cfg: Config, rs: np.random.RandomState) -> float:
    """Randomized training radius (reference per-dataset rules).

    KITTI keeps the reference's discrete choice set
    (``models/BUFFERX.py:175-198``); every other dataset uses the
    3DMatch-style truncated gaussian over [0.5, 1.5]x the center radius —
    at inference the density-aware estimator produces a *different* radius
    per pair, so the descriptor must be trained under radius variation.
    """
    center = cfg.patch.des_r
    name = cfg.data.dataset
    if name == "KITTI":
        if center == 3.0:
            return float(rs.choice([2.0, 2.5, 3.0, 3.5, 4.0]))
        if center == 0.3:
            return float(rs.choice([0.2, 0.25, 0.3, 0.35, 0.4]))
    lo, hi = center * 0.5, center * 1.5
    std = (hi - lo) / 6.0
    return float(np.round(np.clip(rs.normal(center, std), lo, hi), 2))


def _host_gt_correspondences(
    src_sds_p, src_sds_m, tgt_sds_p, tgt_sds_m, gt_pose, voxel_size,
    rs: np.random.RandomState, pos_num: int,
):
    """Host (numpy/scipy) twin of ``sample_gt_correspondences``: warp src
    sds by GT, 1-NN against tgt sds, keep matches within the voxel size,
    random ``pos_num`` subsample. Same distribution as the jitted version
    (which stays the device path for jit-composed pipelines); this one
    exists so POOL ASSEMBLY never touches the device — over the axon
    tunnel, per-batch device round trips made pool building RTT-bound
    (measured: a 256-batch pool took >19 min device-side, ~40 s host-side).
    """
    from scipy.spatial import cKDTree

    sv = src_sds_p[src_sds_m]
    tv = tgt_sds_p[tgt_sds_m]
    kpt_s = np.zeros((pos_num, 3), np.float32)
    kpt_t = np.zeros((pos_num, 3), np.float32)
    valid = np.zeros(pos_num, bool)
    if len(sv) and len(tv):
        warped = sv @ gt_pose[:3, :3].T + gt_pose[:3, 3]
        d, idx = cKDTree(tv).query(warped)
        match = d < voxel_size
        mi = np.nonzero(match)[0]
        if len(mi):
            take = rs.choice(len(mi), min(pos_num, len(mi)), replace=False)
            sel = mi[take]
            k = len(sel)
            kpt_s[:k] = sv[sel]
            kpt_t[:k] = tv[idx[sel]]
            valid[:k] = True
    return kpt_s, kpt_t, valid


def build_training_batch(
    cfg: Config,
    src_pts: np.ndarray,
    tgt_pts: np.ndarray,
    gt_pose: np.ndarray,
    rs: np.random.RandomState,
    key: jax.Array,
    host_arrays: bool = False,
) -> dict:
    """Raw pair -> fixed-shape training batch dict.

    fds = first downsample at ``cfg.data.downsample`` (+ jitter aug),
    sds = second downsample at ``cfg.data.voxel_size_0`` (supervision kpts).

    ``host_arrays=True`` keeps everything numpy (GT correspondences via
    the host KD-tree twin) so callers can assemble a whole resident pool
    and ship it with ONE ``device_put`` — the only sane pattern over a
    high-RTT device link.
    """
    cap = cfg.capacity.max_points
    noise = cfg.train.augmentation_noise

    src_pts, tgt_pts, gt_pose = rotate_pair(
        src_pts, tgt_pts, gt_pose, rs, cfg.train.rotation_augment
    )
    src_fds = voxel_downsample_np(src_pts, cfg.data.downsample)
    tgt_fds = voxel_downsample_np(tgt_pts, cfg.data.downsample)
    src_fds = src_fds + rs.randn(*src_fds.shape).astype(np.float32) * noise
    tgt_fds = tgt_fds + rs.randn(*tgt_fds.shape).astype(np.float32) * noise

    src_sds = voxel_downsample_np(src_fds, cfg.data.voxel_size_0)
    tgt_sds = voxel_downsample_np(tgt_fds, cfg.data.voxel_size_0)

    src_fds_p, src_fds_m = _pad(src_fds, cap, rs)
    tgt_fds_p, tgt_fds_m = _pad(tgt_fds, cap, rs)
    src_sds_p, src_sds_m = _pad(src_sds, cap, rs)
    tgt_sds_p, tgt_sds_m = _pad(tgt_sds, cap, rs)

    gt_pose = np.asarray(gt_pose, np.float32)
    if host_arrays:
        src_kpt, tgt_kpt, corr_valid = _host_gt_correspondences(
            src_sds_p, src_sds_m, tgt_sds_p, tgt_sds_m, gt_pose,
            cfg.data.voxel_size_0, rs, cfg.train.pos_num,
        )
        return {
            "src_fds": src_fds_p,
            "src_fds_mask": src_fds_m,
            "tgt_fds": tgt_fds_p,
            "tgt_fds_mask": tgt_fds_m,
            "src_kpt": src_kpt,
            "tgt_kpt": tgt_kpt,
            "corr_valid": corr_valid,
            "gt_pose": gt_pose,
            "des_r": np.float32(random_des_r(cfg, rs)),
            "is_aligned": np.asarray(
                bool(cfg.patch.is_aligned_to_global_z)
            ),
        }

    src_kpt, tgt_kpt, corr_valid = sample_gt_correspondences(
        jnp.asarray(src_sds_p), jnp.asarray(src_sds_m),
        jnp.asarray(tgt_sds_p), jnp.asarray(tgt_sds_m),
        jnp.asarray(gt_pose),
        jnp.float32(cfg.data.voxel_size_0),
        key, cfg.train.pos_num,
    )
    return {
        "src_fds": jnp.asarray(src_fds_p),
        "src_fds_mask": jnp.asarray(src_fds_m),
        "tgt_fds": jnp.asarray(tgt_fds_p),
        "tgt_fds_mask": jnp.asarray(tgt_fds_m),
        "src_kpt": src_kpt,
        "tgt_kpt": tgt_kpt,
        "corr_valid": corr_valid,
        "gt_pose": jnp.asarray(gt_pose),
        "des_r": jnp.float32(random_des_r(cfg, rs)),
        "is_aligned": jnp.asarray(bool(cfg.patch.is_aligned_to_global_z)),
    }


def synthetic_training_stream(
    cfg: Config,
    num_batches: int,
    seed: int = 0,
    num_points: int = 6000,
    overlap: float = 0.8,
    host_arrays: bool = False,
) -> Iterator[dict]:
    """Procedural training pairs (no external data needed)."""
    key = jax.random.PRNGKey(seed)
    for i in range(num_batches):
        rs = np.random.RandomState(seed * 10000 + i)
        src, tgt, T = synthetic_pair(
            rs, num_points=num_points, overlap=overlap, noise=0.001
        )
        key, sub = jax.random.split(key)
        yield build_training_batch(cfg, src, tgt, T, rs, sub,
                                   host_arrays=host_arrays)
