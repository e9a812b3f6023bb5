"""Training forward passes for the two stages (Desc / Pose).

Reimplements the training branch of ``BufferX.forward``
(``/root/reference/models/BUFFERX.py:148-255``) + the SO(2) ground-truth
labeler (``cal_so2_gt``, :86-128) as pure functions over fixed-capacity
buffers:

- GT correspondences: warp source sds keypoints by the GT pose, 1-NN against
  target sds, keep matches within the voxel size, subsample ``pos_num`` slots
  (mask-based random choice — no dynamic shapes).
- Embedding for training mirrors inference but additionally returns the LRF
  ``rand_axis`` and applies per-patch SO(2) augmentation for the Pose stage
  (``patch_embedder.py:54-67``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from bufferx_tpu.config import Config
from bufferx_tpu.core.se3 import rotation_z, transform
from bufferx_tpu.geometry.cylindrical import spatial_point_transformer
from bufferx_tpu.geometry.lrf import align_patches
from bufferx_tpu.geometry.patches import select_patches
from bufferx_tpu.kernels.neighbors import nearest_neighbor, sqdist
from bufferx_tpu.models.heads import equi_match_scores
from bufferx_tpu.train.losses import (
    contrastive_loss,
    huber_loss,
    so2_cross_entropy,
)

__all__ = [
    "TrainStatics",
    "sample_gt_correspondences",
    "cal_so2_gt",
    "embed_training",
    "desc_stage_loss",
    "pose_stage_loss",
]


@dataclasses.dataclass(frozen=True)
class TrainStatics:
    pos_num: int
    patch_sample: int
    rad_n: int
    ele_n: int
    azi_n: int
    delta: float
    voxel_sample: int
    sphere_chunk: int
    safe_radius: float
    desc_mode: str = "sampled"

    @classmethod
    def from_config(cls, cfg: Config) -> "TrainStatics":
        return cls(
            pos_num=cfg.train.pos_num,
            patch_sample=cfg.patch.num_points_per_patch,
            rad_n=cfg.patch.rad_n,
            ele_n=cfg.patch.ele_n,
            azi_n=cfg.patch.azi_n,
            delta=cfg.patch.delta,
            voxel_sample=cfg.patch.voxel_sample,
            sphere_chunk=cfg.capacity.sphere_query_chunk,
            safe_radius=cfg.match.dist_th,
            desc_mode=cfg.patch.desc_mode,
        )


@functools.partial(jax.jit, static_argnames=("pos_num",))
def sample_gt_correspondences(
    src_sds: jnp.ndarray,   # [S, 3]
    src_mask: jnp.ndarray,
    tgt_sds: jnp.ndarray,   # [T, 3]
    tgt_mask: jnp.ndarray,
    gt_pose: jnp.ndarray,   # [4, 4]
    voxel_size: jnp.ndarray,
    key: jax.Array,
    pos_num: int,
):
    """Fixed-size GT correspondence sample.

    Returns (src_kpt [P,3], tgt_kpt [P,3], valid [P]) with P = pos_num.
    Mirrors ``get_matching_indices`` + random ``pos_num`` subsampling
    (``models/BUFFERX.py:152-166``).
    """
    warped = transform(src_sds, gt_pose)
    nn, d2 = nearest_neighbor(warped, tgt_sds, src_mask, tgt_mask)
    is_match = src_mask & (jnp.sqrt(d2) < voxel_size)

    # random choice of pos_num among matches: top-k over masked noise
    noise = jax.random.uniform(key, (src_sds.shape[0],))
    scores = jnp.where(is_match, noise, -jnp.inf)
    vals, idx = jax.lax.top_k(scores, pos_num)
    valid = vals > -jnp.inf
    idx = jnp.where(valid, idx, 0)
    return src_sds[idx], tgt_sds[nn[idx]], valid


def embed_training(
    params: Any,
    desc_model,
    statics: TrainStatics,
    cloud_xyz: jnp.ndarray,
    cloud_mask: jnp.ndarray,
    kpts: jnp.ndarray,
    des_r: jnp.ndarray,
    is_aligned: jnp.ndarray,
    key: jax.Array,
    so2_augment: bool = False,
):
    """Training embedding: returns dict with desc/equi/R/rand_axis/aug_R.

    ``so2_augment`` applies a random per-patch rotation about +z *after* LRF
    alignment (Pose-stage target augmentation, ``patch_embedder.py:54-67``).
    Returns mutated batch stats as well when the model is in train mode —
    here we keep BN in inference mode inside the loss and update stats in
    the train step wrapper.
    """
    k1, k3 = jax.random.split(key)
    patches, pmask = select_patches(
        cloud_xyz, cloud_mask, kpts, des_r, k1, statics.patch_sample
    )
    delta = patches - kpts[:, None, :]
    aligned, rand_axis, R = align_patches(delta, kpts, is_aligned)
    aligned = aligned / des_r

    kk = kpts.shape[0]
    if so2_augment:
        angles = jax.random.uniform(k3, (kk,)) * 2.0 * jnp.pi
        aug_R = rotation_z(angles)                       # [K, 3, 3]
    else:
        aug_R = jnp.broadcast_to(jnp.eye(3, dtype=aligned.dtype), (kk, 3, 3))
    hp = jax.lax.Precision.HIGHEST
    aligned = jnp.einsum("kpi,kji->kpj", aligned, aug_R, precision=hp)
    rand_axis = jnp.einsum("ki,kji->kj", rand_axis, aug_R, precision=hp)

    if statics.desc_mode == "moments":
        from bufferx_tpu.geometry.moments import (
            moments_to_features_mm,
            pool_cell_moments,
        )

        # moments-major [K, 10, G] — the layout the serving pipeline and
        # the descriptor stem use (see geometry.moments)
        raw = pool_cell_moments(
            aligned, pmask,
            rad_n=statics.rad_n, ele_n=statics.ele_n, azi_n=statics.azi_n,
            delta=statics.delta, chunk=statics.sphere_chunk,
            moments_major=True,
        )
        inv = moments_to_features_mm(
            raw, rad_n=statics.rad_n, ele_n=statics.ele_n,
            azi_n=statics.azi_n, delta=statics.delta,
        )
    else:
        inv = spatial_point_transformer(
            aligned, pmask,
            rad_n=statics.rad_n, ele_n=statics.ele_n, azi_n=statics.azi_n,
            delta=statics.delta, nsample=statics.voxel_sample,
            chunk=statics.sphere_chunk,
        )
    out, mutated = desc_model.apply(
        params, inv, train=True, mutable=["batch_stats"]
    )
    return {
        "desc": out["desc"],
        "equi": out["equi"],
        "R": R,
        "rand_axis": rand_axis,
        "aug_R": aug_R,
        "batch_stats": mutated["batch_stats"],
    }


def cal_so2_gt(
    s_rand_axis: jnp.ndarray,  # [K, 3]
    s_R: jnp.ndarray,          # [K, 3, 3]
    t_R: jnp.ndarray,          # [K, 3, 3]
    gt_rot: jnp.ndarray,       # [3, 3]
    azi_n: int,
    aug_R: jnp.ndarray | None = None,  # [K, 3, 3] target SO(2) augmentation
    integer: bool = True,
):
    """Azimuth-bin ground truth (``models/BUFFERX.py:86-128``).

    Projects the source in-plane reference axis through the GT rotation into
    the target LRF, measures its azimuth deviation from the source axis in
    the source LRF, and bins it.
    """
    hp = jax.lax.Precision.HIGHEST
    t_axis = jnp.einsum("ki,ji->kj", s_rand_axis, gt_rot, precision=hp)
    s_axis = jnp.einsum("ki,kij->kj", s_rand_axis, s_R, precision=hp)
    t_axis = jnp.einsum("ki,kij->kj", t_axis, t_R, precision=hp)
    if aug_R is not None:
        t_axis = jnp.einsum("ki,kji->kj", t_axis, aug_R, precision=hp)

    z = jnp.asarray([0.0, 0.0, 1.0], dtype=s_axis.dtype)
    proj_t = t_axis - jnp.sum(t_axis * z, axis=-1, keepdims=True) * z
    proj_t = proj_t / jnp.maximum(
        jnp.linalg.norm(proj_t, axis=-1, keepdims=True), 1e-12
    )
    s_n = s_axis / jnp.maximum(
        jnp.linalg.norm(s_axis, axis=-1, keepdims=True), 1e-12
    )
    cos = jnp.clip(jnp.sum(s_n * proj_t, axis=-1), -1.0, 1.0)
    dev = jnp.arccos(cos)
    sign = jnp.sum(jnp.cross(s_n, proj_t) * z, axis=-1) < 0.0
    dev = jnp.where(sign, 2.0 * jnp.pi - dev, dev)
    label = dev * azi_n / (2.0 * jnp.pi)
    if integer:
        lab = jnp.round(label)
        lab = jnp.where(lab >= azi_n, 0.0, lab)
        return lab.astype(jnp.int32)
    return jnp.where(label >= azi_n, 0.0, label)


def desc_stage_loss(
    params: Any,
    desc_model,
    statics: TrainStatics,
    batch: dict,
    key: jax.Array,
):
    """Desc-stage loss: 4*contrastive + equivariant CE (trainer.py:113-131).

    ``batch``: dict of device arrays — src/tgt fds clouds + masks, matched
    keypoints (from :func:`sample_gt_correspondences`) + validity, gt pose,
    des_r scalar, is_aligned flag.
    Returns (loss, aux) where aux carries metrics + new batch stats.
    """
    k1, k2 = jax.random.split(key)
    src = embed_training(
        params, desc_model, statics,
        batch["src_fds"], batch["src_fds_mask"], batch["src_kpt"],
        batch["des_r"], batch["is_aligned"], k1,
    )
    tgt = embed_training(
        params, desc_model, statics,
        batch["tgt_fds"], batch["tgt_fds_mask"], batch["tgt_kpt"],
        batch["des_r"], batch["is_aligned"], k2,
    )
    valid = batch["corr_valid"]

    dist_kpts = jnp.sqrt(sqdist(batch["tgt_kpt"], batch["tgt_kpt"]) + 1e-12)
    dist_kpts_src = jnp.sqrt(
        sqdist(batch["src_kpt"], batch["src_kpt"]) + 1e-12
    )
    d_loss, d_acc = contrastive_loss(
        src["desc"], tgt["desc"], dist_kpts, valid,
        safe_radius=statics.safe_radius, dist_keypts_src=dist_kpts_src,
    )

    logits = equi_match_scores(src["equi"], tgt["equi"], statics.azi_n)
    labels = cal_so2_gt(
        src["rand_axis"], src["R"], tgt["R"], batch["gt_pose"][:3, :3],
        statics.azi_n, integer=True,
    )
    e_loss, e_acc = so2_cross_entropy(logits, labels, valid)

    loss = 4.0 * d_loss + e_loss
    # fold BOTH halves' BatchNorm statistics: the reference's single module
    # sees the src and tgt calls sequentially, so its running stats average
    # over both distributions — keeping only src's would skew them.
    stats = jax.tree.map(
        lambda a, b: 0.5 * (a + b), src["batch_stats"], tgt["batch_stats"]
    )
    aux = {
        "desc_loss": d_loss,
        "desc_acc": d_acc,
        "eqv_loss": e_loss,
        "eqv_acc": e_acc,
        "batch_stats": stats,
    }
    return loss, aux


def pose_stage_loss(
    params: Any,
    desc_params: Any,
    desc_model,
    pose_model,
    statics: TrainStatics,
    batch: dict,
    key: jax.Array,
):
    """Pose-stage loss: Huber on predicted vs GT SO(2) index
    (trainer.py:133-141). ``params`` are the CostVolume (trainable) params;
    ``desc_params`` are the frozen Desc-stage params."""
    k1, k2 = jax.random.split(key)
    src = embed_training(
        desc_params, desc_model, statics,
        batch["src_fds"], batch["src_fds_mask"], batch["src_kpt"],
        batch["des_r"], batch["is_aligned"], k1,
    )
    tgt = embed_training(
        desc_params, desc_model, statics,
        batch["tgt_fds"], batch["tgt_fds_mask"], batch["tgt_kpt"],
        batch["des_r"], batch["is_aligned"], k2, so2_augment=True,
    )
    valid = batch["corr_valid"]
    e = statics.ele_n

    pred, mutated = pose_model.apply(
        params,
        src["equi"][:, :, 1 : e - 1],
        tgt["equi"][:, :, 1 : e - 1],
        train=True,
        mutable=["batch_stats"],
    )
    labels = cal_so2_gt(
        src["rand_axis"], src["R"], tgt["R"], batch["gt_pose"][:3, :3],
        statics.azi_n, aug_R=tgt["aug_R"], integer=False,
    )
    loss = huber_loss(pred, labels, valid)
    aux = {"match_loss": loss, "batch_stats": mutated["batch_stats"]}
    return loss, aux
