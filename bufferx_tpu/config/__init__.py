"""Typed configuration system.

Replaces the reference's ``easydict`` class hierarchy
(``/root/reference/config/indoor_config.py:4-80``,
``outdoor_config.py:4-82``, ``config/__init__.py:18-56``) with frozen
dataclasses: two base profiles (indoor / outdoor) plus per-dataset presets,
and a TPU-specific ``CapacityConfig`` fixing every static shape used on
device (clouds, keypoints, patches, correspondences, RANSAC hypotheses).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Optional, Tuple

__all__ = [
    "DataConfig",
    "TrainConfig",
    "TestConfig",
    "OptimConfig",
    "PatchConfig",
    "MatchConfig",
    "CapacityConfig",
    "Config",
    "make_cfg",
    "indoor_base",
    "outdoor_base",
    "DATASETS",
]


@dataclass(frozen=True)
class DataConfig:
    """Dataset / preprocessing knobs (reference: ``config/indoor_config.py:9-16``)."""

    dataset: str = ""
    root: str = ""
    downsample: float = 0.02          # train-time first-level voxel size
    voxel_size_0: float = 0.035       # second-level voxel size (sds)
    max_num_pts: int = 30000          # cap on points per cloud
    manual_seed: int = 123
    # outdoor LiDAR pair-walking distance, where applicable
    pdist: float = 10.0
    # density-based clutter prefilter (kernels/density.py): removes
    # volumetric outlier points before FPS keypointing. Enabled for the
    # indoor (fused-scan) presets; off for outdoor LiDAR, whose genuine
    # long-range sparsity the density test could clip.
    clutter_filter: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """Two-stage training knobs (reference: ``config/indoor_config.py:19-27``)."""

    epoch: int = 10
    max_iter: int = 50000
    batch_size: int = 1
    pos_num: int = 512
    augmentation_noise: float = 0.001
    pretrain_model: str = ""
    all_stage: Tuple[str, ...] = ("Desc", "Pose")
    # cloud-level rotation augmentation applied to each training pair
    # (GT pose conjugated accordingly): "so3" = independent full random
    # rotations per cloud (reference 3DMatch, dataset/threedmatch.py:104-107),
    # "so2" = random rotations about +z (reference KITTI,
    # dataset/kitti.py:142-148), "none" = off.
    rotation_augment: str = "so3"


@dataclass(frozen=True)
class TestConfig:
    """Evaluation thresholds + harness switches (reference: ``config/indoor_config.py:30-37``)."""

    experiment_id: str = "threedmatch"
    pose_refine: bool = False
    enable_timing: bool = False
    rte_thresh: float = 0.3
    rre_thresh: float = 15.0


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer schedule (reference: ``config/indoor_config.py:40-44``)."""

    lr_desc: float = 0.001
    lr_pose: float = 0.001
    lr_decay: float = 0.50
    weight_decay: float = 1e-6
    scheduler_interval_desc: int = 2
    scheduler_interval_pose: int = 1

    def lr(self, stage: str) -> float:
        return self.lr_desc if stage == "Desc" else self.lr_pose

    def scheduler_interval(self, stage: str) -> int:
        return (
            self.scheduler_interval_desc
            if stage == "Desc"
            else self.scheduler_interval_pose
        )


@dataclass(frozen=True)
class PatchConfig:
    """Multi-scale cylindrical patch embedder (reference: ``config/indoor_config.py:47-61``)."""

    des_r: float = 0.3                    # training descriptor radius
    num_points_per_patch: int = 512
    num_fps: int = 1500
    rad_n: int = 3
    azi_n: int = 20
    ele_n: int = 7
    delta: float = 0.8
    voxel_sample: int = 10
    num_scales: int = 3
    is_aligned_to_global_z: bool = False
    # density-aware radius estimation: target % of pairwise dists within radius
    search_radius_thresholds: Tuple[float, ...] = (5.0, 2.0, 0.5)
    num_points_radius_estimate: int = 2000
    radius_max: float = 5.0               # bisection upper bound (reference max_r)
    # descriptor cell pooling: "sampled" = reference semantics (nsample
    # random in-radius points + point-MLP max-pool); "moments" = dense
    # moment pooling over all in-radius points (geometry/moments.py) —
    # one MXU matmul per patch, 16x less HBM traffic; needs a checkpoint
    # trained in the same mode.
    desc_mode: str = "sampled"
    # descriptor attention-pooling head: "gated" = reference pool_layer
    # semantics (BN+ReLU gate — can die); "softmax" = round-4 redesign
    # (bare-logit softmax attention over the cylindrical grid; cannot
    # die). Baked into the checkpoint like desc_mode.
    desc_pool: str = "gated"
    # Conv-backbone channel multiplier (capacity knob for the 0.3-overlap
    # band — round-5). Changes parameter shapes: baked into the snapshot
    # config like desc_mode/desc_pool. 1.0 = the reference architecture.
    desc_width: float = 1.0
    # ball-query slot selection: approximate random top-k (cheaper) vs
    # exact. The hard-benchmark gate (scripts/exp_hard.py) quantifies the
    # quality delta between the two.
    exact_topk: bool = False
    # two-level block ball query (kernels/neighbors.py:ball_query_blocks):
    # packed block-row gather + exact in-candidate selection, capturing ALL
    # in-radius points of sparse patches. OFF by default: the round-4
    # honest head-to-head (HEADTOHEAD_r4_geom_full.jsonl — the first one
    # where the block path actually ran at production shapes; round 3's
    # was a silent fallback to flat) measured every block geometry ~28%
    # SLOWER than the flat approx path at B=8 full 3-scale (208-212 vs
    # 165 ms/pair), and every shipped quality gate was measured on the
    # flat path.
    block_ball_query: bool = False
    # block geometry: points per block / candidate blocks per center. The
    # gather cost scales with bq_cand_blocks (rows gathered per center)
    # and the level-1 top_k with both knobs; bq_block * bq_cand_blocks is
    # the candidate-pool width (must be >= num_points_per_patch).
    bq_block: int = 32
    bq_cand_blocks: int = 64
    # gather-free stratified ball query
    # (kernels/neighbors.py:ball_query_stratified): strided strips + fused
    # one-hot selection, no top-k and no row gather. Takes precedence over
    # block_ball_query; requires capacity.max_points divisible by
    # num_points_per_patch (30208 = 512 * 59).
    # DEFAULT ON (round 4): 164.7 -> 104.3 ms/pair at B=8 full 3-scale
    # (HEADTOHEAD_r4_strat_full.jsonl) with hard-gate quality parity
    # (GATE_r04_strat.jsonl mean 0.586 vs flat 0.598 — within cell noise
    # at 50 pairs/cell, per-cell diffs mixed-sign).
    strat_ball_query: bool = True
    # radius-estimation point-column stride (kernels/radius.py): the 12
    # bisection rounds re-read the [probes, points] matrix, which
    # dominates the precompute stage's HBM traffic; estimating over a
    # strided (= uniform random, clouds are pre-shuffled) subset leaves
    # the 1-cm-rounded estimate unchanged to well within its own noise.
    radius_subsample: int = 4
    # Which cloud calibrates the shared per-scale descriptor radius:
    # "denser" (reference semantics, BUFFERX.py:654-659) or "sparser"
    # (round-5 density-mismatch experiment — the shared radius then
    # guarantees enough in-radius points on the SPARSE cloud's patches).
    radius_source: str = "denser"
    # SPT moment pooling point-subsample stride: pool cell moments over
    # every ``spt_pool_subsample``-th patch point and rescale the sums by
    # the stride (an unbiased full-patch estimate). MEASURED DEAD END at
    # stride 2 with the shipped checkpoint: only -1.2 ms/pair end to end
    # (the stage fuses well in context, HEADTOHEAD_r4_poolsub.jsonl) and
    # the hard gate COLLAPSES 0.713 -> 0.105 (GATE_r04_sub2.jsonl) — the
    # descriptor is calibrated to exact-moment statistics. Keep 1 unless
    # the checkpoint was TRAINED with the same stride.
    spt_pool_subsample: int = 1
    # batch the multi-scale candidate chains through ONE traced body
    # (vmap over the radius index): scales run identical programs that
    # differ only in radius, so batching them 3x's the conv/matmul batch,
    # loads model weights once, and shares the d2 reads across the three
    # patch selections. Default False: after the round-4 kernel work
    # (Pallas moments v2, explicit-trig derotation, per-coordinate
    # stratified select, compensated d2) the statically UNROLLED chain
    # measures 76.3 ms/pair vs 90.6 vmapped at B=8 full 3-scale
    # (HEADTOHEAD_r4_kernels.jsonl) — the batched program's layouts cost
    # more than the batch amortizes.
    vmap_scales: bool = False
    # Serving: run the descriptor's 8-layer cylindrical conv stack as one
    # fused Pallas program with inference-BN folded into the weights and
    # activations VMEM-resident across layers (kernels/conv_pallas.py).
    # Default OFF: measured 2.6x slower than XLA's conv emitter (the MXU's
    # native convolution mode streams each input row into all three
    # elevation taps; a dot-based Pallas formulation cannot — round-5
    # probes, RESULTS.md). Kept as a documented, parity-tested negative.
    fused_conv: bool = False
    # Serving: concatenate all scales' SPT features (and matched equi
    # pairs) so each conv stack runs ONCE per program instead of once per
    # scale. Identical row-independent math. Default OFF: measured 73.6 vs
    # 71.7 ms/pair at B=8 full 3-scale (HEADTOHEAD_r5_sbc.jsonl) — the
    # per-scale calls already amortize call overhead at B=8, and the
    # concats add memory traffic. Kept for smaller-batch serving modes.
    scale_batch_conv: bool = False
    # Matched-equi row gather as a one-hot MXU matmul (exact 0/1 row
    # selection at the cost volume's own bf16 input precision). TRACE_r5
    # found the plain gather fused with a pathological layout inversion
    # at 22 ms/scale/batch — the largest op on the serving critical path.
    # Default ON: -8.1 ms/pair at B=8 full 3-scale with bit-identical
    # decision-cell recall (HEADTOHEAD_r5_mxg.jsonl, GATE_r05_mxg_quick).
    mxu_gather: bool = True


@dataclass(frozen=True)
class MatchConfig:
    """Matching + pose solving (reference: ``config/indoor_config.py:64-77``)."""

    pose_estimator: str = "ransac"        # "ransac" | "gnc"
    dist_th: float = 0.10
    # cross-scale consensus threshold scale (thr_j = ||ss_j|| * pi/azi_n
    # * inlier_th). The round-1..3 value (1/3, the reference's) was the
    # LOW-OVERLAP bottleneck: the round-4 sweep (SWEEP_r4_*.jsonl, full
    # gates GATE_r04_ft2_inl*.jsonl) shows every gate cell improves or
    # holds up to ~1.25 (mean 0.587 -> 0.713 on the shipping
    # checkpoint); the plateau spans ~0.75-1.5.
    inlier_th: float = 1.25
    similar_th: float = 0.8
    confidence: float = 0.999
    iter_n: int = 50000                   # reference RANSAC iteration budget
    kiss_resolution: float = 0.3
    enable_early_exit: bool = False
    early_exit_min_inliers: int = 50


@dataclass(frozen=True)
class CapacityConfig:
    """TPU static-shape capacities (new: no reference counterpart).

    Every device-side buffer is padded to a capacity here and carries a
    validity mask, so the whole pipeline traces to a single XLA program.
    """

    # Padded cloud size. >= data.max_num_pts (so no cloud is ever
    # subsampled below the reference's 30000-point cap), and divisible by
    # patch.bq_block AND the 128-lane tile so the block ball query's packed
    # block view applies (round 3 shipped 30000, which silently disabled
    # the block path: 30000 % 32 != 0). 30208 = 32 * 944 = 128 * 236.
    max_points: int = 30208
    num_ransac_hypotheses: int = 8192     # vectorized hypothesize-and-verify budget
    ransac_chunk: int = 2048              # hypotheses scored per scan step
    sphere_query_chunk: int = 256         # patches per chunk in the SPT grid query
    irls_iters: int = 20                  # reference post_refinement iterations


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    patch: PatchConfig = field(default_factory=PatchConfig)
    match: MatchConfig = field(default_factory=MatchConfig)
    capacity: CapacityConfig = field(default_factory=CapacityConfig)
    stage: str = "test"                   # "Desc" | "Pose" | "test"
    benchmark: Optional[str] = None       # e.g. "3DLoMatch" reuses 3DMatch data

    def with_stage(self, stage: str) -> "Config":
        return replace(self, stage=stage)

    def override(self, **kw) -> "Config":
        """Nested override: ``cfg.override(match=dict(dist_th=0.2))``."""
        updates = {}
        for k, v in kw.items():
            cur = getattr(self, k)
            if isinstance(v, dict) and dataclasses.is_dataclass(cur):
                updates[k] = replace(cur, **v)
            else:
                updates[k] = v
        return replace(self, **updates)


def indoor_base() -> Config:
    """Indoor profile: RGB-D fragment scale (reference ``IndoorBaseConfig``)."""
    return Config(data=DataConfig(clutter_filter=True))


def outdoor_base() -> Config:
    """Outdoor profile: LiDAR scale (reference ``OutdoorBaseConfig``)."""
    return Config(
        data=DataConfig(downsample=0.05, voxel_size_0=0.30),
        train=TrainConfig(
            epoch=50, augmentation_noise=0.01, rotation_augment="so2"
        ),
        test=TestConfig(rte_thresh=2.0, rre_thresh=5.0),
        optim=OptimConfig(scheduler_interval_desc=10, scheduler_interval_pose=5),
        patch=PatchConfig(des_r=3.0, is_aligned_to_global_z=True),
        match=MatchConfig(
            dist_th=0.30, inlier_th=2.0, similar_th=0.9, confidence=1.0
        ),
    )


def _threedmatch(root: str) -> Config:
    cfg = indoor_base()
    return cfg.override(
        data=dict(dataset="3DMatch", root=root),
        test=dict(experiment_id="threedmatch", pose_refine=True),
    )


def _threedlomatch(root: str) -> Config:
    cfg = _threedmatch(root)
    return replace(cfg.override(data=dict(dataset="3DLoMatch")), benchmark="3DLoMatch")


def _scannetpp_iphone(root: str) -> Config:
    return indoor_base().override(data=dict(dataset="Scannetpp_iphone", root=root))


def _scannetpp_faro(root: str) -> Config:
    return indoor_base().override(data=dict(dataset="Scannetpp_faro", root=root))


def _kitti(root: str) -> Config:
    return outdoor_base().override(
        data=dict(dataset="KITTI", root=root, pdist=10.0),
        test=dict(experiment_id="kitti", rte_thresh=2.0, rre_thresh=5.0),
    )


def _wod(root: str) -> Config:
    return outdoor_base().override(data=dict(dataset="WOD", root=root, pdist=10.0))


def _mit(root: str) -> Config:
    return outdoor_base().override(data=dict(dataset="MIT", root=root, pdist=5.0))


def _kaist(root: str) -> Config:
    return outdoor_base().override(data=dict(dataset="KAIST", root=root, pdist=10.0))


def _kaist_hetero(root: str) -> Config:
    return outdoor_base().override(data=dict(dataset="KAIST_hetero", root=root, pdist=10.0))


def _eth(root: str) -> Config:
    return outdoor_base().override(
        data=dict(dataset="ETH", root=root),
        test=dict(rte_thresh=0.3, rre_thresh=2.0),
        match=dict(dist_th=0.20),
    )


def _oxford(root: str) -> Config:
    return outdoor_base().override(data=dict(dataset="Oxford", root=root, pdist=5.0))


def _tiers(root: str) -> Config:
    return outdoor_base().override(data=dict(dataset="TIERS", root=root, pdist=10.0))


def _tiers_hetero(root: str) -> Config:
    return outdoor_base().override(data=dict(dataset="TIERS_hetero", root=root, pdist=10.0))


def _modelnet40(root: str) -> Config:
    cfg = indoor_base()
    return cfg.override(
        # object-scale synthetic shapes carry no volumetric sensor clutter,
        # so the density prefilter (an indoor fused-scan feature) buys
        # nothing here and costs ~2 ms/pair at serving batch sizes
        data=dict(dataset="ModelNet40", root=root, downsample=0.01,
                  voxel_size_0=0.02, clutter_filter=False),
        test=dict(rte_thresh=0.1, rre_thresh=15.0),
    )


DATASETS = {
    "3DMatch": _threedmatch,
    "3DLoMatch": _threedlomatch,
    "Scannetpp_iphone": _scannetpp_iphone,
    "Scannetpp_faro": _scannetpp_faro,
    "KITTI": _kitti,
    "WOD": _wod,
    "MIT": _mit,
    "KAIST": _kaist,
    "KAIST_hetero": _kaist_hetero,
    "ETH": _eth,
    "Oxford": _oxford,
    "TIERS": _tiers,
    "TIERS_hetero": _tiers_hetero,
    "ModelNet40": _modelnet40,
}


def make_cfg(dataset_name: str, root_dir: str = "") -> Config:
    """Name -> config dispatch (reference: ``config/__init__.py:18-56``)."""
    try:
        return DATASETS[dataset_name](root_dir)
    except KeyError:
        raise ValueError(
            f"Unknown dataset {dataset_name!r}; expected one of {sorted(DATASETS)}"
        ) from None
