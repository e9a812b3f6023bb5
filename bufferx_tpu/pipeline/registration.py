"""End-to-end zero-shot pair registration: one jitted program.

The TPU re-design of ``BufferX.forward``'s inference branch
(``/root/reference/models/BUFFERX.py:257-467``). Differences from the
reference's B=1 Python-loop design, by construction:

- **Static shapes everywhere**: clouds padded to ``capacity.max_points``
  with masks; keypoints/correspondences fixed at ``num_fps`` per scale with
  validity bits; no host round trips (the reference crosses GPU→CPU→C++ at
  every ``estimate_pose`` call).
- **One FPS run per cloud**: FPS is prefix-consistent, so the 2000 radius-
  estimation probes and the 1500 descriptor keypoints come from a single
  run (the reference re-runs FPS per scale — same result, 3x the cost).
- **Scales unrolled statically**; early exit is expressed as a masked
  select between the scale-0 solution and the all-scales solution
  (identical results to the reference's branch; a host-dispatched
  latency-saving variant lives in ``register_pair_early_exit``).
- **Solver fallback**: if the consensus pool collapses (< 8 members), RANSAC
  samples from all mutual matches instead — strictly more robust than the
  reference, which feeds Open3D whatever ``inlier_ind`` contains.

``register_pair`` is the convenience wrapper (handles params-less calls for
smoke tests); ``register_pair_jit`` is the raw jitted function for batching
(vmap) and sharding (shard_map).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bufferx_tpu.config import Config
from bufferx_tpu.geometry.cylindrical import spatial_point_transformer
from bufferx_tpu.geometry.lrf import align_patches
from bufferx_tpu.geometry.patches import select_patches
from bufferx_tpu.kernels.fps import fps as farthest_point_sampling
from bufferx_tpu.kernels.neighbors import masked_sqdist, mutual_nearest
from bufferx_tpu.kernels.radius import density_aware_radius_from_d2
from bufferx_tpu.models.heads import CostVolume
from bufferx_tpu.models.spinnet import MiniSpinNet
from bufferx_tpu.solver.consensus import cross_scale_consensus
from bufferx_tpu.solver.gnc import gnc_tls_solve
from bufferx_tpu.solver.irls import post_refinement
from bufferx_tpu.solver.ransac import ransac_pose
from bufferx_tpu.solver.so2 import so2_pose_candidates

__all__ = [
    "Cloud",
    "RegistrationResult",
    "PipelineStatics",
    "build_models",
    "init_params",
    "prepare_cloud",
    "register_pair",
    "register_pair_jit",
    "register_pair_timed",
    "register_pair_early_exit",
    "register_pairs_batched",
    "stack_clouds",
]


class Cloud(NamedTuple):
    xyz: jnp.ndarray    # [N, 3] f32, padded
    mask: jnp.ndarray   # [N] bool


class RegistrationResult(NamedTuple):
    pose: jnp.ndarray            # [4, 4]
    num_inliers: jnp.ndarray     # scalar int32 (solver inliers)
    num_mutual: jnp.ndarray      # scalar int32 (mutual matches, used scales)
    num_consensus: jnp.ndarray   # scalar int32 (consensus inlier count)
    scales_used: jnp.ndarray     # scalar int32
    valid: jnp.ndarray           # scalar bool


@dataclasses.dataclass(frozen=True)
class PipelineStatics:
    """Hashable static configuration extracted from :class:`Config`."""

    max_points: int
    num_fps: int
    num_probe: int
    num_scales: int
    thresholds: tuple
    radius_max: float
    patch_sample: int
    rad_n: int
    ele_n: int
    azi_n: int
    delta: float
    voxel_sample: int
    inlier_th: float
    dist_th: float
    similar_th: float
    pose_estimator: str
    pose_refine: bool
    irls_iters: int
    num_hypotheses: int
    ransac_chunk: int
    sphere_chunk: int
    enable_early_exit: bool
    early_exit_min_inliers: int
    kiss_resolution: float
    use_bf16: bool = True   # conv stacks in bfloat16 at inference (MXU 2x)
    desc_mode: str = "sampled"   # cell pooling: "sampled" | "moments"
    desc_pool: str = "gated"     # attention head: "gated" | "softmax"
    desc_width: float = 1.0      # conv-backbone channel multiplier
    exact_topk: bool = False     # exact ball-query slot selection
    clutter_filter: bool = False  # density prefilter (kernels/density.py)
    block_ball_query: bool = True  # two-level block ball query
    bq_block: int = 32             # points per block (block ball query)
    bq_cand_blocks: int = 64       # candidate blocks per center
    strat_ball_query: bool = False  # gather-free stratified ball query
    radius_subsample: int = 1       # point-column stride in radius est.
    radius_source: str = "denser"   # radius calibration cloud (|"sparser")
    spt_pool_subsample: int = 1     # SPT pooling point stride (unbiased)
    # scale batching OFF by default (matches PatchConfig.vmap_scales: the
    # unrolled per-scale chain measured 76.3 vs 90.6 ms/pair post-kernels,
    # HEADTOHEAD_r4_kernels); from_config always overrides this anyway
    vmap_scales: bool = False
    # Pallas fused desc conv stack: measured 2.6x SLOWER than XLA's conv
    # emitter (round-5 probes, RESULTS.md) — kept as a documented negative
    fused_conv: bool = False
    # one conv call across all scales — measured neutral-to-slightly-worse
    # at B=8 (HEADTOHEAD_r5_sbc.jsonl); default matches PatchConfig
    scale_batch_conv: bool = False
    # equi-map row gather as one-hot MXU matmul: TRACE_r5 found the
    # t_equi[nn] gather+relayout fusion at 22 ms/scale/batch (the single
    # largest op on the critical path); the one-hot contraction sidesteps
    # both the per-row gather cost and the layout inversion
    mxu_gather: bool = False

    @classmethod
    def from_config(cls, cfg: Config) -> "PipelineStatics":
        return cls(
            max_points=cfg.capacity.max_points,
            num_fps=cfg.patch.num_fps,
            num_probe=max(
                cfg.patch.num_points_radius_estimate, cfg.patch.num_fps
            ),
            num_scales=cfg.patch.num_scales,
            thresholds=tuple(cfg.patch.search_radius_thresholds),
            radius_max=cfg.patch.radius_max,
            patch_sample=cfg.patch.num_points_per_patch,
            rad_n=cfg.patch.rad_n,
            ele_n=cfg.patch.ele_n,
            azi_n=cfg.patch.azi_n,
            delta=cfg.patch.delta,
            voxel_sample=cfg.patch.voxel_sample,
            inlier_th=cfg.match.inlier_th,
            dist_th=cfg.match.dist_th,
            similar_th=cfg.match.similar_th,
            pose_estimator=cfg.match.pose_estimator,
            pose_refine=cfg.test.pose_refine,
            irls_iters=cfg.capacity.irls_iters,
            num_hypotheses=cfg.capacity.num_ransac_hypotheses,
            ransac_chunk=cfg.capacity.ransac_chunk,
            sphere_chunk=cfg.capacity.sphere_query_chunk,
            enable_early_exit=cfg.match.enable_early_exit,
            early_exit_min_inliers=cfg.match.early_exit_min_inliers,
            kiss_resolution=cfg.match.kiss_resolution,
            desc_mode=cfg.patch.desc_mode,
            desc_pool=cfg.patch.desc_pool,
            desc_width=cfg.patch.desc_width,
            exact_topk=cfg.patch.exact_topk,
            clutter_filter=cfg.data.clutter_filter,
            block_ball_query=cfg.patch.block_ball_query,
            bq_block=cfg.patch.bq_block,
            bq_cand_blocks=cfg.patch.bq_cand_blocks,
            strat_ball_query=cfg.patch.strat_ball_query,
            radius_subsample=cfg.patch.radius_subsample,
            radius_source=cfg.patch.radius_source,
            spt_pool_subsample=cfg.patch.spt_pool_subsample,
            vmap_scales=cfg.patch.vmap_scales,
            fused_conv=cfg.patch.fused_conv,
            scale_batch_conv=cfg.patch.scale_batch_conv,
            mxu_gather=cfg.patch.mxu_gather,
        )


def build_models(cfg: Config, bn_axis_name: str | None = None):
    desc = MiniSpinNet(
        rad_n=cfg.patch.rad_n,
        ele_n=cfg.patch.ele_n,
        azi_n=cfg.patch.azi_n,
        bn_axis_name=bn_axis_name,
        mode=cfg.patch.desc_mode,
        pool=cfg.patch.desc_pool,
        width=cfg.patch.desc_width,
    )
    pose = CostVolume(azi_n=cfg.patch.azi_n, bn_axis_name=bn_axis_name)
    return desc, pose


def init_params(cfg: Config, key: jax.Array) -> dict:
    """Initialize both model subtrees (``Desc`` and ``Pose`` stages)."""
    desc, pose = build_models(cfg)
    s = PipelineStatics.from_config(cfg)
    g = s.rad_n * s.ele_n * s.azi_n
    k1, k2 = jax.random.split(key)
    desc_in = (
        jnp.zeros((2, 10, g))      # moments-major [K, 10, G]
        if s.desc_mode == "moments"
        else jnp.zeros((2, g, s.voxel_sample, 3))
    )
    desc_vars = desc.init(k1, desc_in, train=False)
    pose_vars = pose.init(
        k2,
        jnp.zeros((2, 32, s.ele_n - 2, s.azi_n)),
        jnp.zeros((2, 32, s.ele_n - 2, s.azi_n)),
        train=False,
    )
    return {"desc": desc_vars, "pose": pose_vars}


def prepare_cloud(xyz: np.ndarray, cfg: Config, seed: int = 0) -> Cloud:
    """Host-side: shuffle (FPS start / random-subset semantics) and pad."""
    cap = cfg.capacity.max_points
    rs = np.random.RandomState(seed)
    xyz = np.asarray(xyz, np.float32)
    if len(xyz) > cap:
        xyz = xyz[rs.choice(len(xyz), cap, replace=False)]
    else:
        xyz = xyz[rs.permutation(len(xyz))]
    n = len(xyz)
    out = np.zeros((cap, 3), np.float32)
    out[:n] = xyz
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return Cloud(jnp.asarray(out), jnp.asarray(mask))


def _spt_features(normed, pmask, statics: PipelineStatics):
    """Normalized aligned offsets -> descriptor-net input (mode dispatch)."""
    if statics.desc_mode == "moments":
        from bufferx_tpu.geometry.moments import (
            moments_to_features_mm,
            pool_cell_moments,
        )

        # moments-MAJOR layout end-to-end ([K, 10, G]: cells on lanes) —
        # the Pallas kernel emits it natively and the derotation +
        # descriptor stem consume it without a relayout
        sub = statics.spt_pool_subsample
        if sub > 1:
            # unbiased moment estimate over a uniform (strided — patch
            # rows arrive shuffled) subset: sums rescale by the stride
            normed = normed[:, ::sub]
            pmask = pmask[:, ::sub]
        raw = pool_cell_moments(
            normed, pmask,
            rad_n=statics.rad_n, ele_n=statics.ele_n, azi_n=statics.azi_n,
            delta=statics.delta, chunk=statics.sphere_chunk,
            moments_major=True,
        )
        if sub > 1:
            raw = raw * jnp.float32(sub)
        return moments_to_features_mm(
            raw, rad_n=statics.rad_n, ele_n=statics.ele_n,
            azi_n=statics.azi_n, delta=statics.delta,
        )
    return spatial_point_transformer(
        normed, pmask,
        rad_n=statics.rad_n, ele_n=statics.ele_n, azi_n=statics.azi_n,
        delta=statics.delta, nsample=statics.voxel_sample,
        chunk=statics.sphere_chunk, use_approx=not statics.exact_topk,
    )


def _embed_geom(statics: PipelineStatics, src: Cloud, tgt: Cloud,
                src_kpts, tgt_kpts, des_r, is_aligned, key,
                d2_src=None, d2_tgt=None, pre_patches=None):
    """Geometric half of :func:`_embed_two`: patch selection, LRF
    alignment, SPT features — everything up to (but excluding) the
    descriptor-net apply. Split out so the scale-batched serving path can
    run the geometry per scale (the round-4 kernels prefer the unrolled
    chain) while batching ALL scales through ONE conv-stack call
    (the conv calls pay a large per-call context overhead — round-5
    finding, CONVCTX_r5). Returns ``(inv, R)``."""
    if pre_patches is not None:
        sp, sm, tp, tm = pre_patches
    else:
        ks1, ks2 = jax.random.split(key)
        sp, sm = select_patches(
            src.xyz, src.mask, src_kpts, des_r, ks1, statics.patch_sample,
            use_approx=not statics.exact_topk, d2=d2_src,
            use_blocks=statics.block_ball_query,
            block=statics.bq_block, cand_blocks=statics.bq_cand_blocks,
            use_strat=statics.strat_ball_query,
        )
        tp, tm = select_patches(
            tgt.xyz, tgt.mask, tgt_kpts, des_r, ks2, statics.patch_sample,
            use_approx=not statics.exact_topk, d2=d2_tgt,
            use_blocks=statics.block_ball_query,
            block=statics.bq_block, cand_blocks=statics.bq_cand_blocks,
            use_strat=statics.strat_ball_query,
        )
    patches = jnp.concatenate([sp, tp])
    pmask = jnp.concatenate([sm, tm])
    kpts = jnp.concatenate([src_kpts, tgt_kpts])
    delta = patches - kpts[:, None, :]
    aligned, _rand_axis, R = align_patches(delta, kpts, is_aligned)
    normed = aligned / des_r
    inv = _spt_features(normed, pmask, statics)
    if statics.use_bf16:
        # the descriptor stem's first act is a cast to the compute dtype;
        # casting here instead halves the feature buffer a scale-batched
        # caller concatenates (same values reach the net either way)
        inv = inv.astype(jnp.bfloat16)
    return inv, R


def _embed_two(params, statics: PipelineStatics, src: Cloud, tgt: Cloud,
               src_kpts, tgt_kpts, des_r, is_aligned, key, desc_model,
               d2_src=None, d2_tgt=None, pre_patches=None):
    """Both clouds' keypoints through one geometric+model pass.

    Patch extraction/LRF/SPT are per-keypoint ops, and the conv net is
    weight-bound at these batch sizes — stacking src and tgt (2K patches)
    costs the same math but loads the weights once. ``d2_src``/``d2_tgt``
    are the precomputed keypoint-to-cloud distance matrices (shared across
    scales — only the radius changes per scale). ``pre_patches``
    ((sp, sm, tp, tm)) skips patch selection entirely — the fused
    multi-radius stratified kernel selects every scale's patches in one
    pass during precompute."""
    inv, R = _embed_geom(
        statics, src, tgt, src_kpts, tgt_kpts, des_r, is_aligned, key,
        d2_src=d2_src, d2_tgt=d2_tgt, pre_patches=pre_patches,
    )
    out = desc_model.apply(params["desc"], inv, train=False)
    return out["desc"], out["equi"], R


def _embed(params, statics: PipelineStatics, cloud: Cloud, kpts, des_r,
           is_aligned, key, desc_model):
    """Keypoints -> (desc [K, 32], equi [K, C, ele, azi], R [K, 3, 3])."""
    patches, pmask = select_patches(
        cloud.xyz, cloud.mask, kpts, des_r, key, statics.patch_sample,
        use_approx=not statics.exact_topk,
    )
    delta = patches - kpts[:, None, :]
    aligned, _rand_axis, R = align_patches(delta, kpts, is_aligned)
    normed = aligned / des_r
    inv = _spt_features(normed, pmask, statics)
    out = desc_model.apply(params["desc"], inv, train=False)
    return out["desc"], out["equi"], R


def _gather_rows_mxu(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``x[idx]`` for row-indexed tensors as a one-hot MXU contraction.

    TPU row gathers cost per ROW regardless of width, and XLA pairs the
    big equi-map gather with a pathological layout inversion
    (TRACE_r5.jsonl: 22 ms per scale per batch — the largest single op
    on the serving critical path). A 0/1 one-hot matmul is exact row
    selection (each output row sums exactly one nonzero product), runs
    on the MXU in bf16, and emits a clean row-major result. The bf16
    pass-through matches the rounding the cost-volume stem applies to
    its inputs anyway; callers needing full precision should keep plain
    indexing.
    """
    n = x.shape[0]
    oh = jax.nn.one_hot(idx, n, dtype=jnp.bfloat16)          # [K, N]
    flat = x.reshape(n, -1).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        oh, flat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.reshape((idx.shape[0],) + x.shape[1:]).astype(x.dtype)


def _solve(statics: PipelineStatics, ss, tt, pool, valid, key):
    """Pose solve + masked-early-exit-compatible interface."""
    if statics.pose_estimator == "gnc":
        res = gnc_tls_solve(ss, tt, pool, noise_bound=statics.kiss_resolution)
        return res.pose, res.num_inliers
    res = ransac_pose(
        ss, tt, pool, valid, key,
        dist_th=statics.dist_th, similar_th=statics.similar_th,
        num_hypotheses=statics.num_hypotheses, chunk=statics.ransac_chunk,
    )
    return res.pose, res.num_inliers


class _Shared(NamedTuple):
    """Scale-independent precomputation: FPS keypoints, the dense
    keypoint-to-cloud distance matrices, the per-scale radii, and the
    (possibly clutter-filtered) cloud validity masks — every downstream
    stage must see the SAME point validity as FPS/d2 did, so the filtered
    masks travel with the precomputation.

    ``src_patches``/``tgt_patches`` ([R, K, P, 3] + valid bits) are the
    ALL-SCALE stratified patch selections when the fused multi-radius
    kernel is active (``strat_ball_query`` + divisibility): one pass over
    each d2 matrix serves every scale (the per-scale XLA query re-read
    d2 per scale — 181 MB/cloud/scale). ``None`` on other query paths."""

    src_kpts: jnp.ndarray
    tgt_kpts: jnp.ndarray
    src_kpts_v: jnp.ndarray
    tgt_kpts_v: jnp.ndarray
    d2_src: jnp.ndarray
    d2_tgt: jnp.ndarray
    radii: jnp.ndarray
    src_mask: jnp.ndarray
    tgt_mask: jnp.ndarray
    src_patches: jnp.ndarray | None = None
    src_pvalid: jnp.ndarray | None = None
    tgt_patches: jnp.ndarray | None = None
    tgt_pvalid: jnp.ndarray | None = None


class _Candidates(NamedTuple):
    """Per-correspondence pose candidates from one (or more) scales."""

    ss: jnp.ndarray      # [K, 3] src keypoints
    tt: jnp.ndarray      # [K, 3] matched tgt keypoints
    Rc: jnp.ndarray      # [K, 3, 3] candidate rotations
    tc: jnp.ndarray      # [K, 3] candidate translations
    valid: jnp.ndarray   # [K] mutual-match bits
    d2: jnp.ndarray      # [K] descriptor match distance


def _precompute(statics: PipelineStatics, src: Cloud, tgt: Cloud,
                key: jax.Array | None = None,
                scales: tuple | None = None) -> _Shared:
    # density prefilter: drop volumetric clutter BEFORE FPS (FPS greedily
    # selects isolated points, so unfiltered clutter captures the keypoint
    # budget — kernels/density.py documents the calibration)
    if statics.clutter_filter:
        from bufferx_tpu.kernels.density import density_inlier_mask

        src = Cloud(src.xyz, density_inlier_mask(src.xyz, src.mask))
        tgt = Cloud(tgt.xyz, density_inlier_mask(tgt.xyz, tgt.mask))
    # one FPS per cloud serves probes (radius estimation) and keypoints;
    # both clouds go through one vmapped call so the Pallas kernel
    # interleaves their (independent) sequential chains in one program
    st_idx, st_v = jax.vmap(
        lambda x, m: farthest_point_sampling(x, m, statics.num_probe)
    )(jnp.stack([src.xyz, tgt.xyz]), jnp.stack([src.mask, tgt.mask]))
    s_idx, t_idx = st_idx[0], st_idx[1]
    s_v, t_v = st_v[0], st_v[1]
    s_probe, t_probe = src.xyz[s_idx], tgt.xyz[t_idx]

    # one [probes, points] distance matrix per cloud, shared by radius
    # estimation and every scale's patch extraction (the dense [K, N]
    # build dominates those stages; only the radius threshold varies)
    # compensated one-pass bf16 build (~6x cheaper than the HIGHEST f32
    # path on the MXU; error <= 2^-16 |a||b| — sub-mm at scene scale, far
    # inside the voxel-size noise floor of every radius threshold).
    # The dropped lo*lo term scales with |a||b| — distance from the
    # ORIGIN, not cloud extent — so map-frame clouds ~100 m out would see
    # ~0.15 m^2 d2 error. Distances are translation-invariant: center
    # both operands on the valid-point centroid first (downstream
    # consumers only ever read d2, never these shifted coordinates).
    def _centroid(xyz, m):
        w = m.astype(jnp.float32)[:, None]
        return jnp.sum(xyz * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)

    c_src = _centroid(src.xyz, src.mask)
    c_tgt = _centroid(tgt.xyz, tgt.mask)
    d2_src = masked_sqdist(
        s_probe - c_src, src.xyz - c_src, s_v, src.mask, precise=False
    )
    d2_tgt = masked_sqdist(
        t_probe - c_tgt, tgt.xyz - c_tgt, t_v, tgt.mask, precise=False
    )

    # density-aware radii from the denser cloud (reference :654-659).
    # ``radius_source="sparser"`` flips the pick: under heavy density
    # mismatch the denser-cloud calibration leaves the sparse cloud's
    # patches with ~patch_sample/ratio points (round-5 hard-cell
    # experiment; the shared radius itself stays cloud-consistent either
    # way, which is what descriptor scale consistency needs).
    denser_src = jnp.sum(src.mask) > jnp.sum(tgt.mask)
    use_src = (
        ~denser_src if statics.radius_source == "sparser" else denser_src
    )
    pts_m = jnp.where(use_src, src.mask, tgt.mask)
    probes_m = jnp.where(use_src, s_v, t_v)
    radii = density_aware_radius_from_d2(
        jnp.where(use_src, d2_src, d2_tgt), pts_m, probes_m,
        thresholds=statics.thresholds, max_r=statics.radius_max,
        subsample=statics.radius_subsample,
    )
    nf = statics.num_fps
    sp = sv = tp = tv = None
    if (
        key is not None
        and scales is not None
        and statics.strat_ball_query
        and statics.max_points % statics.patch_sample == 0
        # packed int32 rank|coord encoding bound (strat_pallas._QBITS)
        and statics.max_points // statics.patch_sample < (1 << 7)
    ):
        from bufferx_tpu.kernels.strat_pallas import (
            ball_query_stratified_multi,
        )

        radii_used = jnp.maximum(
            radii[jnp.asarray(scales, jnp.int32)], 1e-3
        )
        ks, kt = jax.random.split(key)
        sp, sv = ball_query_stratified_multi(
            src.xyz, src.mask, s_probe[:nf], radii_used, ks,
            statics.patch_sample, d2_src[:nf],
        )
        tp, tv = ball_query_stratified_multi(
            tgt.xyz, tgt.mask, t_probe[:nf], radii_used, kt,
            statics.patch_sample, d2_tgt[:nf],
        )
    return _Shared(
        src_kpts=s_probe[:nf], tgt_kpts=t_probe[:nf],
        src_kpts_v=s_v[:nf], tgt_kpts_v=t_v[:nf],
        d2_src=d2_src, d2_tgt=d2_tgt, radii=radii,
        src_mask=src.mask, tgt_mask=tgt.mask,
        src_patches=sp, src_pvalid=sv, tgt_patches=tp, tgt_pvalid=tv,
    )


def _scale_candidates(params, statics: PipelineStatics, src: Cloud,
                      tgt: Cloud, pre: _Shared, scale, is_aligned,
                      key, desc_model, pose_model,
                      scale_pos=None) -> _Candidates:
    """One scale: embed both clouds in ONE model call (halves conv weight
    traffic and per-call overheads), match, predict SO(2), pose candidates.

    ``scale`` may be a static int or a traced scalar index (the
    scale-vmapped path maps this function over a radius-index vector).
    ``scale_pos`` is the scale's POSITION in the program's scale subset —
    the index into the precomputed all-scale patch stacks."""
    des_r = jnp.maximum(pre.radii[scale], 1e-3)
    nf = statics.num_fps
    pre_patches = None
    if pre.src_patches is not None and scale_pos is not None:
        pre_patches = (
            pre.src_patches[scale_pos], pre.src_pvalid[scale_pos],
            pre.tgt_patches[scale_pos], pre.tgt_pvalid[scale_pos],
        )
    # patch extraction sees the SAME validity as FPS/d2 (the clutter
    # prefilter's refined masks live in ``pre`` — the raw Cloud masks would
    # let filtered-out points re-enter patches via the block ball query's
    # direct re-test)
    desc2, equi2, R2 = _embed_two(
        params, statics,
        Cloud(src.xyz, pre.src_mask), Cloud(tgt.xyz, pre.tgt_mask),
        pre.src_kpts, pre.tgt_kpts, des_r,
        is_aligned, key, desc_model,
        d2_src=pre.d2_src[:nf], d2_tgt=pre.d2_tgt[:nf],
        pre_patches=pre_patches,
    )
    s_desc, t_desc = desc2[:nf], desc2[nf:]
    s_equi, t_equi = equi2[:nf], equi2[nf:]
    s_R, t_R = R2[:nf], R2[nf:]
    nn, mutual, nn_d2 = mutual_nearest(
        s_desc, t_desc, pre.src_kpts_v, pre.tgt_kpts_v
    )

    tt_kpts = pre.tgt_kpts[nn]
    ss_R, tt_R = s_R, t_R[nn]

    e = statics.ele_n
    ss_equi = s_equi[:, :, 1 : e - 1]
    if statics.mxu_gather:
        # slice first (fewer columns), then one-hot MXU row selection
        tt_equi = _gather_rows_mxu(t_equi[:, :, 1 : e - 1], nn)
    else:
        tt_equi = t_equi[nn][:, :, 1 : e - 1]
    ind = pose_model.apply(
        params["pose"], ss_equi, tt_equi, train=False,
    )
    R_c, t_c = so2_pose_candidates(
        pre.src_kpts, tt_kpts, ss_R, tt_R, ind, statics.azi_n
    )
    return _Candidates(
        ss=pre.src_kpts, tt=tt_kpts, Rc=R_c, tc=t_c, valid=mutual, d2=nn_d2
    )


def _scale_candidates_conv_batched(params, statics: PipelineStatics,
                                   src: Cloud, tgt: Cloud, pre: _Shared,
                                   scales: tuple, is_aligned, keys,
                                   desc_model, pose_model) -> list:
    """All scales' candidates with the GEOMETRY unrolled per scale but the
    two conv stacks called ONCE each on the scale-concatenated batch.

    Round-5 finding (CONVCTX_r5, RESULTS.md): inside the big program the
    per-scale conv calls cost ~3x their isolated time — most of it a
    per-call overhead that amortizes with batch. Concatenating the three
    scales' SPT features into one descriptor-net call and the three
    scales' matched equivariant pairs into one cost-volume call executes
    IDENTICAL per-patch math (BatchNorm runs on frozen running stats;
    every op is row-independent), so results match the unrolled path
    bit-for-bit while paying the call overhead once instead of three
    times per stage."""
    nf = statics.num_fps
    srcM = Cloud(src.xyz, pre.src_mask)
    tgtM = Cloud(tgt.xyz, pre.tgt_mask)

    invs, Rs = [], []
    for j, s in enumerate(scales):
        pre_patches = None
        if pre.src_patches is not None:
            pre_patches = (
                pre.src_patches[j], pre.src_pvalid[j],
                pre.tgt_patches[j], pre.tgt_pvalid[j],
            )
        inv_j, R_j = _embed_geom(
            statics, srcM, tgtM, pre.src_kpts, pre.tgt_kpts,
            jnp.maximum(pre.radii[s], 1e-3), is_aligned, keys[j],
            d2_src=pre.d2_src[:nf], d2_tgt=pre.d2_tgt[:nf],
            pre_patches=pre_patches,
        )
        invs.append(inv_j)
        Rs.append(R_j)

    out = desc_model.apply(
        params["desc"], jnp.concatenate(invs), train=False
    )
    k2 = 2 * nf
    e = statics.ele_n
    per_scale = []
    eq_pairs = []
    for j in range(len(scales)):
        desc2 = out["desc"][j * k2 : (j + 1) * k2]
        equi2 = out["equi"][j * k2 : (j + 1) * k2]
        s_desc, t_desc = desc2[:nf], desc2[nf:]
        s_equi, t_equi = equi2[:nf], equi2[nf:]
        R2 = Rs[j]
        nn, mutual, nn_d2 = mutual_nearest(
            s_desc, t_desc, pre.src_kpts_v, pre.tgt_kpts_v
        )
        tt_kpts = pre.tgt_kpts[nn]
        per_scale.append((tt_kpts, R2[:nf], R2[nf:][nn], mutual, nn_d2))
        if statics.mxu_gather:
            tt_eq = _gather_rows_mxu(t_equi[:, :, 1 : e - 1], nn)
        else:
            tt_eq = t_equi[nn][:, :, 1 : e - 1]
        eq_pairs.append((s_equi[:, :, 1 : e - 1], tt_eq))

    ind_all = pose_model.apply(
        params["pose"],
        jnp.concatenate([p[0] for p in eq_pairs]),
        jnp.concatenate([p[1] for p in eq_pairs]),
        train=False,
    )
    cands = []
    for j, (tt_kpts, ss_R, tt_R, mutual, nn_d2) in enumerate(per_scale):
        R_c, t_c = so2_pose_candidates(
            pre.src_kpts, tt_kpts, ss_R, tt_R,
            ind_all[j * nf : (j + 1) * nf], statics.azi_n,
        )
        cands.append(
            _Candidates(ss=pre.src_kpts, tt=tt_kpts, Rc=R_c, tc=t_c,
                        valid=mutual, d2=nn_d2)
        )
    return cands


def _cat_candidates(cands: list) -> _Candidates:
    return _Candidates(*(jnp.concatenate(xs) for xs in zip(*cands)))


def _all_scale_candidates(params, statics: PipelineStatics, src: Cloud,
                          tgt: Cloud, pre: _Shared, scales: tuple,
                          is_aligned, keys, desc_model,
                          pose_model) -> list:
    """Candidates for every scale in ``scales`` — scale-VMAPPED by default.

    The scales run identical programs that differ only in the descriptor
    radius, so mapping ONE traced body over a radius-index vector batches
    the whole embed/match/head chain 3x: conv matmuls triple their batch
    (better MXU utilization at these small spatial dims), model weights
    load once instead of per scale, and the shared d2 matrix feeds all
    three patch selections in one pass. ``vmap_scales=False`` falls back
    to the statically unrolled per-scale chain (the round-1..3 design).
    Returns a list of per-scale :class:`_Candidates` (leading axis
    sliced), so downstream early-exit/consensus logic is unchanged.
    """
    if not statics.vmap_scales or len(scales) == 1:
        if statics.scale_batch_conv and len(scales) > 1:
            return _scale_candidates_conv_batched(
                params, statics, src, tgt, pre, scales, is_aligned,
                keys, desc_model, pose_model,
            )
        return [
            _scale_candidates(
                params, statics, src, tgt, pre, s, is_aligned,
                keys[j], desc_model, pose_model, scale_pos=j,
            )
            for j, s in enumerate(scales)
        ]
    idx = jnp.asarray(scales, jnp.int32)
    stacked = jax.vmap(
        lambda s, j, k: _scale_candidates(
            params, statics, src, tgt, pre, s, is_aligned, k,
            desc_model, pose_model, scale_pos=j,
        )
    )(idx, jnp.arange(len(scales)), jnp.stack(keys[: len(scales)]))
    return [
        jax.tree.map(lambda x, j=j: x[j], stacked)
        for j in range(len(scales))
    ]


def _pool_and_solve(statics: PipelineStatics, cand: _Candidates, key,
                    src: Cloud, tgt: Cloud, num_scales_used: int,
                    refine: bool | None = None) -> RegistrationResult:
    """Cross-scale consensus -> sampling pool -> pose solve -> result.

    ``refine`` overrides ``statics.pose_refine`` (the timed path fences
    refinement as its own program)."""
    ss, tt, Rc, tc, valid, d2 = cand
    consensus_mask, _best, n_consensus = cross_scale_consensus(
        Rc, tc, ss, tt, valid,
        azi_n=statics.azi_n, inlier_th=statics.inlier_th,
    )
    # Sampling-pool policy (scoring always uses all mutual matches):
    #   consensus inliers when the vote is healthy; otherwise the most
    #   confident half of the matches by descriptor distance (untrained /
    #   hard pairs), and as a last resort everything valid.
    n_valid = jnp.sum(valid)
    sorted_d2 = jnp.sort(jnp.where(valid, d2, jnp.inf))
    med_idx = jnp.clip(n_valid // 2, 0, d2.shape[0] - 1)
    med = sorted_d2[med_idx]
    confident = valid & (d2 <= med)
    pool = jnp.where(
        jnp.sum(consensus_mask) >= 8,
        consensus_mask,
        jnp.where(jnp.sum(confident) >= 8, confident, valid),
    )

    pose, num_inliers = _solve(statics, ss, tt, pool, valid, key)

    if statics.pose_refine if refine is None else refine:
        pose = post_refinement(
            pose, ss, tt, valid, statics.dist_th, num_iters=statics.irls_iters
        )

    num_mutual = jnp.sum(valid).astype(jnp.int32)
    result_valid = jnp.any(src.mask) & jnp.any(tgt.mask) & (num_mutual >= 3)
    pose = jnp.where(result_valid, pose, jnp.eye(4, dtype=pose.dtype))
    return RegistrationResult(
        pose=pose,
        num_inliers=num_inliers,
        num_mutual=num_mutual,
        num_consensus=n_consensus.astype(jnp.int32),
        scales_used=jnp.asarray(num_scales_used, jnp.int32),
        valid=result_valid,
    )


def _register_impl(params, statics: PipelineStatics, src: Cloud, tgt: Cloud,
                   is_aligned, key, scales: tuple):
    """Core pipeline over the given static scale subset."""
    desc_model, pose_model = _models_from_statics(statics)
    keys = jax.random.split(key, 4 + 2 * len(scales))
    pre = _precompute(statics, src, tgt, keys[1], scales)
    cands = _all_scale_candidates(
        params, statics, src, tgt, pre, scales, is_aligned,
        [keys[4 + 2 * j] for j in range(len(scales))],
        desc_model, pose_model,
    )
    return _pool_and_solve(
        statics, _cat_candidates(cands), keys[0], src, tgt, len(scales)
    )


@functools.lru_cache(maxsize=None)
def _models_from_statics(statics: PipelineStatics):
    dt = jnp.bfloat16 if statics.use_bf16 else jnp.float32
    desc = MiniSpinNet(
        rad_n=statics.rad_n, ele_n=statics.ele_n, azi_n=statics.azi_n,
        compute_dtype=dt, mode=statics.desc_mode, pool=statics.desc_pool,
        fused_conv=statics.fused_conv, width=statics.desc_width,
    )
    pose = CostVolume(azi_n=statics.azi_n, compute_dtype=dt)
    return desc, pose


@functools.partial(jax.jit, static_argnames=("statics", "scales"))
def register_pair_jit(
    params: Any,
    statics: PipelineStatics,
    src: Cloud,
    tgt: Cloud,
    is_aligned: jnp.ndarray,
    key: jax.Array,
    scales: tuple | None = None,
) -> RegistrationResult:
    scales = scales if scales is not None else tuple(range(statics.num_scales))
    if statics.enable_early_exit and len(scales) > 1:
        # masked early exit: identical results to the reference's branch —
        # prefer the scale-0 solution when it is confident. Embedding and
        # candidate generation run ONCE per scale; only the (cheap)
        # consensus+solve runs twice (scale-0 pool and full pool), so this
        # costs ~the no-early-exit program plus one extra solve.
        desc_model, pose_model = _models_from_statics(statics)
        keys = jax.random.split(key, 4 + 2 * len(scales))
        pre = _precompute(statics, src, tgt, keys[1], scales)
        cands = _all_scale_candidates(
            params, statics, src, tgt, pre, scales, is_aligned,
            [keys[4 + 2 * j] for j in range(len(scales))],
            desc_model, pose_model,
        )
        res0 = _pool_and_solve(statics, cands[0], keys[0], src, tgt, 1)
        res_all = _pool_and_solve(
            statics, _cat_candidates(cands), keys[0], src, tgt, len(scales)
        )
        take0 = res0.num_inliers >= statics.early_exit_min_inliers
        pick = lambda a, b: jnp.where(take0, a, b)  # noqa: E731
        return RegistrationResult(
            pose=pick(res0.pose, res_all.pose),
            num_inliers=pick(res0.num_inliers, res_all.num_inliers),
            num_mutual=pick(res0.num_mutual, res_all.num_mutual),
            num_consensus=pick(res0.num_consensus, res_all.num_consensus),
            scales_used=pick(res0.scales_used, res_all.scales_used),
            valid=pick(res0.valid, res_all.valid),
        )
    return _register_impl(params, statics, src, tgt, is_aligned, key, scales)


def register_pair(
    cfg: Config,
    src: Cloud,
    tgt: Cloud,
    key: jax.Array,
    params: Any = None,
    is_aligned: bool | jnp.ndarray | None = None,
) -> RegistrationResult:
    """Convenience wrapper: derives statics from cfg; inits params if absent."""
    statics = PipelineStatics.from_config(cfg)
    if params is None:
        params = init_params(cfg, jax.random.PRNGKey(0))
    if is_aligned is None:
        is_aligned = cfg.patch.is_aligned_to_global_z
    return register_pair_jit(
        params, statics, src, tgt, jnp.asarray(is_aligned), key
    )


@functools.partial(jax.jit, static_argnames=("statics", "scales"))
def _register_batch_jit(params, statics, src, tgt, aligned, keys, scales):
    return jax.vmap(
        lambda s, t, a, k: register_pair_jit(
            params, statics, s, t, a, k, scales=scales
        )
    )(src, tgt, aligned, keys)


@functools.partial(jax.jit, static_argnames=("statics", "scales"))
def _batch_candidates_jit(params, statics, src, tgt, aligned, keys, scales):
    """Batched candidate generation (stage 1 of the split serving path)."""
    def one(s, t, a, k):
        desc_model, pose_model = _models_from_statics(statics)
        ks = jax.random.split(k, 4 + 2 * len(scales))
        pre = _precompute(statics, Cloud(*s), Cloud(*t), ks[1], scales)
        cands = _all_scale_candidates(
            params, statics, Cloud(*s), Cloud(*t), pre, scales, a,
            [ks[4 + 2 * j] for j in range(len(scales))],
            desc_model, pose_model,
        )
        return _cat_candidates(cands), ks[0]

    return jax.vmap(one)(tuple(src), tuple(tgt), aligned, keys)


@functools.partial(jax.jit, static_argnames=("statics", "num_scales_used"))
def _batch_solve_jit(statics, cand, keys, src, tgt, num_scales_used):
    """Batched consensus + solve (stage 2 of the split serving path)."""
    return jax.vmap(
        lambda c, k, s, t: _pool_and_solve(
            statics, _Candidates(*c), k, Cloud(*s), Cloud(*t),
            num_scales_used,
        )
    )(tuple(cand), keys, tuple(src), tuple(tgt))


def register_batch_split(params, statics, src, tgt, aligned, keys,
                         scales: tuple):
    """Batched registration as TWO dispatched programs (candidates, then
    consensus+solve) instead of one fused program.

    Diagnostic/serving alternative for the B=8 fused-program anomaly
    (round-2 finding: the fused vmapped program runs ~1.6x slower than its
    own stage sum; splitting at the candidates/solve boundary gives XLA
    two smaller scheduling problems). Dispatch is async, so the extra
    program boundary costs one host->device program launch, not a round
    trip."""
    cand, solve_keys = _batch_candidates_jit(
        params, statics, src, tgt, aligned, keys, scales
    )
    return _batch_solve_jit(
        statics, cand, solve_keys, src, tgt, len(scales)
    )


def stack_clouds(clouds: list) -> Cloud:
    """[Cloud, ...] -> Cloud with a leading batch axis."""
    return Cloud(
        xyz=jnp.stack([c.xyz for c in clouds]),
        mask=jnp.stack([c.mask for c in clouds]),
    )


def register_pairs_batched(
    cfg: Config,
    srcs: list,
    tgts: list,
    key: jax.Array,
    params: Any,
    is_aligned: bool | jnp.ndarray,
    batch_size: int = 4,
    split: bool = False,
) -> list:
    """Batched serving mode: registers ``len(srcs)`` pairs at fixed batch
    size with two-phase early exit.

    TPU-first counterpart of the reference's one-pair-at-a-time loop
    (``test.py:132-146``): phase 1 runs scale 0 for the whole batch in one
    program (vmap over the jitted pipeline); pairs that fail the
    early-exit confidence check are re-run through the full multi-scale
    program, padded back up to ``batch_size`` so both phases reuse one
    compiled executable each. Returns a list of RegistrationResult.
    ``split`` dispatches each batch as two programs
    (:func:`register_batch_split`) instead of one fused program.
    """
    statics = dataclasses.replace(
        PipelineStatics.from_config(cfg), enable_early_exit=False
    )
    batch_fn = register_batch_split if split else _register_batch_jit
    n = len(srcs)
    all_scales = tuple(range(statics.num_scales))
    aligned = jnp.broadcast_to(jnp.asarray(is_aligned), (batch_size,))
    results: list = [None] * n

    # phase 1: dispatch scale-0 for EVERY batch before any host sync — jax
    # dispatch is async, so the device (and the tunnel, under axon) streams
    # batch programs back-to-back instead of paying a host round trip per
    # batch (the per-batch inlier fetch used to sit on the critical path).
    staged = []
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        pad = [idx[-1]] * (batch_size - len(idx))
        take = idx + pad
        sb = stack_clouds([srcs[i] for i in take])
        tb = stack_clouds([tgts[i] for i in take])
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, batch_size)
        res0 = batch_fn(
            params, statics, sb, tb, aligned, keys, (0,)
        )
        staged.append((idx, keys, res0))

    # phase 2: fetch confidences (first fetch syncs; later ones are done),
    # re-dispatch unconfident pairs through the full multi-scale program.
    # Results are materialized on host ONE BATCH AT A TIME (device_get of
    # the whole batch pytree) and sliced in numpy: per-pair device slices
    # would each be their own tiny dispatch + transfer, which serializes on
    # transport latency (measured ~45 ms/round-trip through the axon
    # tunnel — 16 pair slices cost more than the batch compute itself).
    for idx, keys, res0 in staged:
        res0_h = jax.device_get(res0)
        inl = res0_h.num_inliers
        redo = [
            j for j, i in enumerate(idx)
            if inl[j] < statics.early_exit_min_inliers
        ]
        res_full_h = None
        if redo:
            take2 = [idx[0] + 0] * batch_size
            for slot, j in enumerate(redo):
                take2[slot] = idx[j]
            sb2 = stack_clouds([srcs[i] for i in take2])
            tb2 = stack_clouds([tgts[i] for i in take2])
            res_full_h = jax.device_get(batch_fn(
                params, statics, sb2, tb2, aligned, keys, all_scales
            ))
        for j, i in enumerate(idx):
            if j in redo and res_full_h is not None:
                slot = redo.index(j)
                results[i] = jax.tree.map(lambda x: x[slot], res_full_h)
            else:
                results[i] = jax.tree.map(lambda x: x[j], res0_h)
    return results


@functools.partial(jax.jit, static_argnames=("statics", "scales"))
def _candidates_stage_jit(params, statics: PipelineStatics, src: Cloud,
                          tgt: Cloud, is_aligned, key, scales: tuple):
    desc_model, pose_model = _models_from_statics(statics)
    keys = jax.random.split(key, 4 + 2 * len(scales))
    pre = _precompute(statics, src, tgt, keys[1], scales)
    cands = _all_scale_candidates(
        params, statics, src, tgt, pre, scales, is_aligned,
        [keys[4 + 2 * j] for j in range(len(scales))],
        desc_model, pose_model,
    )
    return _cat_candidates(cands), keys[0]


@functools.partial(jax.jit, static_argnames=("statics", "num_scales_used"))
def _solve_stage_jit(statics: PipelineStatics, cand: _Candidates, key,
                     src: Cloud, tgt: Cloud, num_scales_used: int):
    return _pool_and_solve(
        statics, cand, key, src, tgt, num_scales_used, refine=False
    )


@functools.partial(jax.jit, static_argnames=("statics",))
def _refine_stage_jit(statics: PipelineStatics, pose, cand: _Candidates,
                      valid):
    refined = post_refinement(
        pose, cand.ss, cand.tt, cand.valid, statics.dist_th,
        num_iters=statics.irls_iters,
    )
    return jnp.where(valid, refined, jnp.eye(4, dtype=pose.dtype))


def _fence(x):
    """Synchronize on a (small) device value: scalar-sized host fetch —
    works over the axon tunnel, where ``block_until_ready`` is a no-op."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf)


def register_pair_timed(
    params: Any,
    statics: PipelineStatics,
    src: Cloud,
    tgt: Cloud,
    is_aligned: jnp.ndarray,
    key: jax.Array,
):
    """Per-phase fenced registration: the TPU counterpart of the reference's
    ``enable_timing`` decomposition (``models/BUFFERX.py:297,314-316,
    369-374,419-421`` — CUDA-event ranges threaded through forward).

    Runs the pipeline as three separately jitted, host-fenced programs and
    returns ``(result, phases)`` where ``phases`` has seconds for:

    - ``desc_time``: FPS + radii + patch extraction + descriptor net +
      mutual matching + SO(2) head (candidate generation, all scales)
    - ``pose_time``: cross-scale consensus + pose solver (RANSAC/GNC)
    - ``pose_optim_time``: IRLS post-refinement (0.0 when disabled)

    The result equals the untimed full multi-scale program's (early exit is
    a serving-latency feature, not part of the reference timing protocol).
    Fencing costs ~2 extra host syncs per pair, so the phase sum slightly
    exceeds the single-program latency — use the untimed path for
    throughput numbers.
    """
    import time

    scales = tuple(range(statics.num_scales))
    t0 = time.perf_counter()
    cand, solve_key = _candidates_stage_jit(
        params, statics, src, tgt, is_aligned, key, scales
    )
    _fence(cand.d2)
    t1 = time.perf_counter()
    res = _solve_stage_jit(statics, cand, solve_key, src, tgt, len(scales))
    _fence(res.pose)
    t2 = time.perf_counter()
    if statics.pose_refine:
        pose = _refine_stage_jit(statics, res.pose, cand, res.valid)
        _fence(pose)
        res = res._replace(pose=pose)
    t3 = time.perf_counter()
    phases = {
        "desc_time": t1 - t0,
        "pose_time": t2 - t1,
        "pose_optim_time": (t3 - t2) if statics.pose_refine else 0.0,
    }
    return res, phases


def register_pair_early_exit(
    cfg: Config,
    src: Cloud,
    tgt: Cloud,
    key: jax.Array,
    params: Any,
    is_aligned: bool | jnp.ndarray,
) -> RegistrationResult:
    """Host-dispatched early exit: runs scale 0 only, and only falls back to
    the full multi-scale program when unconfident — the latency-saving
    variant of BUFFER-X++'s incremental processing (two compiled programs,
    amortized after the first call)."""
    statics = PipelineStatics.from_config(cfg)
    statics0 = dataclasses.replace(statics, enable_early_exit=False)
    res0 = register_pair_jit(
        params, statics0, src, tgt, jnp.asarray(is_aligned), key, scales=(0,)
    )
    if int(res0.num_inliers) >= statics.early_exit_min_inliers:
        return res0
    return register_pair_jit(
        params, statics0, src, tgt, jnp.asarray(is_aligned), key,
        scales=tuple(range(statics.num_scales)),
    )
