"""Per-stage device timing of the registration pipeline at production shapes.

Times each pipeline stage as its own jitted program (B pairs, vmapped like
the batched serving mode) with scalar-fetch synchronization (the axon
tunnel's ``block_until_ready`` is a no-op — see
``.claude/skills/verify/SKILL.md``). Stage sums exceed the fused program's
time (XLA overlaps/fuses across stage boundaries); use the relative split.

Usage: python scripts/profile_stages.py [--batch 4] [--scales 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--scales", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--mode", choices=["sampled", "moments"],
                    default="sampled")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.geometry.cylindrical import spatial_point_transformer
    from bufferx_tpu.geometry.lrf import align_patches
    from bufferx_tpu.geometry.patches import select_patches
    from bufferx_tpu.kernels.fps import fps
    from bufferx_tpu.kernels.neighbors import masked_sqdist, mutual_nearest
    from bufferx_tpu.kernels.radius import density_aware_radius_from_d2
    from bufferx_tpu.pipeline.registration import (
        PipelineStatics,
        _models_from_statics,
        init_params,
        prepare_cloud,
    )
    from bufferx_tpu.solver.consensus import cross_scale_consensus
    from bufferx_tpu.solver.irls import post_refinement
    from bufferx_tpu.solver.ransac import ransac_pose
    from bufferx_tpu.solver.so2 import so2_pose_candidates

    from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap

    cfg = make_cfg("ModelNet40").override(patch=dict(desc_mode=args.mode))
    s = PipelineStatics.from_config(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    B = args.batch
    print(f"device={jax.devices()[0]} batch={B} statics={s}")

    srcs, tgts = [], []
    for i in range(B):
        rs = np.random.RandomState(i)
        a, b, _ = synthetic_pair_full_overlap(rs, num_points=24000)
        srcs.append(prepare_cloud(a, cfg, seed=i))
        tgts.append(prepare_cloud(b, cfg, seed=i))
    sx = jnp.stack([c.xyz for c in srcs])      # [B, N, 3]
    sm = jnp.stack([c.mask for c in srcs])
    tx = jnp.stack([c.xyz for c in tgts])
    tm = jnp.stack([c.mask for c in tgts])

    def sync(x):
        leaves = jax.tree.leaves(x)
        return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))

    def bench(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        sync(out)  # compile + 1 run
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(*xs)
            sync(out)
        dt = (time.perf_counter() - t0) / args.reps * 1000
        print(f"{name:34s} {dt:8.2f} ms  ({dt / B:6.2f} ms/pair)")
        return out

    # ---- stage 1: FPS (both clouds in one vmap) --------------------------
    def run_fps(sx, sm, tx, tm):
        def one(x4, m4):
            return jax.vmap(lambda x, m: fps(x, m, s.num_probe))(x4, m4)
        si, sv = one(sx, sm)
        ti, tv = one(tx, tm)
        return si, sv, ti, tv

    si, sv, ti, tv = bench("fps (2 clouds)", run_fps, sx, sm, tx, tm)
    s_probe = jnp.take_along_axis(sx, si[..., None], axis=1)
    t_probe = jnp.take_along_axis(tx, ti[..., None], axis=1)

    # ---- stage 2: keypoint-to-cloud distance matrices --------------------
    def run_d2(s_probe, sx, sv, sm, t_probe, tx, tv, tm):
        d2s = jax.vmap(masked_sqdist)(s_probe, sx, sv, sm)
        d2t = jax.vmap(masked_sqdist)(t_probe, tx, tv, tm)
        return d2s, d2t

    d2s, d2t = bench("d2 matrices (2x [K,N])", run_d2,
                     s_probe, sx, sv, sm, t_probe, tx, tv, tm)

    # ---- stage 3: radius estimation --------------------------------------
    def run_radius(d2s, sm, sv):
        return jax.vmap(
            lambda d, pm, qm: density_aware_radius_from_d2(
                d, pm, qm, thresholds=s.thresholds, max_r=s.radius_max
            )
        )(d2s, sm, sv)

    radii = bench("radius estimation", run_radius, d2s, sm, sv)

    nf = s.num_fps
    kpts_s = s_probe[:, :nf]
    kpts_t = t_probe[:, :nf]
    kv_s = sv[:, :nf]
    kv_t = tv[:, :nf]
    des_r = jnp.maximum(radii[:, 0], 1e-3)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, B)

    # ---- stage 4: patch selection (src+tgt) -------------------------------
    def run_patches(sx, sm, kpts_s, des_r, d2s, tx, tm, kpts_t, d2t, keys):
        def one(px, pm, kp, r, d2, k):
            # mirrors _embed_two: the production path's block ball query
            # (and geometry) must be what gets profiled
            return select_patches(px, pm, kp, r, k, s.patch_sample,
                                  use_approx=not s.exact_topk,
                                  d2=d2[:, : px.shape[0]],
                                  use_blocks=s.block_ball_query,
                                  block=s.bq_block,
                                  cand_blocks=s.bq_cand_blocks)
        sp, smk = jax.vmap(one)(sx, sm, kpts_s, des_r, d2s[:, :nf], keys)
        tp, tmk = jax.vmap(one)(tx, tm, kpts_t, des_r, d2t[:, :nf], keys)
        return (jnp.concatenate([sp, tp], axis=1),
                jnp.concatenate([smk, tmk], axis=1))

    patches, pmask = bench("select_patches (src+tgt)", run_patches,
                           sx, sm, kpts_s, des_r, d2s, tx, tm, kpts_t,
                           d2t, keys)
    kpts2 = jnp.concatenate([kpts_s, kpts_t], axis=1)

    # ---- stage 5: LRF align ----------------------------------------------
    def run_lrf(patches, kpts2):
        delta = patches - kpts2[:, :, None, :]
        return jax.vmap(
            lambda d, k: align_patches(d, k, jnp.asarray(False))
        )(delta, kpts2)

    aligned, _ax, R2 = bench("LRF align", run_lrf, patches, kpts2)
    normed = aligned / des_r[:, None, None, None]

    # ---- stage 6: SPT (or moment pooling, per --mode) -----------------------
    g = s.rad_n * s.ele_n * s.azi_n

    if args.mode == "moments":
        from bufferx_tpu.pipeline.registration import _spt_features

        def run_spt(normed, pmask):
            return jax.vmap(lambda p, m: _spt_features(p, m, s))(
                normed, pmask
            )

        inv = bench("moment pooling + features", run_spt, normed, pmask)
    else:
        def run_spt(normed, pmask):
            out = jax.vmap(
                lambda p, m: spatial_point_transformer(
                    p, m, rad_n=s.rad_n, ele_n=s.ele_n, azi_n=s.azi_n,
                    delta=s.delta, nsample=s.voxel_sample,
                    chunk=s.sphere_chunk,
                )
            )(normed, pmask)
            # flatten trailing dims: [.., 10, 3] pads to [.., 16, 128] in
            # tiled layout when materialized at a program boundary (41 GB!)
            return out.reshape(B, out.shape[1], -1)

        inv = bench("SPT (cell query + derotate)", run_spt, normed, pmask)
        inv = inv.reshape(B, inv.shape[1], g, s.voxel_sample, 3)

    # ---- stage 7: descriptor net ------------------------------------------
    desc_model, pose_model = _models_from_statics(s)

    def run_desc(inv):
        return jax.vmap(
            lambda x: desc_model.apply(params["desc"], x, train=False)
        )(inv)

    out = bench("MiniSpinNet conv stack", run_desc, inv)
    desc2, equi2 = out["desc"], out["equi"]

    # ---- stage 8: mutual matching ------------------------------------------
    def run_match(desc2, kv_s, kv_t):
        return jax.vmap(mutual_nearest)(
            desc2[:, :nf], desc2[:, nf:], kv_s, kv_t
        )

    nn, mutual, nn_d2 = bench("mutual matching", run_match, desc2, kv_s, kv_t)

    # ---- stage 9: SO(2) pose head -------------------------------------------
    e = s.ele_n

    def run_pose(equi2, nn):
        ss_e = equi2[:, :nf, :, 1 : e - 1]
        tt_e = jnp.take_along_axis(
            equi2[:, nf:, :, 1 : e - 1], nn[:, :, None, None, None], axis=1
        )
        return jax.vmap(
            lambda a, b: pose_model.apply(params["pose"], a, b, train=False)
        )(ss_e, tt_e)

    ind = bench("CostVolume SO(2) head", run_pose, equi2, nn)

    # ---- stage 10: candidates + consensus ------------------------------------
    def run_consensus(kpts_s, kpts_t, nn, R2, ind, mutual):
        ss_R = R2[:, :nf]
        tt_R = jnp.take_along_axis(
            R2[:, nf:], nn[:, :, None, None], axis=1
        )
        tt_k = jnp.take_along_axis(kpts_t, nn[:, :, None], axis=1)
        Rc, tc = jax.vmap(
            lambda a, b, c, d, i: so2_pose_candidates(a, b, c, d, i, s.azi_n)
        )(kpts_s, tt_k, ss_R, tt_R, ind)
        return jax.vmap(
            lambda R, t, a, b, v: cross_scale_consensus(
                R, t, a, b, v, azi_n=s.azi_n, inlier_th=s.inlier_th
            )
        )(Rc, tc, kpts_s, tt_k, mutual) + (tt_k,)

    cons_mask, best, ncons, tt_k = bench(
        "SO2 candidates + consensus", run_consensus,
        kpts_s, kpts_t, nn, R2, ind, mutual)

    # ---- stage 11: RANSAC + IRLS ---------------------------------------------
    def run_solve(kpts_s, tt_k, cons_mask, mutual, keys):
        def one(ss, tt, pool, valid, k):
            res = ransac_pose(
                ss, tt, pool, valid, k, dist_th=s.dist_th,
                similar_th=s.similar_th, num_hypotheses=s.num_hypotheses,
                chunk=s.ransac_chunk,
            )
            pose = post_refinement(res.pose, ss, tt, valid, s.dist_th,
                                   num_iters=s.irls_iters)
            return pose, res.num_inliers
        return jax.vmap(one)(kpts_s, tt_k, cons_mask, mutual, keys)

    bench("RANSAC + IRLS", run_solve, kpts_s, tt_k, cons_mask, mutual, keys)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
