"""Massively-parallel correspondence RANSAC.

Replaces the Open3D CPU solver
(``/root/reference/models/pose_estimator.py:84-117``): instead of 50k
sequential hypothesize-and-verify rounds with early convergence, we draw a
fixed budget of minimal 3-point sets, solve all of them with the batched
Horn/Kabsch closed form, apply Open3D's correspondence checkers
(edge-length similarity + post-transform distance) as masks, and score every
surviving hypothesis against the full correspondence set — one
matmul-shaped sweep per hypothesis chunk, entirely on device. The winner's
inlier set gets one weighted-Kabsch refit (the reference follows RANSAC with
IRLS when ``pose_refine`` is on; the single refit matches Open3D's
model-estimation-on-inliers behavior).

A few thousand *independent* hypotheses drawn from the consensus-filtered
pool reach the same success probability as Open3D's 50k budget with its
0.999 confidence early exit, because the pool here is already mostly
inliers; the budget is configurable (``CapacityConfig.num_ransac_hypotheses``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bufferx_tpu.core.linalg import kabsch
from bufferx_tpu.core.se3 import integrate

__all__ = ["ransac_pose", "RansacResult"]


class RansacResult(NamedTuple):
    pose: jnp.ndarray          # [4, 4]
    num_inliers: jnp.ndarray   # scalar int32
    inlier_mask: jnp.ndarray   # [C]
    best_score: jnp.ndarray    # scalar int32 (same as num_inliers)


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "chunk")
)
def ransac_pose(
    src: jnp.ndarray,        # [C, 3]
    tgt: jnp.ndarray,        # [C, 3]
    pool_mask: jnp.ndarray,  # [C] sampling pool (e.g. consensus inliers)
    eval_mask: jnp.ndarray,  # [C] correspondences to score against
    key: jax.Array,
    dist_th: float,
    similar_th: float = 0.8,
    num_hypotheses: int = 8192,
    chunk: int = 2048,
) -> RansacResult:
    c = src.shape[0]
    # guard: empty pool falls back to eval_mask, then to uniform
    pool = jnp.where(
        jnp.any(pool_mask), pool_mask,
        jnp.where(jnp.any(eval_mask), eval_mask, jnp.ones_like(pool_mask)),
    )
    # uniform-over-pool sampling WITHOUT the categorical: categorical with
    # 0/-inf logits draws gumbel noise for every (hypothesis, point) pair —
    # ~10^8 threefry evaluations per solve. Rank-select instead: draw a
    # uniform rank in [0, |pool|), then idx = #\{cum <= rank\} via one
    # broadcast compare-sum (same distribution; modulo bias <= |pool|/2^30).
    cum = jnp.cumsum(pool.astype(jnp.int32))                # [C] inclusive
    npool = jnp.maximum(cum[-1], 1)
    ranks = (
        jax.random.randint(
            key, (num_hypotheses, 3), 0, jnp.int32(1 << 30),
            dtype=jnp.int32,
        )
        % npool
    )                                                       # [H, 3]
    sel = jnp.sum(
        cum[None, None, :] <= ranks[..., None], axis=-1
    ).astype(jnp.int32)                                     # [H, 3]
    a = src[sel]                                            # [H, 3, 3]
    b = tgt[sel]

    # --- Open3D CorrespondenceCheckerBasedOnEdgeLength (pose_estimator.py:102)
    rolled_a = jnp.roll(a, 1, axis=1)
    rolled_b = jnp.roll(b, 1, axis=1)
    ea = jnp.linalg.norm(a - rolled_a, axis=-1)             # [H, 3] edges
    eb = jnp.linalg.norm(b - rolled_b, axis=-1)
    ratio = jnp.minimum(ea, eb) / jnp.maximum(jnp.maximum(ea, eb), 1e-12)
    edge_ok = jnp.all(ratio > similar_th, axis=-1)          # [H]

    # --- batched minimal-set Kabsch (Horn quaternion, proper rotations)
    R, t = kabsch(a, b)                                     # [H, 3, 3], [H, 3]

    # --- Open3D CorrespondenceCheckerBasedOnDistance on the minimal set
    hp = jax.lax.Precision.HIGHEST
    wa = jnp.einsum("hij,hnj->hni", R, a, precision=hp) + t[:, None, :]
    dist_ok = jnp.all(
        jnp.linalg.norm(wa - b, axis=-1) <= dist_th, axis=-1
    )
    hyp_ok = edge_ok & dist_ok

    # --- score all hypotheses against the masked correspondence set
    n_chunks = (num_hypotheses + chunk - 1) // chunk

    def score_chunk(args):
        Rc, tc, ok = args
        warped = (
            jnp.einsum("hij,cj->hci", Rc, src, precision=hp) + tc[:, None, :]
        )
        d = jnp.linalg.norm(warped - tgt[None], axis=-1)
        counts = jnp.sum((d < dist_th) & eval_mask[None, :], axis=-1)
        return jnp.where(ok, counts, -1)

    scores = jax.lax.map(
        score_chunk,
        (
            R.reshape(n_chunks, chunk, 3, 3),
            t.reshape(n_chunks, chunk, 3),
            hyp_ok.reshape(n_chunks, chunk),
        ),
    ).reshape(-1)

    best = jnp.argmax(scores)
    R_best, t_best = R[best], t[best]

    warped = jnp.einsum("ij,cj->ci", R_best, src, precision=hp) + t_best
    inlier_mask = (
        jnp.linalg.norm(warped - tgt, axis=-1) < dist_th
    ) & eval_mask

    # refit on the winning inlier set (weighted Kabsch; falls back to the
    # minimal-set pose when <3 inliers)
    w = inlier_mask.astype(src.dtype)
    R_fit, t_fit = kabsch(src, tgt, w)
    enough = jnp.sum(w) >= 3
    R_out = jnp.where(enough, R_fit, R_best)
    t_out = jnp.where(enough, t_fit, t_best)

    warped2 = jnp.einsum("ij,cj->ci", R_out, src, precision=hp) + t_out
    final_mask = (
        jnp.linalg.norm(warped2 - tgt, axis=-1) < dist_th
    ) & eval_mask
    num = jnp.sum(final_mask).astype(jnp.int32)
    return RansacResult(integrate(R_out, t_out), num, final_mask, num)
