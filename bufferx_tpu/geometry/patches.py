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
import warnings

import jax
import jax.numpy as jnp

from bufferx_tpu.kernels.neighbors import (
    ball_query,
    ball_query_blocks,
    ball_query_stratified,
)

__all__ = ["select_patches"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "patch_sample", "use_approx", "use_blocks", "block", "cand_blocks",
        "use_strat",
    ),
)
def select_patches(
    pts: jnp.ndarray,
    pts_mask: jnp.ndarray,
    kpts: jnp.ndarray,
    radius: jnp.ndarray,
    key: jax.Array,
    patch_sample: int,
    use_approx: bool = True,
    d2: jnp.ndarray | None = None,
    use_blocks: bool = False,
    block: int = 32,
    cand_blocks: int = 64,
    use_strat: bool = False,
):
    """Returns (patches [K, P, 3] absolute coords, patch_mask [K, P]).

    ``d2``: optional precomputed [K, N] squared keypoint-to-cloud distances
    (shared across scales by the pipeline). ``use_blocks`` selects the
    two-level block ball query (:func:`ball_query_blocks` — one packed
    block-row gather instead of a per-point row gather, with exact
    sparse-patch capture); it requires ``d2`` and a cloud size divisible
    by ``block``. NOTE: at production shapes the block path measured ~28%
    slower than the flat approx path (HEADTOHEAD_r4_geom_full.jsonl), so
    it is off by default — it remains available for workloads where the
    exact-capture property matters more than throughput.
    ``block``/``cand_blocks`` set the block geometry (gather rows per
    center = ``cand_blocks``; candidate pool = the product).

    ``use_strat`` selects the gather-free stratified kernel
    (:func:`ball_query_stratified` — the round-4 production default: the
    [K, patch_sample]-row coordinate gather the other two paths share is
    the single largest stage cost in the fused profile); requires ``d2``
    and ``n % patch_sample == 0``, with the same loud fallback."""
    n = pts.shape[0]
    if use_strat and d2 is not None and n % patch_sample == 0:
        return ball_query_stratified(
            pts, pts_mask, kpts, radius, key, patch_sample, d2
        )
    if use_strat:
        warnings.warn(
            "select_patches: stratified ball query requested but falling "
            f"back (n={n}, patch_sample={patch_sample}, "
            f"d2={'set' if d2 is not None else 'None'}) — make "
            "capacity.max_points divisible by patch.num_points_per_patch "
            "and pass d2, or choose another ball-query path explicitly.",
            stacklevel=2,
        )
    if (
        use_blocks
        and d2 is not None
        and n % block == 0
        and min(cand_blocks, n // block) * block >= patch_sample
    ):
        return ball_query_blocks(
            pts, pts_mask, kpts, radius, key, patch_sample, d2,
            block=block, cand_blocks=min(cand_blocks, n // block),
        )
    if use_blocks:
        # A silent fallback here once shipped a config that claimed
        # block_ball_query=True while production ran the flat path
        # (max_points not divisible by bq_block) — and the two paths have
        # different cost AND capture behavior. Fail loudly at trace time.
        warnings.warn(
            "select_patches: block ball query requested but falling back to "
            f"the flat path (n={n}, block={block}, cand_blocks={cand_blocks}"
            f", patch_sample={patch_sample}, d2={'set' if d2 is not None else 'None'}) — "
            "make capacity.max_points divisible by patch.bq_block and pass "
            "d2, or set patch.block_ball_query=False explicitly.",
            stacklevel=2,
        )
    idx, valid = ball_query(
        pts, pts_mask, kpts, radius, key, patch_sample,
        use_approx=use_approx, d2=d2,
    )
    gathered = pts[idx]                                   # [K, P, 3]
    patches = jnp.where(valid[..., None], gathered, kpts[:, None, :])
    return patches, valid
