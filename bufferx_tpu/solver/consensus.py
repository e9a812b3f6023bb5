"""Cross-scale consensus maximization over per-correspondence poses.

Reference: ``models/BUFFERX.py:398-417`` — every correspondence proposes an
SE(3) candidate; each candidate is scored by how many correspondences it
brings within a distance-proportional threshold
(``thr_j = ||ss_j|| * π/azi_n * inlier_th``); the argmax candidate's inlier
set seeds the pose solver.

The naive cost is a dense [C, C] candidate×point check (C up to
num_scales * num_fps = 4.5k). We evaluate it in candidate chunks with
``lax.map`` so the transient stays ~chunk×C×3 — MXU/VPU-regular work, no
host round trip (the reference moves inlier indices to numpy at :416).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["cross_scale_consensus"]


@functools.partial(jax.jit, static_argnames=("azi_n", "chunk"))
def cross_scale_consensus(
    R_cand: jnp.ndarray,    # [C, 3, 3]
    t_cand: jnp.ndarray,    # [C, 3]
    ss_kpts: jnp.ndarray,   # [C, 3]
    tt_kpts: jnp.ndarray,   # [C, 3]
    valid: jnp.ndarray,     # [C] correspondence validity
    azi_n: int,
    inlier_th: float,
    chunk: int = 512,
):
    """Returns (inlier_mask [C], best_idx scalar, best_count scalar).

    ``inlier_mask`` is the best candidate's inlier set intersected with
    ``valid`` — the correspondence pool handed to RANSAC/GNC.
    """
    c = ss_kpts.shape[0]
    thr = (
        jnp.linalg.norm(ss_kpts, axis=-1) * (jnp.pi / azi_n) * inlier_th
    )                                                        # [C] per-point
    hp = jax.lax.Precision.HIGHEST

    n_chunks = (c + chunk - 1) // chunk
    pad = n_chunks * chunk - c
    Rp = jnp.pad(R_cand, ((0, pad), (0, 0), (0, 0)))
    tp = jnp.pad(t_cand, ((0, pad), (0, 0)))
    vp = jnp.pad(valid, (0, pad))

    def score_chunk(args):
        Rc, tc, vc = args                                   # [chunk, ...]
        warped = (
            jnp.einsum("hij,cj->hci", Rc, ss_kpts, precision=hp)
            + tc[:, None, :]
        )                                                    # [chunk, C, 3]
        d = jnp.linalg.norm(warped - tt_kpts[None], axis=-1)
        sign = (d < thr[None, :]) & valid[None, :]
        counts = jnp.sum(sign, axis=-1)
        return jnp.where(vc, counts, -1)

    counts = jax.lax.map(
        score_chunk,
        (
            Rp.reshape(n_chunks, chunk, 3, 3),
            tp.reshape(n_chunks, chunk, 3),
            vp.reshape(n_chunks, chunk),
        ),
    ).reshape(-1)[:c]

    best = jnp.argmax(counts).astype(jnp.int32)
    warped_best = (
        jnp.einsum("ij,cj->ci", R_cand[best], ss_kpts, precision=hp)
        + t_cand[best]
    )
    d_best = jnp.linalg.norm(warped_best - tt_kpts, axis=-1)
    inlier_mask = (d_best < thr) & valid
    return inlier_mask, best, counts[best]
