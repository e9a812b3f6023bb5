"""IRLS pose refinement (PointDSC-style post refinement).

Port of ``BufferX.post_refinement`` (``models/BUFFERX.py:522-556``): fixed
rounds of inlier re-selection under ``dist_th`` with Cauchy-like weights
``1 / (1 + (d/τ)²)`` and weighted-Kabsch re-estimation. The reference breaks
when the inlier count stalls; on TPU we run the fixed budget (the update is
a contraction near the fixed point, so extra rounds are harmless) inside one
``lax.fori_loop``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bufferx_tpu.core.linalg import kabsch
from bufferx_tpu.core.se3 import decompose, integrate, transform

__all__ = ["post_refinement"]


@functools.partial(jax.jit, static_argnames=("num_iters",))
def post_refinement(
    pose: jnp.ndarray,      # [4, 4] initial estimate
    src: jnp.ndarray,       # [C, 3]
    tgt: jnp.ndarray,       # [C, 3]
    valid: jnp.ndarray,     # [C]
    dist_th: float,
    num_iters: int = 20,
) -> jnp.ndarray:
    def body(_, T):
        warped = transform(src, T)
        d = jnp.linalg.norm(warped - tgt, axis=-1)
        inlier = (d < dist_th) & valid
        w = inlier.astype(src.dtype) / (1.0 + (d / dist_th) ** 2)
        R, t = kabsch(src, tgt, w)
        # keep the previous pose if the inlier set collapses
        ok = jnp.sum(inlier) >= 3
        R0, t0 = decompose(T)
        return integrate(
            jnp.where(ok, R, R0), jnp.where(ok, t, t0)
        )

    return jax.lax.fori_loop(0, num_iters, body, pose)
