"""Graduated non-convexity (GNC-TLS) robust pose solver.

The TPU-native counterpart of the reference's KISS-Matcher path
(``models/pose_estimator.py:50-82``): KISS-Matcher's final alignment stage
is a GNC solver over correspondences (Yang et al., "Graduated Non-Convexity
for Robust Spatial Perception"; same family as TEASER++). We implement
GNC with the truncated-least-squares surrogate directly over the
correspondence set: closed-form weighted Kabsch inner step, annealed
control parameter μ, fixed iteration budget — all batched linear algebra,
no branching.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bufferx_tpu.core.linalg import kabsch
from bufferx_tpu.core.se3 import integrate

__all__ = ["gnc_tls_solve", "GncResult"]


class GncResult(NamedTuple):
    pose: jnp.ndarray          # [4, 4]
    num_inliers: jnp.ndarray   # scalar int32
    weights: jnp.ndarray       # [C] final TLS weights in [0, 1]


@functools.partial(jax.jit, static_argnames=("num_iters",))
def gnc_tls_solve(
    src: jnp.ndarray,       # [C, 3]
    tgt: jnp.ndarray,       # [C, 3]
    valid: jnp.ndarray,     # [C]
    noise_bound: float,
    num_iters: int = 50,
    gnc_factor: float = 1.4,
) -> GncResult:
    eps2 = noise_bound * noise_bound
    vf = valid.astype(src.dtype)
    hp = jax.lax.Precision.HIGHEST

    def residuals(R, t):
        warped = jnp.einsum("ij,cj->ci", R, src, precision=hp) + t
        return jnp.sum((warped - tgt) ** 2, axis=-1)        # squared

    # init: plain (valid-)weighted Kabsch
    R, t = kabsch(src, tgt, vf)
    r2 = residuals(R, t)
    r2max = jnp.max(jnp.where(valid, r2, 0.0))
    mu = eps2 / jnp.maximum(2.0 * r2max - eps2, 1e-12)
    mu = jnp.maximum(mu, 1e-8)

    def body(_, state):
        R, t, mu = state
        r2 = residuals(R, t)
        # TLS weight update (closed form):
        #   w = 1                     if r2 <= lb
        #   w = sqrt(eps2 mu (mu+1) / r2) - mu   if lb < r2 < ub
        #   w = 0                     if r2 >= ub
        lb = (mu / (mu + 1.0)) * eps2
        ub = ((mu + 1.0) / mu) * eps2
        mid = jnp.sqrt(eps2 * mu * (mu + 1.0) / jnp.maximum(r2, 1e-12)) - mu
        w = jnp.where(r2 <= lb, 1.0, jnp.where(r2 >= ub, 0.0, mid))
        w = jnp.clip(w, 0.0, 1.0) * vf
        # degenerate guard: need >= 3 points with any support (Kabsch is
        # scale-invariant in the weights, so small magnitudes are fine)
        w_ok = jnp.sum(w > 1e-12) >= 3
        w = jnp.where(w_ok, w, vf)
        R, t = kabsch(src, tgt, w)
        return R, t, mu * gnc_factor

    R, t, _ = jax.lax.fori_loop(0, num_iters, body, (R, t, mu))
    r2 = residuals(R, t)
    inlier = (r2 <= eps2) & valid
    w_final = jnp.where(inlier, 1.0, 0.0)
    return GncResult(
        integrate(R, t), jnp.sum(inlier).astype(jnp.int32), w_final
    )
