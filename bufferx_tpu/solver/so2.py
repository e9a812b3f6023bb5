"""Per-correspondence pose recovery from SO(2) rotation indices.

Reference: ``models/BUFFERX.py:382-389`` — each matched keypoint pair with
LRF rotations (ss_R, tt_R) and a predicted azimuth bin index yields a full
SE(3) candidate: R = tt_R @ Rz(angle) @ ss_Rᵀ, t = tt_kpt − R @ ss_kpt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bufferx_tpu.core.se3 import rotation_z

__all__ = ["so2_pose_candidates"]


def so2_pose_candidates(
    ss_kpts: jnp.ndarray,   # [C, 3]
    tt_kpts: jnp.ndarray,   # [C, 3]
    ss_R: jnp.ndarray,      # [C, 3, 3] source LRF rotations
    tt_R: jnp.ndarray,      # [C, 3, 3] target LRF rotations
    ind: jnp.ndarray,       # [C] continuous azimuth bin index
    azi_n: int,
):
    """Returns (R [C, 3, 3], t [C, 3]) pose candidates."""
    angle = ind * (2.0 * jnp.pi / azi_n) + 1e-6
    azi_R = rotation_z(angle)                               # [C, 3, 3]
    hp = jax.lax.Precision.HIGHEST
    R = jnp.einsum("cij,cjk,clk->cil", tt_R, azi_R, ss_R, precision=hp)
    t = tt_kpts - jnp.einsum("cij,cj->ci", R, ss_kpts, precision=hp)
    return R, t
