"""SE(3) transforms and registration error metrics, pure JAX.

Functional parity with the reference ``utils/SE3.py`` (transform :58-73,
decompose/integrate/concatenate :76-131, RTE :134-147, RRE :150-165), but
batched-first: every function broadcasts over arbitrary leading axes so the
same code serves a single pair under ``jit`` and a pair batch under ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Geometry is precision-critical: force true-f32 MXU matmuls (TPU matmul
# precision otherwise defaults to bf16 inputs, ~8 mantissa bits — enough to
# corrupt RTE at the centimeter level).
_HIGHEST = jax.lax.Precision.HIGHEST

__all__ = [
    "transform",
    "decompose",
    "integrate",
    "concatenate",
    "inverse",
    "compute_rte",
    "compute_rre",
    "rotation_z",
    "axis_angle_to_rotation",
    "random_rotation",
]


def transform(pts: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Apply an SE(3) transform: ``R @ p + t``.

    pts: [..., N, 3]; trans: [..., 4, 4] (leading axes broadcast).
    """
    R = trans[..., :3, :3]
    t = trans[..., :3, 3]
    return (
        jnp.matmul(pts, jnp.swapaxes(R, -1, -2), precision=_HIGHEST)
        + t[..., None, :]
    )


def decompose(trans: jnp.ndarray):
    """[..., 4, 4] -> (R [..., 3, 3], t [..., 3])."""
    return trans[..., :3, :3], trans[..., :3, 3]


def integrate(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R [..., 3, 3], t [..., 3]) -> [..., 4, 4]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def concatenate(trans1: jnp.ndarray, trans2: jnp.ndarray) -> jnp.ndarray:
    """Compose two SE(3) transforms: returns ``trans1 @ trans2``."""
    return trans1 @ trans2


def inverse(trans: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse (no linear solve)."""
    R, t = decompose(trans)
    Rt = jnp.swapaxes(R, -1, -2)
    return integrate(Rt, -(Rt @ t[..., None])[..., 0])


def compute_rte(trans_est: jnp.ndarray, trans_gt: jnp.ndarray) -> jnp.ndarray:
    """Relative translation error: L2 of translation difference (meters)."""
    return jnp.linalg.norm(trans_est[..., :3, 3] - trans_gt[..., :3, 3], axis=-1)


def compute_rre(trans_est: jnp.ndarray, trans_gt: jnp.ndarray) -> jnp.ndarray:
    """Relative rotation error in degrees: arccos((tr(ReᵀRg) - 1) / 2)."""
    R_est = trans_est[..., :3, :3]
    R_gt = trans_gt[..., :3, :3]
    tr = jnp.einsum("...ij,...ij->...", R_est, R_gt)
    cos_theta = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-16, 1.0 - 1e-16)
    return jnp.degrees(jnp.arccos(cos_theta))


def rotation_z(angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation about +z by ``angle`` (radians); broadcasts over leading axes."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def axis_angle_to_rotation(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle vector [..., 3] -> rotation matrix [..., 3, 3].

    Replaces the reference's kornia ``axis_angle_to_rotation_matrix``
    (``models/BUFFERX.py:386``). Formulated on the *unnormalized* axis with
    Taylor-guarded sinc coefficients — smooth and autodiff-safe at the zero
    rotation (the pose-graph layer differentiates through this at θ = 0,
    where the normalized form produces NaN jacobians):

        R = I + A(θ) K + B(θ) K²,  K = [w]ₓ,
        A = sin(θ)/θ, B = (1 − cos θ)/θ².
    """
    w = axis_angle
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]        # θ²
    small = t2 < 1e-8
    # max() gives the exact branch a θ² with zero gradient below the cutoff,
    # so no NaN leaks through the unselected branch of the where.
    t2c = jnp.maximum(t2, 1e-8)
    t = jnp.sqrt(t2c)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2c)

    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    K = jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A * K + B * (K @ K)


def random_rotation(key, num_axis: int = 3, magnitude: float = 1.0) -> jnp.ndarray:
    """Random augmentation rotation (reference ``utils/SE3.py:6-43``).

    num_axis=1 rotates about z only (outdoor aug); num_axis=3 composes
    Rx @ Ry @ Rz (indoor aug); num_axis=0 is the identity.
    """
    import jax

    if num_axis == 0:
        return jnp.eye(3)
    angles = jax.random.uniform(key, (3,)) * 2.0 * jnp.pi * magnitude
    cz, sz = jnp.cos(angles[2]), jnp.sin(angles[2])
    Rz = jnp.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    if num_axis == 1:
        return Rz
    cx, sx = jnp.cos(angles[0]), jnp.sin(angles[0])
    cy, sy = jnp.cos(angles[1]), jnp.sin(angles[1])
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    Ry = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    return Rx @ Ry @ Rz
