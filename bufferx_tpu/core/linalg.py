"""Batched small-matrix linear algebra designed for the TPU VPU.

TPU-native replacements for the reference's native linalg dependencies:

- ``eigh3x3`` / ``smallest_eigvec_3x3``: closed-form symmetric 3x3
  eigendecomposition (trigonometric method), replacing the ``torch_batch_svd``
  CUDA extension used for LRF z-axis estimation
  (``/root/reference/utils/common.py:709-726``).
- ``kabsch``: weighted rigid alignment. The default path is Horn's
  quaternion method — the optimal rotation is the top eigenvector of a 4x4
  symmetric matrix, recovered with a fixed-iteration shifted power method.
  This is branch-free, always returns a proper rotation (det = +1, no
  reflection fix-up needed), and batches to millions of instances — exactly
  what the vectorized RANSAC kernel wants. Replaces ``torch.svd``-based
  ``rigid_transform_3d`` (``/root/reference/models/BUFFERX.py:562-603``).
- ``rodrigues_a_to_b``: minimal rotation mapping one unit vector onto
  another (``utils/common.py:501-525`` RodsRotatFormula semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "eigh3x3",
    "smallest_eigvec_3x3",
    "kabsch",
    "rodrigues_a_to_b",
    "quaternion_to_rotation",
]

_EPS = 1e-12


def eigh3x3(A: jnp.ndarray):
    """Closed-form eigendecomposition of symmetric 3x3 matrices.

    A: [..., 3, 3] symmetric. Returns (eigvals [..., 3] ascending,
    eigvecs [..., 3, 3] with eigvecs[..., :, i] the i-th eigenvector).

    Uses the trigonometric solution for the characteristic cubic, then
    recovers eigenvectors from cross products of rows of (A - λI), picking
    the most independent row pair. Fully branch-free; degenerate (repeated
    eigenvalue / diagonal) inputs fall back to coordinate axes via masking.
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    p1 = a01**2 + a02**2 + a12**2
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, _EPS) / 6.0)

    # B = (A - q I) / p ; r = det(B) / 2
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam2 = q + 2.0 * p * jnp.cos(phi)                      # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam1 = 3.0 * q - lam0 - lam2
    eigvals = jnp.stack([lam0, lam1, lam2], axis=-1)

    # Nearly-diagonal / isotropic input: eigenvectors = coordinate axes,
    # ordered by the diagonal entries.
    diag_case = p1 < _EPS * jnp.maximum(q * q, 1.0)

    def one_vec(lam):
        # rows of (A - lam I)
        r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1)
        n02 = jnp.sum(c02 * c02, axis=-1)
        n12 = jnp.sum(c12 * c12, axis=-1)
        crosses = jnp.stack([c01, c02, c12], axis=-2)       # [..., 3, 3]
        norms = jnp.stack([n01, n02, n12], axis=-1)         # [..., 3]
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(crosses, best[..., None, None], axis=-2)[..., 0, :]
        nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.maximum(nrm, _EPS)

    v0 = one_vec(lam0)
    v2 = one_vec(lam2)
    # middle eigenvector: orthogonal complement (robust even when lam1≈lam0/2)
    v1 = jnp.cross(v2, v0)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), _EPS)
    # re-orthogonalize v0 against v2,v1 for near-degenerate inputs
    v0 = jnp.cross(v1, v2)
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0, axis=-1, keepdims=True), _EPS)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    diag = jnp.stack([a00, a11, a22], axis=-1)
    order = jnp.argsort(diag, axis=-1)                      # ascending
    eye_sorted = jnp.take_along_axis(eye, order[..., None, :], axis=-1)
    diag_vals = jnp.take_along_axis(diag, order, axis=-1)

    vecs = jnp.stack([v0, v1, v2], axis=-1)                 # columns
    dcase = diag_case[..., None]
    eigvals = jnp.where(dcase, diag_vals, eigvals)
    vecs = jnp.where(dcase[..., None], eye_sorted, vecs)
    return eigvals, vecs


def smallest_eigvec_3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of a symmetric 3x3 batch."""
    _, vecs = eigh3x3(A)
    return vecs[..., :, 0]


def quaternion_to_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def _horn_quaternion_rotation(H: jnp.ndarray, iters: int = 30) -> jnp.ndarray:
    """Optimal rotation from a 3x3 cross-covariance via Horn's method.

    H[..., i, j] = sum_k w_k * a_k[i] * b_k[j] (centered). The optimal R is
    built from the top eigenvector of the symmetric 4x4 Davenport matrix,
    recovered by a shifted power iteration (fixed ``iters`` matvecs — ideal
    for huge batches on the VPU; no data-dependent control flow).
    """
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], axis=-1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], axis=-1),
            jnp.stack([Szx - Sxz, Sxy + Syx, Syy - Sxx - Szz, Syz + Szy], axis=-1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, Szz - Sxx - Syy], axis=-1),
        ],
        axis=-2,
    )
    # Shift so the target eigenvalue is the largest in magnitude and positive:
    # |lambda| <= ||N||_F, so N + (||N||_F + eps) I is PD with the same top
    # eigenvector. Then amplify the spectral gap by repeated matrix squaring
    # (k squarings == power 2^k): converges even for near-degenerate minimal
    # 3-point sets, at the cost of only k tiny matmuls.
    norm_f = jnp.sqrt(jnp.sum(N * N, axis=(-2, -1), keepdims=True))
    shift = norm_f + 1e-6
    Ns = N + shift * jnp.broadcast_to(jnp.eye(4, dtype=N.dtype), N.shape)
    Ns = Ns / (2.0 * shift)  # spectral radius <= 1 keeps squaring stable

    n_squarings = max(3, min(12, iters // 2))
    hp = jax.lax.Precision.HIGHEST
    for _ in range(n_squarings):
        Ns = jnp.matmul(Ns, Ns, precision=hp)
        Ns = Ns / jnp.maximum(
            jnp.sqrt(jnp.sum(Ns * Ns, axis=(-2, -1), keepdims=True)), _EPS
        )

    q = jnp.broadcast_to(
        jnp.asarray([0.5, 0.5, 0.5, 0.5], dtype=N.dtype), N.shape[:-1]
    )
    for _ in range(2):
        q = (Ns @ q[..., None])[..., 0]
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return quaternion_to_rotation(q)


def kabsch(
    A: jnp.ndarray,
    B: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    iters: int = 30,
):
    """Weighted rigid alignment: find (R, t) minimizing Σ w |R a + t − b|².

    A, B: [..., N, 3]; weights: [..., N] (zeros drop correspondences — this
    is how masked/padded slots are excluded). Returns (R [..., 3, 3],
    t [..., 3]). Matches ``rigid_transform_3d`` semantics
    (``models/BUFFERX.py:562-603``) including the proper-rotation guarantee.
    """
    if weights is None:
        weights = jnp.ones(A.shape[:-1], dtype=A.dtype)
    w = weights[..., None]
    wsum = jnp.sum(w, axis=-2, keepdims=True)
    centroid_A = jnp.sum(A * w, axis=-2, keepdims=True) / (wsum + 1e-6)
    centroid_B = jnp.sum(B * w, axis=-2, keepdims=True) / (wsum + 1e-6)
    Am = A - centroid_A
    Bm = B - centroid_B
    H = jnp.einsum(
        "...ni,...nj->...ij", Am * w, Bm, precision=jax.lax.Precision.HIGHEST
    )
    R = _horn_quaternion_rotation(H, iters=iters)
    t = centroid_B[..., 0, :] - (R @ centroid_A[..., 0, :, None])[..., 0]
    return R, t


def rodrigues_a_to_b(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix R such that row-vector convention ``v @ R`` maps the
    frame with ``a`` as +z into alignment with ``b`` as +z.

    Matches the reference ``RodsRotatFormula(a, b).transpose(-1,-2)`` usage:
    in ``axis_align`` (``models/patch_embedder.py:132-134``) patch offsets
    are multiplied as ``delta_x @ R`` so that the LRF z-axis maps onto
    [0,0,1]. Handles the antiparallel degeneracy by picking any axis
    orthogonal to ``a``.
    """
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), _EPS)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), _EPS)
    c = jnp.cross(a, b)
    s2 = jnp.sum(c * c, axis=-1)
    cos = jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0)

    # default axis when a ∥ b: any unit vector orthogonal to a
    alt = jnp.cross(a, jnp.where(jnp.abs(a[..., :1]) < 0.9,
                                 jnp.asarray([1.0, 0.0, 0.0], a.dtype),
                                 jnp.asarray([0.0, 1.0, 0.0], a.dtype)))
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), _EPS)
    use_alt = s2 < _EPS
    axis = jnp.where(use_alt[..., None], alt,
                     c / jnp.maximum(jnp.sqrt(s2)[..., None], _EPS))

    theta = jnp.arccos(cos)
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], axis=-1),
            jnp.stack([kz, zero, -kx], axis=-1),
            jnp.stack([-ky, kx, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), K.shape)
    st = jnp.sin(theta)[..., None, None]
    ct = jnp.cos(theta)[..., None, None]
    R = eye + st * K + (1.0 - ct) * (K @ K)
    return jnp.swapaxes(R, -1, -2)
