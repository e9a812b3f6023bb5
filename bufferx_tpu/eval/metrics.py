"""Registration metrics — the acceptance criteria of the benchmark.

Ports the exact metric definitions (host-side numpy; these run on aggregate
results, not in the hot path):

- pairwise recall: RTE/RRE thresholds (``/root/reference/test.py:167-172``)
- 3DMatch/3DLoMatch protocol: covariance-weighted transformation error
  against gt.info, success iff err² <= 0.2²
  (``utils/tools.py:97-129``, ``test.py:280-314``)
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "mat2quat",
    "transformation_error",
    "evaluate_registration_rmse",
    "pairwise_recall",
]


def mat2quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), branch-stable."""
    m = R
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[2, 1] - m[1, 2]) / s
        x = 0.25 * s
        y = (m[0, 1] + m[1, 0]) / s
        z = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[0, 2] - m[2, 0]) / s
        x = (m[0, 1] + m[1, 0]) / s
        y = 0.25 * s
        z = (m[1, 2] + m[2, 1]) / s
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[1, 0] - m[0, 1]) / s
        x = (m[0, 2] + m[2, 0]) / s
        y = (m[1, 2] + m[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def transformation_error(trans: np.ndarray, info: np.ndarray) -> float:
    """Covariance-weighted pose error (``utils/tools.py:97-101``).

    trans: [4, 4] relative error transform (gt⁻¹ @ est); info: [6, 6]
    information matrix from gt.info.
    """
    t, r = trans[:3, 3], trans[:3, :3]
    q = mat2quat(r)
    er = np.concatenate([t, q[1:]], axis=0)
    return float(er.reshape(1, 6) @ info @ er.reshape(6, 1) / info[0, 0])


def evaluate_registration_rmse(
    num_fragment: int,
    result: np.ndarray,        # [M, 4, 4] estimated poses
    result_pairs: np.ndarray,  # [M, 2] (i, j) fragment ids
    gt_pairs: np.ndarray,      # [G, 2]
    gt: np.ndarray,            # [G, 4, 4]
    gt_info: np.ndarray,       # [G, 6, 6]
    err2: float = 0.2,
):
    """3DMatch protocol recall (``utils/tools.py:104-129``).

    Only non-consecutive pairs (j - i > 1) count. Returns
    (precision-like recall over evaluated, recall over gt, flags,
    per-pair errors).
    """
    err2 = err2**2
    gt_mask = np.zeros((num_fragment, num_fragment), dtype=np.int64)
    flags = []
    errors = np.full(result_pairs.shape[0], np.nan)

    for idx in range(gt_pairs.shape[0]):
        i, j = int(gt_pairs[idx, 0]), int(gt_pairs[idx, 1])
        if j - i > 1:
            gt_mask[i, j] = idx

    good, n_res, n_gt = 0, 0, np.sum(gt_mask > 0)
    for idx in range(result_pairs.shape[0]):
        i, j = int(result_pairs[idx, 0]), int(result_pairs[idx, 1])
        pose = result[idx]
        if gt_mask[i, j] > 0:
            n_res += 1
            gt_idx = gt_mask[i, j]
            p = transformation_error(
                np.linalg.inv(gt[gt_idx]) @ pose, gt_info[gt_idx]
            )
            errors[idx] = p
            if p <= err2:
                good += 1
                flags.append(0)
            else:
                flags.append(1)
        else:
            flags.append(2)
    return good / max(n_res, 1e-6), good / max(n_gt, 1e-6), flags, errors


def pairwise_recall(
    rte: np.ndarray, rre: np.ndarray, rte_thresh: float, rre_thresh: float
):
    """Success mask + recall under the RTE/RRE thresholds (``test.py:167-172``)."""
    success = (np.asarray(rte) < rte_thresh) & (np.asarray(rre) < rre_thresh)
    return success, float(success.mean()) if len(success) else 0.0
