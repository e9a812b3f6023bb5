"""KITTI GT convention test against the reference's exact formula."""

import os

import numpy as np

from bufferx_tpu.config import make_cfg
from bufferx_tpu.data.datasets import KITTIDataset


def reference_gt(V, P0, P1):
    """The reference's expression verbatim (``dataset/kitti.py:86-91``):
    it stores velo2cam TRANSPOSED and computes
    M = (Vᵀ @ P0ᵀ @ inv(P1ᵀ) @ inv(Vᵀ))ᵀ applied to xyz0."""
    Vt = V.T
    return (Vt @ P0.T @ np.linalg.inv(P1.T) @ np.linalg.inv(Vt)).T


class TestKittiConvention:
    def _make_dataset(self, tmp_path, poses_cam):
        root = str(tmp_path)
        os.makedirs(os.path.join(root, "poses"), exist_ok=True)
        seq_dir = os.path.join(root, "sequences", "08", "velodyne")
        os.makedirs(seq_dir, exist_ok=True)
        rows = [p[:3].reshape(-1) for p in poses_cam]
        np.savetxt(os.path.join(root, "poses", "08.txt"), np.stack(rows))
        rs = np.random.RandomState(0)
        for t in range(len(poses_cam)):
            pts = np.concatenate(
                [rs.randn(500, 3), np.zeros((500, 1))], axis=1
            ).astype(np.float32)
            pts.tofile(os.path.join(seq_dir, f"{t:06d}.bin"))
        cfg = make_cfg("KITTI", root).override(data=dict(pdist=1.0))
        return KITTIDataset(cfg)

    def test_relt_matches_reference_formula(self, tmp_path, rng):
        # camera odometry: three poses moving 2 m each step with yaw
        poses = []
        cur = np.eye(4)
        for i in range(3):
            poses.append(cur.copy())
            d = np.eye(4)
            a = 0.1 * (i + 1)
            d[:3, :3] = np.array(
                [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
            )
            d[:3, 3] = [2.0, 0.3, 0.1]
            cur = cur @ d
        ds = self._make_dataset(tmp_path, poses)
        assert len(ds.pairs) >= 1
        seq, i, j, Ti, Tj = ds.pairs[0]
        ours = np.linalg.inv(Tj) @ Ti
        V = ds.velo2cam()
        expect = reference_gt(V, poses[i], poses[j])
        np.testing.assert_allclose(ours, expect, atol=1e-9)
