"""KITTI GT convention test against the reference's exact formula."""

import os

import numpy as np

from bufferx_tpu.config import make_cfg
from bufferx_tpu.data.datasets import KITTIDataset, icp_refine


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


class TestSubsampledICPBound:
    """Bound the GT divergence introduced by refine_gt's 20k subsample.

    The reference refines KITTI GT with FULL-cloud Open3D ICP
    (``dataset/kitti.py:95-102``); ``KITTIDataset.refine_gt`` subsamples to
    20k points for speed. This fixture pair documents that the subsampled
    refinement lands within 1 cm / 0.1 deg of the full-cloud refinement —
    i.e. the divergence is far below the KITTI success thresholds
    (RTE < 2 m, RRE < 5 deg) and below the 0.20 m ICP correspondence
    scale that bounds the refinement itself.
    """

    def _lidar_like_pair(self, n=40000):
        from bufferx_tpu.data.hardsynth import eval_scene, sample_scene

        rs = np.random.RandomState(11)
        prims = eval_scene(rs, extent=20.0)
        src = sample_scene(prims, rs, n).astype(np.float64)
        tgt = sample_scene(prims, rs, n).astype(np.float64)
        # true pose: modest odometry-scale motion
        a = 0.05
        T_true = np.eye(4)
        T_true[:3, :3] = np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
             [0, 0, 1.0]]
        )
        T_true[:3, 3] = [1.5, 0.4, 0.05]
        tgt = tgt @ T_true[:3, :3].T + T_true[:3, 3]
        src += rs.randn(*src.shape) * 0.01
        tgt += rs.randn(*tgt.shape) * 0.01
        # odometry-quality initialization: ~0.08 m / ~0.6 deg off
        d = np.eye(4)
        b = 0.01
        d[:3, :3] = np.array(
            [[np.cos(b), -np.sin(b), 0], [np.sin(b), np.cos(b), 0],
             [0, 0, 1.0]]
        )
        d[:3, 3] = [0.05, -0.04, 0.03]
        return src, tgt, d @ T_true

    def test_divergence_below_1cm_01deg(self):
        src, tgt, init = self._lidar_like_pair()
        full = icp_refine(src, tgt, init, max_dist=0.20, max_iter=60)
        # the exact subsampling refine_gt applies (datasets.py refine_gt)
        rs = np.random.RandomState(0)
        s = src[rs.choice(len(src), 20000, replace=False)]
        t = tgt[rs.choice(len(tgt), 20000, replace=False)]
        sub = icp_refine(s, t, init, max_dist=0.20, max_iter=60)
        dt = np.linalg.norm(full[:3, 3] - sub[:3, 3])
        cosang = (np.trace(full[:3, :3].T @ sub[:3, :3]) - 1.0) / 2.0
        dr = np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0)))
        assert dt < 0.01, f"translation divergence {dt * 100:.2f} cm"
        assert dr < 0.1, f"rotation divergence {dr:.4f} deg"
